"""Z-order (Morton) interleaved sort keys — multi-column data layout
for scan pruning.

A table sorted by (a, b) clusters perfectly for predicates on ``a``
but scatters ``b``; interleaving the two columns' bits gives a single
sort key under which rows close in EITHER dimension land close on
disk, so min/max statistics (parquet row groups, the manifest log's
per-transaction stats, Delta/Iceberg file stats) prune scans for
range predicates on a, on b, or both — the standard lakehouse
layout technique (Delta OPTIMIZE ZORDER BY).

Everything is closed-form bit arithmetic (the classic magic-mask
spread), expressed as engine-portable SQL: Spark computes the keys in
whole-stage codegen and any oracle re-derives them bit-for-bit.
Inputs must already be rank/bucket-normalized to 16 bits — at 100 TB
that is a percentile bucketing or a domain-known scaling; the key
derivation itself stays a narrow projection, and the only shuffle is
the range partitioning that materializes the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread16_sql(expr: str) -> str:
    """Bits of a 16-bit value spread to even positions (Morton
    spread) via the magic-mask chain — BIGINT throughout so neither
    Spark nor 32-bit-int engines overflow the shifts."""
    out = "(({x4} | ({x4} << 1)) & 1431655765)"
    out = out.replace("{x4}", "(({x3} | ({x3} << 2)) & 858993459)")
    out = out.replace("{x3}", "(({x2} | ({x2} << 4)) & 252645135)")
    out = out.replace("{x2}", "(({x1} | ({x1} << 8)) & 16711935)")
    return out.replace("{x1}", f"CAST(({expr} & 65535) AS BIGINT)")


def zorder_key_sql(a_expr: str, b_expr: str) -> str:
    """32-bit Morton key interleaving two 16-bit inputs (a on even
    bits, b on odd)."""
    return f"({spread16_sql(a_expr)} | ({spread16_sql(b_expr)} << 1))"


def zorder_by(
    df: DataFrame,
    a_expr: str,
    b_expr: str,
    partitions: int = 8,
    key_col: str = "zkey",
) -> DataFrame:
    """Materialize a z-ordered layout: compute the Morton key (narrow
    projection), range-partition on it, and sort within partitions.
    Each output partition then covers a compact z-range — the property
    that makes per-file min/max stats selective for range predicates
    on EITHER input column. Write the result with per-transaction
    stats on ``key_col`` (sources/manifest.py) or rely on parquet
    row-group stats."""
    from pyspark.sql import functions as F

    keyed = df.selectExpr("*", f"{zorder_key_sql(a_expr, b_expr)} AS {key_col}")
    return keyed.repartitionByRange(partitions, F.col(key_col)).sortWithinPartitions(
        key_col
    )
