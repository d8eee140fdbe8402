"""Deterministic hash-based sampling.

``df.sample()`` is seed-dependent ON TOP of partitioning — the same
seed yields different rows after a repartition, which breaks
reproducible training-data splits. Hash sampling decides per ROW from
a stable key: ``u(key) = int(md5(seed:key)[:8], 16) / 2^32`` is a
uniform [0,1) draw that any engine reproduces bit-for-bit (the same
derivation the LSH planes and the train/val hash split use), so a
sample is a pure filter — pushdown-friendly, shuffle-free,
partitioning-independent, and re-runnable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(key: Column, seed: str) -> Column:
    """Deterministic uniform [0,1) draw from (seed, key).

    DuckDB equivalent:
    ``('0x' || substr(md5(seed || ':' || key), 1, 8))::BIGINT / 4294967296.0``
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), key)), 1, 8), 16, 10
    ).cast("double")
    return h / F.lit(4294967296.0)


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    seed: str = "sample",
) -> DataFrame:
    """Bernoulli sample keeping rows with u(key) < rate."""
    return df.filter(hash_uniform(F.col(key_col).cast("string"), seed) < rate)


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    seed: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downsample dominant
    languages, keep all of a rare one). ``rates`` maps stratum value →
    keep rate; strata not listed get ``default_rate``.

    The rate lookup is a literal map expression, so the whole sample
    stays one narrow filter — no join, no shuffle.
    """
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    rate = F.coalesce(
        rate_map[F.col(stratum_col)], F.lit(float(default_rate))
    )
    return df.filter(
        hash_uniform(F.col(key_col).cast("string"), seed) < rate
    )
