"""As-of join — match each left row to the most recent right row at
or before its timestamp, per key.

Spark has no native as-of join (pandas has merge_asof; DuckDB has
ASOF JOIN). The scalable formulation is the union-and-carry plan:

    union(left, right) tagged by side
      → single shuffle on (key) with ordering (ts, side, id)
      → last(right payload, ignoreNulls) carried forward per key
      → keep left rows

One shuffle total, state is one carried struct per key — this is the
plan that survives a 100 TB event table (contrast: the naive
left-join-then-rank fans out to |left| × |right-per-key| rows).

Ties: a right row at exactly left.ts matches (inclusive); among right
rows sharing a timestamp the highest ``right_id`` wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.ts <= left.ts`` on the same key (NULLs when none).

    Output: all left columns + each right payload column renamed
    ``<col><suffix>``.
    """
    payload = right_payload or [c for c in right.columns if c not in (key, right_ts)]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
        ).alias("_rpay"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at equal ts (inclusive as-of);
    # among equal-ts right rows the LAST in struct order wins — struct
    # ordering ranks by (_rts, payload...), so carrying last() is
    # deterministic given unique payload ids.
    win = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(win)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in payload],
        F.col("_match")["_rts"].alias(f"{right_ts}{suffix}"),
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    ``right.ts >= left.ts`` on the same key (NULLs when none).

    Same union-and-carry plan as ``asof_join``, scanned in DESCENDING
    timestamp order — still one shuffle on the key, one carried
    struct of state. Inclusive at equal timestamps; among right rows
    sharing a timestamp the LOWEST payload (id) wins (mirror of the
    backward join's highest-wins, both deterministic).
    """
    payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
        ).alias("_rpay"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # descending ts; right before left at equal ts (inclusive); _rpay
    # desc so the carried last() among equal-ts right rows is the
    # LOWEST (rts, payload) struct
    win = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").desc(), F.col("_side").asc(), F.col("_rpay").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(win)
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in payload],
        F.col("_match")["_rts"].alias(f"{right_ts}{suffix}"),
    )
