"""Skew-mitigation primitives.

AQE's skew-join handling (on in session.py) covers sort-merge joins;
these helpers cover the two shapes AQE can't fix by itself:

* **salted aggregation** — a hot group key funnels its whole group
  through one reducer. Two-phase: aggregate on (key, salt) first
  (spreads the hot key over N reducers), then merge the partials.
  Works for any algebraic aggregate (sum/count/min/max).
* **salted broadcast join** — replicate the small side N× with salt
  ids so a hot key's rows on the big side spread over N tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, buckets) — deterministic per run is
    not required: salting only affects placement, not results."""
    return df.withColumn(
        col_name, (F.rand(seed=42) * buckets).cast("int")
    )


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-resistant sum/count per key: pre-aggregate on
    (keys, salt), then merge partials. Result is identical to a
    plain groupBy (sum/count are algebraic); the hot key's work is
    spread across ``buckets`` reducers in phase one.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value_col).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Equi-join where the big side has hot keys: salt the big side,
    explode the small side ×buckets, join on (key, salt). With a
    broadcast small side this is belt-and-suspenders (broadcast
    already avoids the shuffle); the same construction fixes hot keys
    in shuffle joins where neither side broadcasts."""
    b = with_salt(big, buckets)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(F.broadcast(s), [key, "_salt"]).drop("_salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    target_share: float = 0.02,
) -> DataFrame:
    """Shuffle-key skew diagnostic: per-key row share and the salt
    factor that would flatten it — the measurement you run BEFORE
    reaching for :func:`salted_sum_count` / AQE skew hints. For the
    ``top_n`` heaviest keys (by count desc, key asc): rows, share of
    the table, and ``suggested_salt`` = ceil(share / target_share)
    clamped to ≥1 — the replication needed so no reducer holds more
    than ``target_share`` of the rows.

    Scale shape: one partial-aggregated count per key (the same
    shuffle any groupBy pays — map-side combine ships one row per key
    per task), a broadcast 1-row total, and a global top-n that plans
    as TakeOrderedAndProject. NULL keys count as a real group (NULL
    is the classic skew culprit) and print as the string '<null>'.
    """
    from vectorsearchutil_spark.functions.vector import round_half_up

    counts = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("<null>")).alias(
            "key"
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            round_half_up(
                F.col("n_rows").cast("double") / F.col("_total"), 6
            ).alias("share"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(
                    F.col("n_rows").cast("double")
                    / F.col("_total")
                    / F.lit(float(target_share))
                ),
            ).cast("int").alias("suggested_salt"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(int(top_n))
    )
