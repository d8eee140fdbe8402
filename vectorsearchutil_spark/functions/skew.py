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
