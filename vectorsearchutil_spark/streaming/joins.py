"""Stream-stream joins with watermark-bounded state.

The streaming form of the as-of/interval pattern: join two live
streams on key + time bound. Both sides carry watermarks and the join
condition bounds event-time distance, so Spark can expire buffered
rows — state stays proportional to (rate × interval), not to history.
That bounded-state property is what makes the join viable on an
unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    purchases: DataFrame,
    views: DataFrame,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases joined to same-user views within the preceding
    ``interval``: view.ts ∈ [purchase.ts − interval, purchase.ts].

    Output: one row per (purchase, qualifying view).
    """
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    return p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {interval}")),
        "inner",
    ).select("purchase_id", "view_id", "user_id", "p_ts", "v_ts")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static dimension join: enrich each event with the
    static dimension row for its user.

    The static side is re-resolved and broadcast per micro-batch —
    no streaming state, no watermark required (stream-static inner
    joins are stateless by construction). On a 100 TB/day stream the
    dimension stays a map-side hash table; only the stream moves.
    """
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], "inner"
    )
