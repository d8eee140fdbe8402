"""Interval analytics — sessions as time intervals, and a
DISTRIBUTED sweep-line for concurrency ("how many sessions are open
at once"), the load-profile / capacity question every event pipeline
eventually asks.

The naive sweep-line is a running sum over ALL boundaries in one
global time order — a single-partition window that dies at scale.
The distributed form here is the textbook two-level prefix sum:

  1. boundaries (+1 at start, −1 at end) bucket by DAY;
  2. a day-level aggregate (tiny: one row per day) computes each
     day's carry-in as the running total of all PRIOR days' deltas —
     the only single-partition window, bounded by the date span, not
     the data;
  3. within each day, the running sum is a day-partitioned window —
     parallel in the number of days.

Determinism across engines: the running sum uses the ANSI default
RANGE frame, so all boundary rows sharing (ts, delta) are peers and
receive the same cumulative value — no dependence on intra-tie order
— and all arithmetic is integer. At equal timestamps starts sort
before ends (delta DESC): touching sessions count as concurrent and
the running value never dips below the true open count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessions_from_events(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Gap-based sessionization to INTERVALS: (user, session_id,
    start_ts, end_ts). Same gap semantics as the sessionize query
    (new session when the inactivity gap strictly exceeds ``gap_s``).
    One shuffle on the user key, reused by the lag window, the
    running sum, and the interval aggregate."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    gap = F.col(ts_col).cast("double") - F.lag(
        F.col(ts_col).cast("double")
    ).over(w)
    marked = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn("_sid", F.sum("_new").over(cum))
    return sess.groupBy(
        F.col(user_col).alias("user_id"), F.col("_sid").alias("session_id")
    ).agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )


def concurrency_by_day(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Per-day peak concurrency over an interval set via the
    two-level distributed sweep-line (module docstring). Output:
    (day, peak_concurrency, n_starts)."""
    starts = intervals.select(
        F.col(start_col).alias("_ts"), F.lit(1).alias("_delta")
    )
    ends = intervals.select(
        F.col(end_col).alias("_ts"), F.lit(-1).alias("_delta")
    )
    b = starts.unionByName(ends).withColumn("_day", F.to_date("_ts"))

    # level 1: per-day totals (tiny) -> carry-in per day
    day_totals = b.groupBy("_day").agg(F.sum("_delta").alias("_day_sum"))
    carry_w = (
        Window.partitionBy()
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = day_totals.select(
        "_day",
        F.coalesce(F.sum("_day_sum").over(carry_w), F.lit(0)).alias("_carry"),
    )

    # level 2: within-day running sum (ANSI default RANGE frame:
    # (ts, delta) peers share one cumulative value -> deterministic)
    run_w = Window.partitionBy("_day").orderBy(
        F.col("_ts").asc(), F.col("_delta").desc()
    )
    run = b.join(F.broadcast(carries), "_day").withColumn(
        "_open", F.col("_carry") + F.sum("_delta").over(run_w)
    )
    return run.groupBy(F.col("_day").alias("day")).agg(
        F.max("_open").cast("int").alias("peak_concurrency"),
        F.sum(F.when(F.col("_delta") == 1, 1).otherwise(0))
        .cast("int")
        .alias("n_starts"),
    )
