"""Business/stream analytics operators staged for round 6.

Mirrors the reference's analytics query surface style (ad-hoc SQL
over the store's tables, ``vsu/VectorSearchBase.py`` exposes the raw
connection for exactly this) re-expressed as scale-safe DataFrame
plans. Everything here follows the repo's two conventions:

- **Two-level windows**: no window function ever runs over raw rows
  on an unbounded partition. Rankings (RFM quintiles) derive from
  DISTINCT-VALUE histograms; per-entity windows (rolling z-score,
  inter-arrival lag) are bounded by the rows-per-entity, which is
  data-model-bounded, not corpus-bounded.
- **Cross-engine-exact arithmetic**: money and metric values go
  through fixed-point longs (cents) so sums are order-free; the few
  genuinely-real-valued outputs round via the floor form
  (``round_half_up``) both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.vector import round_half_up

__all__ = [
    "exact_ntile",
    "rolling_zscore",
    "yoy_growth",
    "rfm_scores",
    "interarrival_quantiles",
]


def _cents(col: Column) -> Column:
    """value → fixed-point cents long; NULL for null/non-finite."""
    return (
        F.when(
            col.isNotNull()
            & ~F.isnan(col)
            & (col != F.lit(float("inf")))
            & (col != F.lit(float("-inf"))),
            F.floor(col * F.lit(100.0) + F.lit(0.5)),
        )
        .cast("long")
    )


def exact_ntile(
    df: DataFrame,
    value_col: str,
    k: int,
    *,
    ascending: bool = True,
    tie_col: str,
    out_col: str = "bucket",
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY value [ASC|DESC], tie ASC)``
    WITHOUT a global sort — the ``customers_acctbal_deciles`` plan
    (queries.py) generalized into a reusable helper.

    rank = (rows strictly before this value, cumulated over the
    DISTINCT-VALUE histogram — bounded by the value domain, never the
    row count) + row_number within the value (parallel across
    values, partitioned by value); the bucket then derives from rank
    and n arithmetically per the NTILE definition (first ``n mod k``
    buckets take one extra row). The only serial window runs over the
    aggregated histogram.

    Returns the input columns plus ``out_col`` (int bucket 1..k).
    """
    vals = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_c"))
    # NULLS LAST pinned explicitly: Spark's bare asc() defaults nulls
    # FIRST while standard SQL engines default them LAST — the oracle
    # spells ASC/DESC NULLS LAST to match
    order = (
        F.col(value_col).asc_nulls_last()
        if ascending
        else F.col(value_col).desc_nulls_last()
    )
    vw = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    vcum = vals.select(
        value_col,
        F.coalesce(F.sum("_c").over(vw), F.lit(0)).alias("_before"),
    )
    inner = Window.partitionBy(value_col).orderBy(F.col(tie_col).asc())
    n_df = df.agg(F.count(F.lit(1)).alias("_n"))
    rank = F.col("_before") + F.row_number().over(inner)
    q = F.expr(f"_n div {k}")
    r = F.expr(f"_n % {k}")
    thr = r * (q + 1)
    bucket = F.when(rank <= thr, (rank - 1) / (q + 1)).otherwise(
        # lazy branch: q = 0 implies every rank <= thr (= n), so the
        # division by q never evaluates for n < k
        r + (rank - thr - 1) / q
    )
    return (
        df.join(F.broadcast(vcum), value_col)
        .crossJoin(F.broadcast(n_df))
        .withColumn(out_col, (F.floor(bucket) + 1).cast("int"))
        .drop("_before", "_n")
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str = "value",
    part_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: int = 5,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Per-entity rolling anomaly flags: each event's z-score against
    the mean/std of the PRECEDING ``window`` events of the same
    entity (the event itself excluded, so an outlier cannot mask
    itself). The classic streaming-monitoring primitive as a batch
    twin.

    Scale: the window partitions by entity and its frame is ``window``
    ROWS — state per task is O(window), rows-per-entity bounds the
    sort, entities parallelize. No global window anywhere.

    Exactness: values fix-point to cents longs; the frame's Σv and
    Σv² are integer sums (order-free), and mean/variance/z derive
    from those exact integers with one double division + sqrt —
    correctly-rounded IEEE ops both engines reproduce bit-identically
    (the oracle spells the same formula). Non-finite/null values
    pass through with NULL stats and never enter a neighbour's frame
    sums (SUM/COUNT skip NULL identically in both engines).

    z is NULL for short history (< window prior rows) or zero
    variance; ``is_anomaly`` is false-not-null there so downstream
    filters behave.
    """
    qv = _cents(F.col(value_col))
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window, -1)
    )
    d = df.select(
        id_col,
        part_col,
        ts_col,
        qv.alias("_qv"),
        F.sum(qv).over(w).alias("_s"),
        F.sum(qv * qv).over(w).alias("_s2"),
        F.count(qv).over(w).alias("_cnt"),
    )
    cnt = F.col("_cnt").cast("double")
    mean = F.col("_s") / cnt
    # var = (Σv² − (Σv)²/n) / n over exact integer sums
    var = (F.col("_s2") - F.col("_s") * F.col("_s") / cnt) / cnt
    z_raw = (F.col("_qv") - mean) / F.sqrt(var)
    z = F.when(
        (F.col("_cnt") >= window) & (var > 0) & F.col("_qv").isNotNull(),
        round_half_up(z_raw, 6),
    )
    return d.select(
        id_col,
        part_col,
        (F.col("_qv") / F.lit(100.0)).alias("value_seen"),
        F.col("_cnt").cast("int").alias("n_window"),
        z.alias("zscore"),
        F.coalesce(
            F.abs(z) >= F.lit(float(z_thresh)), F.lit(False)
        ).alias("is_anomaly"),
    )


def yoy_growth(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Monthly revenue with year-over-year growth. Aggregates to the
    month grid FIRST (exact-cents integer sums, map-side combinable),
    then the YoY pairing is a self-JOIN on month−12 — robust to
    missing months, no window at all, and the joined side is the
    ≤ #months aggregate, broadcastable forever.

    ``yoy_growth`` is NULL for months with no prior-year row (or a
    zero prior-year revenue), rounded via the cross-engine floor form
    otherwise.
    """
    cents = _cents(F.col(amount_col))
    # integer month index (y*12 + m−1): the YoY pairing and the
    # output label both derive from plain ints — no date-type
    # arithmetic for a cross-engine oracle to disagree on
    midx = (
        F.year(F.col(date_col)) * 12 + F.month(F.col(date_col)) - 1
    ).cast("int")
    monthly = orders.groupBy(midx.alias("_mi")).agg(
        F.sum(cents).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    prev = monthly.select(
        (F.col("_mi") + 12).alias("_mi"),
        F.col("revenue_cents").alias("prev_year_cents"),
    )
    growth = (
        (F.col("revenue_cents") - F.col("prev_year_cents")).cast("double")
        / F.when(F.col("prev_year_cents") != 0, F.col("prev_year_cents"))
        .cast("double")
    )
    month_str = F.concat_ws(
        "-",
        (F.col("_mi") / 12).cast("int").cast("string"),
        F.lpad((F.col("_mi") % 12 + 1).cast("string"), 2, "0"),
    )
    return (
        monthly.join(F.broadcast(prev), "_mi", "left")
        .select(
            month_str.alias("month"),
            "n_orders",
            "revenue_cents",
            "prev_year_cents",
            round_half_up(growth, 6).alias("yoy_growth"),
        )
    )


def rfm_scores(orders: DataFrame) -> DataFrame:
    """RFM segmentation: per customer, Recency (days since their last
    order, anchored at the corpus max order date so the result is
    deterministic), Frequency (order count), Monetary (exact cents),
    each bucketed into exact quintiles — R ascending (1 = most
    recent), F and M descending (1 = heaviest) — plus the
    concatenated ``rfm_segment``.

    The three quintiles reuse :func:`exact_ntile`: every ranking runs
    over the per-metric DISTINCT-VALUE histogram, so no global
    customer sort exists in the plan. Ties break by c_custkey ASC,
    matching the oracle's NTILE ORDER BY.
    """
    anchor = orders.agg(
        F.max(F.col("o_orderdate")).alias("_anchor")
    )
    # datediff(anchor, newest order) = MIN over the per-order diffs,
    # so recency aggregates in the same pass as frequency/monetary
    per_cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey"))
        .agg(
            F.min(
                F.datediff(F.col("_anchor"), F.col("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(_cents(F.col("o_totalprice"))).alias("monetary_cents"),
        )
    )
    r = exact_ntile(
        per_cust, "recency_days", 5,
        ascending=True, tie_col="o_custkey", out_col="r_quintile",
    ).select("o_custkey", "r_quintile")
    f_ = exact_ntile(
        per_cust, "frequency", 5,
        ascending=False, tie_col="o_custkey", out_col="f_quintile",
    ).select("o_custkey", "f_quintile")
    m = exact_ntile(
        per_cust, "monetary_cents", 5,
        ascending=False, tie_col="o_custkey", out_col="m_quintile",
    ).select("o_custkey", "m_quintile")
    return (
        per_cust.join(r, "o_custkey")
        .join(f_, "o_custkey")
        .join(m, "o_custkey")
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r_quintile",
            "f_quintile",
            "m_quintile",
            F.concat_ws(
                "", "r_quintile", "f_quintile", "m_quintile"
            ).alias("rfm_segment"),
        )
    )


def interarrival_quantiles(
    events: DataFrame,
    group_col: str = "event_type",
    part_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """EXACT inter-arrival-gap quantiles per event type: the gap is
    the whole-second delta between consecutive events of the same
    (user, type) — the per-entity cadence — and each requested
    quantile is the exact order statistic (smallest gap g with
    count(≤g) ≥ ceil(q·n)), computed by histogram refinement
    (:func:`weighted_median_exact` with unit weights), never a
    per-type sort of raw gaps.

    The lag window partitions by (user, type) — bounded by one
    entity's events; gaps are integer seconds so every comparison is
    exact. Entities with a single event contribute no gap.
    """
    from vectorsearchutil_spark.operators.sketches import (
        weighted_median_exact,
    )

    lw = Window.partitionBy(part_col, group_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    sec = F.unix_timestamp(F.col(ts_col))
    gaps = (
        events.select(
            group_col,
            part_col,
            (sec - F.lag(sec).over(lw)).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
        .withColumn("_w", F.lit(1).cast("long"))
    )
    counts = gaps.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_gaps")
    )
    out = counts
    for q in quantiles:
        col = f"p{int(round(q * 100)):02d}_gap_s"
        one = weighted_median_exact(
            gaps, group_col, "gap_s", "_w", out_col=col, quantile=q
        )
        out = out.join(one, group_col)
    return out
