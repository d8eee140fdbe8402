"""25x-scale probes for the round-7 staging wave (queries_pending.py
entries 34-37). Same discipline as probe_round6_pending.py: synthesize
inputs at ~25x the sf0.1 bench scale, time the SHIPPED operator plan,
force evaluation through computed columns (a bare count() lets
Catalyst eliminate the expressions under test — PERF.md lesson).

Usage: python tools/probe_round7_pending.py [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

PROBES = {}


def probe_hapax(spark):
    """500k docs x ~60 tokens: one (source, token) aggregate, then a
    20-source rollup — shuffle carries (source, token) pairs only."""
    docs = spark.range(500_000).selectExpr(
        "id AS doc_id",
        "concat('s', pmod(id, 20)) AS source",
        "concat_ws(' ', transform(sequence(1, 60),"
        " j -> concat('tok', pmod(xxhash64(id, j), 200000)))) AS text",
    ).cache()
    docs.count()
    from vectorsearchutil_spark.functions.text import tokens_sql
    from vectorsearchutil_spark.functions.vector import round_half_up

    t0 = time.time()
    tc = (
        docs.selectExpr("source", f"explode({tokens_sql('text')}) AS token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        tc.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum((F.col("c") == 1).cast("int")).alias("hapax"),
        )
        .select(
            "source",
            round_half_up(
                F.col("hapax").cast("double") / F.col("vocab"), 6
            ).alias("hf"),
            "n_tokens",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("hf").alias("s"))
        .collect()[0]
    )
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 500k docs / 30M tokens -> {out['n']} sources"


def probe_daily_peaks(spark):
    """20M events / 3 years / 5 types: raw rows collapse to the
    ~5.5k-cell grid first; everything after is grid-sized."""
    from vectorsearchutil_spark.operators.analytics import daily_peaks

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "timestamp_seconds(1600000000 + "
        "pmod(xxhash64(id, 11), 94608000)) AS ts",
        # weekly sawtooth + a planted spike day per type
        "CASE WHEN pmod(CAST(FLOOR((1600000000 +"
        " pmod(xxhash64(id, 11), 94608000)) / 86400.0) AS BIGINT), 365)"
        " = 100 THEN 500.0 ELSE 10.0 +"
        " pmod(xxhash64(id, 13), 7) END AS value",
    ).cache()
    e.count()
    t0 = time.time()
    out = daily_peaks(e).agg(
        F.count(F.lit(1)).alias("n"), F.sum("day_value").alias("s")
    ).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events / ~1095 days x 5 types -> {out['n']} peaks"


def probe_theilsen(spark):
    """20M orders / 3 years: the pair stage is days^2 ~ 600k pairs —
    calendar-bounded, invariant to row count; the median runs over
    the distinct-slope histogram."""
    from vectorsearchutil_spark.operators.analytics import (
        theil_sen_daily_trend,
    )

    o = spark.range(20_000_000).selectExpr(
        "id AS o_orderkey",
        "to_date(timestamp_seconds(1600000000 + "
        "pmod(xxhash64(id, 11), 94608000))) AS o_orderdate",
        "100.0 + pmod(xxhash64(id, 13), 1000) / 10.0 AS o_totalprice",
    ).cache()
    o.count()
    t0 = time.time()
    row = theil_sen_daily_trend(o).collect()[0]
    dt = time.time() - t0
    o.unpersist()
    return (
        f"{dt:.1f}s @ 20M orders / ~1095 days"
        f" ({row['n_pairs']} pairs, slope {row['slope_per_day']})"
    )


def probe_bootstrap(spark):
    """20M events / 3 years, B=200: the resample grid is
    200 x n_days ~ 220k integer rows joined to the broadcast day
    grid — row count only affects the first aggregate."""
    from vectorsearchutil_spark.operators.analytics import (
        block_bootstrap_mean_ci,
    )

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "timestamp_seconds(1600000000 + "
        "pmod(xxhash64(id, 11), 94608000)) AS ts",
        "10.0 + pmod(xxhash64(id, 13), 7) AS value",
    ).cache()
    e.count()
    t0 = time.time()
    row = block_bootstrap_mean_ci(e).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return (
        f"{dt:.1f}s @ 20M events / {row['n_days']} days"
        f" (ci [{row['ci_lo']}, {row['ci_hi']}])"
    )


PROBES["hapax"] = probe_hapax
PROBES["daily_peaks"] = probe_daily_peaks
PROBES["theilsen"] = probe_theilsen
PROBES["bootstrap"] = probe_bootstrap




def probe_curriculum_sharded(spark):
    """2M docs / 50 sources: the bracket table is distinct-count-
    sized, the within-p windows are <= 50 rows each; compare plans
    with the serial-window form at the same scale."""
    import time as _t

    docs = spark.range(2_000_000).selectExpr(
        "id AS doc_id",
        "concat('s', pmod(xxhash64(id, 5), 50)) AS source",
        "concat_ws(' ', transform(sequence(1, 20),"
        " j -> concat('tok', pmod(xxhash64(id, j), 5000)))) AS text",
        "'en' AS lang",
        "120 AS n_chars",
    ).cache()
    docs.count()
    import os
    import tempfile

    from vectorsearchutil_spark.queries import QUERIES
    from vectorsearchutil_spark.queries_pending import PENDING_QUERIES

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        t0 = _t.time()
        a = (
            PENDING_QUERIES["docs_curriculum_sharded"](spark, tmp)
            .agg(F.sum("global_pos").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        dt_sharded = _t.time() - t0
        t0 = _t.time()
        b = (
            QUERIES["docs_curriculum_order"](spark, tmp)
            .agg(F.sum("global_pos").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        dt_serial = _t.time() - t0
    docs.unpersist()
    assert a == b, (a, b)
    return (
        f"sharded {dt_sharded:.1f}s vs serial-window {dt_serial:.1f}s"
        f" @ 2M docs / 50 sources (orders identical: sum+count match)"
    )


PROBES["curriculum_sharded"] = probe_curriculum_sharded


def probe_retention(spark):
    """20M events / 100k users / 2 years of weeks: the triangle is
    weeks x weeks after one per-user min and one distinct reduce."""
    import os
    import tempfile
    import time as _t

    from vectorsearchutil_spark.queries_pending import PENDING_QUERIES

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 100000) AS user_id",
        "concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "timestamp_seconds(1600000000 + "
        "pmod(xxhash64(id, 11), 63072000)) AS ts",
        "1.0 AS value",
    ).cache()
    e.count()
    with tempfile.TemporaryDirectory() as tmp:
        e.write.parquet(os.path.join(tmp, "events.parquet"))
        # warm the parquet page cache so the timing isolates the
        # OPERATOR plan, not the 20M-row synthetic round-trip
        spark.read.parquet(os.path.join(tmp, "events.parquet")).count()
        t0 = _t.time()
        row = (
            PENDING_QUERIES["events_retention_triangle"](spark, tmp)
            .agg(
                F.count(F.lit(1)).alias("cells"),
                F.sum("retention").alias("s"),
            )
            .collect()[0]
        )
        dt = _t.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events / 100k users -> {row['cells']} cells"


PROBES["retention"] = probe_retention


def probe_readability(spark):
    """2M docs: pure regexp projection — scan-bound."""
    import os
    import tempfile
    import time as _t

    from vectorsearchutil_spark.queries_pending import PENDING_QUERIES

    docs = spark.range(2_000_000).selectExpr(
        "id AS doc_id",
        "concat('s', pmod(id, 20)) AS source",
        "concat_ws(' ', transform(sequence(1, 40),"
        " j -> concat('word', pmod(xxhash64(id, j), 9000),"
        " IF(pmod(j, 9) = 0, '.', '')))) AS text",
        "'en' AS lang", "240 AS n_chars",
    ).cache()
    docs.count()
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        spark.read.parquet(os.path.join(tmp, "documents.parquet")).count()
        t0 = _t.time()
        row = (
            PENDING_QUERIES["docs_readability"](spark, tmp)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("flesch").alias("s"))
            .collect()[0]
        )
        dt = _t.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2M docs -> {row['n']} scored"


def probe_seasonal(spark):
    """20M events / 3 years x 5 types: grid-sized after the first
    aggregate (the daily_peaks shape + two tiny means)."""
    import os
    import tempfile
    import time as _t

    from vectorsearchutil_spark.queries_pending import PENDING_QUERIES

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 100000) AS user_id",
        "concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "timestamp_seconds(1600000000 + "
        "pmod(xxhash64(id, 11), 94608000)) AS ts",
        "10.0 + pmod(xxhash64(id, 13), 7) AS value",
    ).cache()
    e.count()
    with tempfile.TemporaryDirectory() as tmp:
        e.write.parquet(os.path.join(tmp, "events.parquet"))
        spark.read.parquet(os.path.join(tmp, "events.parquet")).count()
        t0 = _t.time()
        row = (
            PENDING_QUERIES["events_seasonal_decompose"](spark, tmp)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.abs(F.col("residual"))).alias("s"),
            )
            .collect()[0]
        )
        dt = _t.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events -> {row['n']} grid cells"


def probe_silhouette(spark):
    """500k x 64 corpus, k=8: the post-fit silhouette pass is
    corpus x k distances (256M HOF cells) + one corpus-keyed
    collect_list — measure whether the interpreted-HOF wall bites."""
    import os
    import tempfile
    import time as _t

    from vectorsearchutil_spark.queries_pending import PENDING_QUERIES

    emb = spark.range(500_000).selectExpr(
        "id AS vec_id",
        "pmod(id, 10) AS label",
        "transform(sequence(1, 64), j ->"
        " cast(pmod(xxhash64(id, j), 1000) AS DOUBLE) / 500.0"
        " + cast(pmod(id, 8) AS DOUBLE) * 3.0) AS embedding",
    ).cache()
    emb.count()
    with tempfile.TemporaryDirectory() as tmp:
        emb.write.parquet(os.path.join(tmp, "embeddings.parquet"))
        spark.read.parquet(
            os.path.join(tmp, "embeddings.parquet")
        ).count()
        t0 = _t.time()
        row = (
            PENDING_QUERIES["embeddings_silhouette"](spark, tmp)
            .agg(
                F.count(F.lit(1)).alias("k"),
                F.sum("mean_silhouette").alias("s"),
            )
            .collect()[0]
        )
        dt = _t.time() - t0
    emb.unpersist()
    return f"{dt:.1f}s @ 500k x 64, k=8 -> {row['k']} clusters"


PROBES["readability"] = probe_readability
PROBES["seasonal"] = probe_seasonal
PROBES["silhouette"] = probe_silhouette


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round7-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
