"""Cardinality sketches: accuracy bounds, merge algebra, and the
bounded-shuffle plan posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearchutil_spark.operators.sketches import (
    hll_distinct,
    hll_error_bound,
    hll_merge,
    hll_registers,
    kmv_distinct,
)
from vectorsearchutil_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def _exact(events):
    return {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }


def test_hll_within_error_bound(events):
    exact = _exact(events)
    est = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(events, ["event_type"], "user_id", b=8).collect()
    }
    assert set(est) == set(exact)
    # 4 standard errors: P(outside) ~ 6e-5 per group, and the sketch
    # is deterministic so this is a fixed fact about the data, not a
    # flaky sample
    tol = 4 * hll_error_bound(8)
    for k, n in exact.items():
        assert abs(est[k] - n) / n < tol, (k, est[k], n)


def test_kmv_within_error_bound(events):
    exact = _exact(events)
    est = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(events, ["event_type"], "user_id", k=64).collect()
    }
    # KMV relative std error ~ 1/sqrt(k-2)
    tol = 4 / (62.0**0.5)
    for k_, n in exact.items():
        assert abs(est[k_] - n) / n < tol, (k_, est[k_], n)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], "g string, v int"
    )
    out = kmv_distinct(df, ["g"], "v", k=64).collect()
    assert out[0]["est_distinct"] == 7.0


def test_hll_merge_equals_whole(events):
    """max-merge of shard registers == registers of the union: the
    algebra that lets daily sketches roll up without raw data."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(
        hll_registers(a, ["event_type"], "user_id", b=8),
        hll_registers(b, ["event_type"], "user_id", b=8),
        ["event_type"],
    )
    whole = hll_registers(events, ["event_type"], "user_id", b=8)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_register_state_is_bounded(events):
    regs = hll_registers(events, ["event_type"], "user_id", b=8)
    per_group = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= 256 for r in per_group)


def test_kmv_plan_uses_window_group_limit(events):
    """The rank<=k cut must compile to WindowGroupLimit so each map
    task forwards at most k rows per group (k-bounded shuffle)."""
    from vectorsearchutil_spark.plans.explain import formatted_plan

    plan = formatted_plan(kmv_distinct(events, ["event_type"], "user_id", k=64))
    assert "WindowGroupLimit" in plan


def test_histogram_quantiles_within_bin_width(events):
    from vectorsearchutil_spark.operators.sketches import histogram_quantiles

    got = {
        r["p"]: r["est"]
        for r in histogram_quantiles(
            events, "value", lo=0.0, hi=500.0, bins=128
        ).collect()
    }
    exact = events.selectExpr(
        "percentile(value, 0.5) p50",
        "percentile(value, 0.9) p90",
        "percentile(value, 0.99) p99",
    ).first()
    width = 500.0 / 128
    assert abs(got[0.5] - exact["p50"]) <= width
    assert abs(got[0.9] - exact["p90"]) <= width
    assert abs(got[0.99] - exact["p99"]) <= width


def test_hll_streaming_accumulator(spark, sf_dir, events, tmp_path):
    """HLL registers as a streaming accumulator: per micro-batch
    register tables max-merged via foreachBatch converge to exactly
    the batch sketch — distinct counting over an unbounded stream
    with constant state."""
    from pyspark.sql import functions as SF

    from vectorsearchutil_spark.streaming.windows import read_events_stream

    state_dir = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "ckpt")

    def upsert(batch_df, batch_id):
        import os

        batch_regs = hll_registers(batch_df, ["event_type"], "user_id", b=8)
        if os.path.isdir(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = hll_merge(prev, batch_regs, ["event_type"])
        else:
            merged = batch_regs
        merged.write.mode("overwrite").parquet(state_dir + "_next")
        nxt = batch_df.sparkSession.read.parquet(state_dir + "_next")
        nxt.write.mode("overwrite").parquet(state_dir)

    stream = read_events_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(state_dir)
    batch = hll_registers(events, ["event_type"], "user_id", b=8)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # and therefore identical estimates
    a = {
        r["event_type"]: r["est_distinct"]
        for r in __import__(
            "vectorsearchutil_spark.operators.sketches", fromlist=["x"]
        ).hll_estimate(streamed, ["event_type"], b=8).collect()
    }
    b_ = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(events, ["event_type"], "user_id", b=8).collect()
    }
    assert a == b_


def test_kmv_overlap_tracks_exact_jaccard(spark):
    """Sketch-only overlap estimates land near truth: three synthetic
    segments with engineered overlaps (50%, ~0%, nested)."""
    from vectorsearchutil_spark.operators.sketches import (
        kmv_overlap_pairs,
        kmv_sketch,
    )

    rows = []
    rows += [("a", v) for v in range(0, 2000)]        # A = [0, 2000)
    rows += [("b", v) for v in range(1000, 3000)]     # B = [1000, 3000)
    rows += [("c", v) for v in range(50000, 52000)]   # C disjoint
    df = spark.createDataFrame(rows, ["seg", "val"])
    sk = kmv_sketch(df, ["seg"], "val", k=256)
    out = {
        (r["key_a"], r["key_b"]): r
        for r in kmv_overlap_pairs(sk, "seg", k=256).collect()
    }
    ab = out[("a", "b")]
    # exact jaccard = 1000/3000 = 0.333; KMV rse ~ 1/sqrt(256) = 6%
    assert abs(ab["jaccard_est"] - 1 / 3) < 0.1
    assert abs(ab["intersection_est"] - 1000) < 350
    assert abs(ab["union_est"] - 3000) < 600
    ac = out[("a", "c")]
    assert ac["jaccard_est"] < 0.02 and ac["intersection_est"] < 60


def test_cms_never_underestimates_and_merges(spark):
    """CMS guarantees: est >= exact for every value; two shard
    sketches summed == whole-corpus sketch (merge by addition)."""
    import pyspark.sql.functions as F

    from vectorsearchutil_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )

    rows = [(f"v{i % 50}",) for i in range(5000)]
    df = spark.createDataFrame(rows, ["val"]).cache()
    cms = cms_table(df, "val", d=4, w=64).cache()
    probes = df.distinct()
    est = {
        r["val"]: r["est_count"]
        for r in cms_estimate(cms, probes, "val", d=4, w=64).collect()
    }
    exact = {
        r["val"]: r["c"]
        for r in df.groupBy("val").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(est[v] >= exact[v] for v in exact)
    # collisions bounded: w=64 over 50 values, slack stays small
    assert all(est[v] <= exact[v] + 600 for v in exact)

    # mergeability: two disjoint shards' sketches add up to the
    # whole-corpus sketch
    shard_a = df.filter(F.substring("val", 2, 10).cast("int") < 25)
    shard_b = df.filter(F.substring("val", 2, 10).cast("int") >= 25)
    a = cms_table(shard_a, "val", d=4, w=64)
    b = cms_table(shard_b, "val", d=4, w=64)
    merged = (
        a.unionByName(b).groupBy("i", "j").agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["i"], r["j"]): r["cnt"] for r in cms.collect()}
    got = {(r["i"], r["j"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_cms_streaming_accumulator(spark, sf_dir, events, tmp_path):
    """CMS counters as a streaming accumulator: per-micro-batch
    sketches SUM-merged via foreachBatch converge to exactly the
    batch sketch — frequency screening over an unbounded stream with
    d x w fixed state (the additive twin of the HLL max-merge)."""
    import pyspark.sql.functions as F

    from vectorsearchutil_spark.operators.sketches import cms_table
    from vectorsearchutil_spark.streaming.windows import read_events_stream

    state_dir = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "cms_ckpt")

    def upsert(batch_df, batch_id):
        import os

        batch_cms = cms_table(batch_df, "event_type", d=4, w=64)
        if os.path.isdir(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = (
                prev.unionByName(batch_cms)
                .groupBy("i", "j")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = batch_cms
        merged.write.mode("overwrite").parquet(state_dir + "_next")
        nxt = batch_df.sparkSession.read.parquet(state_dir + "_next")
        nxt.write.mode("overwrite").parquet(state_dir)

    stream = read_events_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["i"], r["j"]): r["cnt"]
        for r in spark.read.parquet(state_dir).collect()
    }
    batch = {
        (r["i"], r["j"]): r["cnt"]
        for r in cms_table(events, "event_type", d=4, w=64).collect()
    }
    assert streamed == batch


def test_heavy_hitters_exact_complete_recall(spark):
    """Two-pass heavy hitters == naive groupBy+filter, regardless of
    how rows are partitioned (the pigeonhole recall guarantee), and
    a skewed layout cannot create false negatives."""
    import pyspark.sql.functions as F

    from vectorsearchutil_spark.operators.sketches import heavy_hitters_exact

    # 3 heavy values (>= 5%) + long tail
    rows = (
        [("hot1",)] * 600 + [("hot2",)] * 400 + [("hot3",)] * 300
        + [(f"tail{i}",) for i in range(4700)]
    )
    df = spark.createDataFrame(rows, ["v"])

    def naive(d):
        total = d.count()
        return {
            (r["v"], r["c"])
            for r in d.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 0.05 * total).collect()
        }

    want = naive(df)
    assert {v for v, _ in want} == {"hot1", "hot2", "hot3"}
    for layout in (df, df.repartition(32), df.repartition(2, "v")):
        got = {
            (r["v"], r["cnt"])
            for r in heavy_hitters_exact(layout, "v", phi=0.05).collect()
        }
        assert got == want


def test_histogram_quantiles_ignores_nulls(spark, events):
    """ADVICE r3 (low): null values must neither crash the collected-
    sketch sort (None vs int) nor fold into the total; estimates are
    over non-null values only."""
    from vectorsearchutil_spark.operators.sketches import histogram_quantiles

    with_nulls = events.select("value").unionByName(
        spark.range(50).selectExpr("CAST(NULL AS DOUBLE) AS value")
    )
    got = {
        r["p"]: r["est"]
        for r in histogram_quantiles(
            with_nulls, "value", lo=0.0, hi=500.0, bins=128
        ).collect()
    }
    clean = {
        r["p"]: r["est"]
        for r in histogram_quantiles(
            events, "value", lo=0.0, hi=500.0, bins=128
        ).collect()
    }
    assert got == clean


def _naive_weighted_median(rows):
    """Reference definition: min v whose running weight (ordered by
    v) reaches half the group total."""
    out = {}
    by_g: dict = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        tot = sum(w for _, w in vw)
        cum = 0.0
        for v, w in sorted(vw):
            cum += w
            if cum >= tot / 2:
                out[g] = v
                break
    return out


def test_weighted_median_exact_matches_naive(spark):
    """Histogram refinement is EXACT: equal to the sort-based
    definition on adversarial inputs — duplicate values straddling
    bucket boundaries, heavy single values, integer weights."""
    from vectorsearchutil_spark.operators.sketches import (
        weighted_median_exact,
    )

    rows = [
        ("a", float(v % 97) / 3.0, float(1 + (v * 7) % 5))
        for v in range(2000)
    ] + [
        ("b", 5.0, 100.0),  # one value holds most of the mass
        ("b", 1.0, 1.0),
        ("b", 9.0, 1.0),
        ("c", 4.25, 2.0),  # single-value group (mn == mx)
        ("d", 1.0, 1.0),  # exact half-crossing tie: W/2 == first row
        ("d", 2.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    want = _naive_weighted_median(rows)
    for n_buckets in (4, 4096):
        got = {
            r["g"]: r["wm"]
            for r in weighted_median_exact(
                df.repartition(16), "g", "v", "w",
                out_col="wm", n_buckets=n_buckets,
            ).collect()
        }
        assert got == want, n_buckets


def test_weighted_median_ignores_nulls(spark):
    from vectorsearchutil_spark.operators.sketches import (
        weighted_median_exact,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", None, 50.0), ("a", 3.0, 1.0),
         ("a", 2.0, None)],
        "g string, v double, w double",
    )
    got = weighted_median_exact(df, "g", "v", "w").collect()
    assert [(r["g"], r["weighted_median"]) for r in got] == [("a", 1.0)]


def test_hll_running_distinct_monotone_and_merge_consistent(spark):
    """The cumulative estimate is non-decreasing and the final day's
    value equals the whole-corpus (single-group) HLL estimate — the
    register max-merge algebra."""
    from vectorsearchutil_spark.operators.sketches import (
        hll_distinct,
        hll_running_distinct,
    )
    import pyspark.sql.functions as F

    ev = spark.range(20_000).selectExpr(
        "date_add(date '2024-01-01', cast(pmod(xxhash64(id, 1), 10)"
        " AS INT)) AS day",
        "pmod(xxhash64(id, 3), 3000) AS user_id",
    )
    run = sorted(
        (r["day"], r["est_distinct"])
        for r in hll_running_distinct(ev, "day", "user_id").collect()
    )
    assert len(run) == 10
    vals = [v for _, v in run]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    whole = hll_distinct(
        ev.withColumn("g", F.lit(1)), ["g"], "user_id"
    ).collect()[0]["est_distinct"]
    assert vals[-1] == whole


def test_weighted_quantile_generalization(spark):
    """quantile=q returns the smallest v with W(≤v) ≥ q·W — checked
    against the naive definition at several q."""
    from vectorsearchutil_spark.operators.sketches import (
        weighted_median_exact,
    )

    rows = [
        ("a", float(v % 53) / 7.0, float(1 + (v * 11) % 4))
        for v in range(999)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")

    def naive(q):
        vw = sorted((v, w) for _, v, w in rows)
        tot = sum(w for _, w in vw)
        cum = 0.0
        for v, w in vw:
            cum += w
            if cum >= tot * q:
                return v

    for q in (0.1, 0.25, 0.5, 0.9, 1.0):
        got = weighted_median_exact(
            df, "g", "v", "w", out_col="x", quantile=q
        ).collect()[0]["x"]
        assert got == naive(q), q
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quantile"):
        weighted_median_exact(df, "g", "v", "w", quantile=0.0)
