"""Mixture / temperature sampling, deterministic sharding, and the
unigram-LM quality score: semantics + partitioning-independence."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vectorsearchutil_spark.operators.sampling import (
    deterministic_shard,
    mixture_sample,
    temperature_rebalance,
)
from vectorsearchutil_spark.operators.textanalysis import unigram_logprob
from vectorsearchutil_spark.sources.readers import load_table


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_temperature_alpha_zero_equalizes(spark, sf_dir):
    """α=0 gives every language the same target share, so rare
    languages keep (nearly) everything and dominant ones downsample
    hardest."""
    docs = load_table(spark, sf_dir, "documents")
    out = temperature_rebalance(
        docs, stratum_col="lang", key_col="doc_id", alpha=0.0, budget=100
    )
    shares = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_langs = docs.select("lang").distinct().count()
    # each stratum targets budget/n_langs rows (Bernoulli noise aside)
    target = 100 / n_langs
    for n in shares.values():
        assert n < 3 * target + 10


def test_temperature_budget_cap_keeps_everything(spark, sf_dir):
    """budget ≥ corpus size → every rate caps at 1.0 → identity."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    out = temperature_rebalance(
        docs, stratum_col="lang", key_col="doc_id", alpha=0.5,
        budget=total * 10,
    )
    assert out.count() == total


def test_temperature_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = temperature_rebalance(
        docs, stratum_col="lang", key_col="doc_id", alpha=0.5, budget=200
    )
    b = temperature_rebalance(
        docs.repartition(13), stratum_col="lang", key_col="doc_id",
        alpha=0.5, budget=200,
    )
    assert _ids(a) == _ids(b)


def test_mixture_weights_shape_the_sample(spark, sf_dir):
    """A 9:1 weight ratio between two sources must show up as a
    larger kept count for the heavy source (both sources have equal
    natural frequency in the synthetic corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    out = mixture_sample(
        docs,
        weights={"src0": 9.0, "src1": 1.0},
        stratum_col="source",
        key_col="doc_id",
        budget=120,
        default_weight=0.0,
    )
    n = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(n) <= {"src0", "src1"}  # default weight 0 drops the rest
    assert n.get("src0", 0) > 2 * n.get("src1", 0)


def test_shard_addresses_every_row_exactly_once(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = deterministic_shard(docs, key_col="doc_id", n_shards=4).cache()
    total = docs.count()
    assert out.count() == total
    # positions are 1..count_in_shard, dense, per shard
    per = (
        out.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.count_distinct("pos").alias("npos"),
        )
        .collect()
    )
    assert {r["shard"] for r in per} <= set(range(4))
    for r in per:
        assert (r["lo"], r["hi"], r["npos"]) == (1, r["n"], r["n"])
    out.unpersist()


def test_shard_stable_across_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = deterministic_shard(docs, key_col="doc_id", n_shards=4)
    b = deterministic_shard(docs.repartition(7), key_col="doc_id", n_shards=4)
    rows = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["shard"], r["pos"]) for r in df.collect()
    )
    assert rows(a) == rows(b)


def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob(df).collect()
    }
    # corpus: a×2 b×2 c×1, total 5
    lp = lambda c: math.log(c) - math.log(5)  # noqa: E731
    exp1 = round((lp(2) + lp(2) + lp(2)) / 3, 4)
    exp2 = round((lp(2) + lp(1)) / 2, 4)
    assert out[1] == (3, exp1)
    assert out[2] == (2, exp2)


def test_rate_sample_plan_is_broadcast_join(spark, sf_dir):
    """The stats join must broadcast — no shuffle of the corpus side."""
    from vectorsearchutil_spark.plans.explain import formatted_plan

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_rebalance(
        docs, stratum_col="lang", key_col="doc_id", alpha=0.5, budget=200
    )
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_reservoir_proportional_and_stable(spark):
    """A-Res with hash draws: heavier rows are sampled more often
    (inclusion ∝ weight across many disjoint strata), the cut is
    partitioning-independent, and weight <= 0 rows never appear."""
    from vectorsearchutil_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    # 200 strata of 10 rows each: weights 1..9 and one zero-weight row
    rows = [
        (s * 100 + w, f"s{s}", w if w > 0 else 0)
        for s in range(200)
        for w in range(10)
    ]
    df = spark.createDataFrame(rows, ["id", "stratum", "w"])
    out = weighted_reservoir_sample(
        df, k=2, weight_col="w", key_col="id", stratum_col="stratum"
    ).collect()
    assert len(out) == 400  # 2 per stratum
    assert all(r["w"] > 0 for r in out)
    picked_w = [r["w"] for r in out]
    # heavy rows (w >= 7) should win far more than light ones (w <= 3):
    # expected inclusion ratio ~ (7+8+9)/(1+2+3) = 4x; assert > 2x
    heavy = sum(1 for w in picked_w if w >= 7)
    light = sum(1 for w in picked_w if 1 <= w <= 3)
    assert heavy > 2 * light
    # partitioning-independent
    again = weighted_reservoir_sample(
        df.repartition(16), k=2, weight_col="w", key_col="id",
        stratum_col="stratum",
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_weighted_reservoir_global_topk_plan(spark):
    """No stratum -> global k: the plan must be a TakeOrderedAndProject
    (distributed top-k), not a full sort."""
    from vectorsearchutil_spark.operators.sampling import (
        weighted_reservoir_sample,
    )
    from vectorsearchutil_spark.plans.explain import formatted_plan

    df = spark.range(0, 10000).selectExpr("id", "id % 7 + 1 AS w")
    out = weighted_reservoir_sample(df, k=10, weight_col="w", key_col="id")
    assert "TakeOrderedAndProject" in formatted_plan(out)
    assert len(out.collect()) == 10


# ------------------------------------------------- UniMax allocation


def _docs_with_tokens(spark, sizes):
    """One doc per (source, n_tokens) pair."""
    rows = [
        (i, src, " ".join(["w"] * n))
        for i, (src, n) in enumerate(sizes)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_unimax_hand_computed(spark):
    """caps [5,10,100,100], B=40: the two small sources saturate
    (5·4<40, 10·3<35), the rest split ⌊25/2⌋=12 each."""
    from vectorsearchutil_spark.operators.sampling import unimax_allocation

    docs = _docs_with_tokens(
        spark, [("a", 5), ("b", 10), ("c", 100), ("d", 100)]
    )
    got = {
        r["source"]: (r["tokens"], r["alloc"], r["epochs_used"])
        for r in unimax_allocation(docs, budget=40).collect()
    }
    assert got == {
        "a": (5, 5, 1.0),
        "b": (10, 10, 1.0),
        "c": (100, 12, 0.12),
        "d": (100, 12, 0.12),
    }


def test_unimax_budget_exceeds_corpus(spark):
    """B larger than every cap: all sources saturate at cap; with
    max_epochs=2 caps double."""
    from vectorsearchutil_spark.operators.sampling import unimax_allocation

    docs = _docs_with_tokens(spark, [("a", 5), ("b", 10)])
    got = {
        r["source"]: r["alloc"]
        for r in unimax_allocation(docs, budget=1000, max_epochs=2).collect()
    }
    assert got == {"a": 10, "b": 20}


def test_unimax_conservation_and_invariance(spark):
    """Σ alloc never exceeds B, loses at most n_uncapped to floors,
    and is identical under any partitioning."""
    from vectorsearchutil_spark.operators.sampling import unimax_allocation

    sizes = [(f"s{i}", 3 + (i * 17) % 50) for i in range(23)]
    docs = _docs_with_tokens(spark, sizes)
    B = 500
    rows = unimax_allocation(docs, budget=B).collect()
    total = sum(r["alloc"] for r in rows)
    n_uncapped = sum(1 for r in rows if r["alloc"] != r["cap"])
    assert total <= B
    assert total >= B - max(n_uncapped, 1) or all(
        r["alloc"] == r["cap"] for r in rows
    )
    again = {
        r["source"]: r["alloc"]
        for r in unimax_allocation(docs.repartition(7), budget=B).collect()
    }
    assert again == {r["source"]: r["alloc"] for r in rows}


def test_unimax_all_empty_source_null_epochs(spark):
    """A zero-token source allocates 0 with NULL epochs_used — the
    bare ANSI division raised before the try_divide guard."""
    from vectorsearchutil_spark.operators.sampling import unimax_allocation

    docs = spark.createDataFrame(
        [(1, "empty", ""), (2, "full", "a b c d")],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: (r["alloc"], r["epochs_used"])
        for r in unimax_allocation(docs, budget=10).collect()
    }
    assert got == {"empty": (0, None), "full": (4, 1.0)}
