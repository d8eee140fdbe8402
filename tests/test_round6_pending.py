"""Unit tests for the round-6 pending operator wave (staged in
vectorsearchutil_spark/queries_pending.py while the live registry is
frozen). Oracle parity runs through CHECK_ORACLES_PENDING=1
tools/check_oracles.py; these tests pin the operator SEMANTICS and
the partitioning-invariance / bounded-state contracts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- contamination


def test_contamination_ratio_handmade(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        benchmark_contamination,
    )

    bench = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (10, "a b c d e"),      # 2 distinct 4-grams, both leaked
            (11, "a b c d x y"),    # 3 grams: 'a_b_c_d' leaked, 2 not
            (12, "p q r s t u"),    # 3 grams, clean
            (13, "p q"),            # sub-4-token: zero grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in benchmark_contamination(train, bench, n=4).collect()
    }
    assert got[10]["n_grams"] == 2 and got[10]["contamination_ratio"] == 1.0
    assert got[11]["n_grams"] == 3 and got[11]["n_contaminated"] == 1
    assert got[11]["contamination_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[12]["n_contaminated"] == 0
    assert got[12]["contamination_ratio"] == 0.0
    assert got[13]["n_grams"] == 0 and got[13]["contamination_ratio"] == 0.0


# ---------------------------------------------------------------- keep-best


def test_keep_best_takes_highest_score_then_lowest_id(spark):
    from vectorsearchutil_spark.operators.dedup import (
        keep_best_representative,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
        "doc_id long, score long",
    )
    # cluster {1,2,3} (via chain 1-2, 2-3) and {4}? 4 unpaired; 9 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in keep_best_representative(docs, pairs, "score").collect()
    )
    # cluster survivor = id 2 (score 30 ties with 3 → lower id wins);
    # unpaired 4 and 9 pass through
    assert kept == [2, 4, 9]


def test_keep_best_null_score_loses(spark):
    from vectorsearchutil_spark.operators.dedup import (
        keep_best_representative,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, 1)], "doc_id long, score long"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    kept = [
        r["doc_id"]
        for r in keep_best_representative(docs, pairs, "score").collect()
    ]
    assert kept == [2]


# ---------------------------------------------------------------- t-digest


def _tdigest(spark, rows, **kw):
    from vectorsearchutil_spark.operators.sketches import tdigest_centroids

    df = spark.createDataFrame(rows, "id long, v double")
    return tdigest_centroids(df, "v", "id", **kw)


def test_tdigest_partitioning_invariance(spark):
    from vectorsearchutil_spark.operators.sketches import (
        tdigest_centroids,
        tdigest_quantiles,
    )

    rows = [(i, float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = tdigest_quantiles(
        tdigest_centroids(df, "v", "id", n_buckets=8, n_centroids=16),
        [0.5, 0.9],
    ).collect()
    b = tdigest_quantiles(
        tdigest_centroids(
            df.repartition(13), "v", "id", n_buckets=8, n_centroids=16
        ),
        [0.5, 0.9],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_tdigest_merge_is_union(spark):
    """The sketch contract: sketching two disjoint halves and
    CONCATENATING the centroid tables estimates from the union of
    their state — no re-touch of raw rows."""
    from vectorsearchutil_spark.operators.sketches import (
        tdigest_centroids,
        tdigest_quantiles,
    )

    rows = [(i, float((i * 17) % 251)) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, v double")
    half1 = df.filter(F.col("id") < 300)
    half2 = df.filter(F.col("id") >= 300)
    merged = tdigest_centroids(
        half1, "v", "id", n_buckets=8, n_centroids=16
    ).unionByName(
        tdigest_centroids(half2, "v", "id", n_buckets=8, n_centroids=16)
    )
    ests = {
        r["q"]: r["est"]
        for r in tdigest_quantiles(merged, [0.1, 0.5, 0.9]).collect()
    }
    exact = sorted(v for _, v in rows)
    n = len(exact)
    for q, est in ests.items():
        lo = exact[max(0, int(q * n) - int(n * 0.08) - 1)]
        hi = exact[min(n - 1, int(q * n) + int(n * 0.08))]
        assert lo <= est <= hi, f"q={q}: est {est} outside [{lo}, {hi}]"


def test_tdigest_state_is_constant_size(spark):
    cents = _tdigest(
        spark,
        [(i, float(i)) for i in range(2000)],
        n_buckets=4,
        n_centroids=8,
    )
    assert cents.count() <= 4 * 8


# ---------------------------------------------------------------- reranker


def test_rerank_stub_score_matches_manual(spark):
    from vectorsearchutil_spark.operators.reranker import rerank_shortlist

    short = spark.createDataFrame(
        [(1, 100, 0.5), (1, 101, 0.9), (1, 102, 0.7)],
        "query_id long, vec_id long, score double",
    )
    out = {
        r["vec_id"]: r
        for r in rerank_shortlist(short, k=3, id_col="vec_id").collect()
    }

    def manual(q, d, s):
        u = int(hashlib.md5(f"ce:{q}:{d}".encode()).hexdigest()[:8], 16)
        ce = 0.8 * s + 0.2 * (u / 4294967296.0)
        import math

        return math.floor(ce * 1e6 + 0.5) / 1e6

    for d, s in [(100, 0.5), (101, 0.9), (102, 0.7)]:
        assert out[d]["ce_score"] == manual(1, d, s)
    by_rank = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == [1, 2, 3]
    scores = [r["ce_score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)  # rank follows score desc


def test_rerank_keeps_k_per_query(spark):
    from vectorsearchutil_spark.operators.reranker import rerank_shortlist

    short = spark.createDataFrame(
        [(q, d, float(d % 7) / 7.0) for q in (1, 2) for d in range(20)],
        "query_id long, vec_id long, score double",
    )
    out = rerank_shortlist(short, k=5, id_col="vec_id")
    per_q = (
        out.groupBy("query_id").count().orderBy("query_id").collect()
    )
    assert [(r["query_id"], r["count"]) for r in per_q] == [(1, 5), (2, 5)]


def test_try_load_cross_encoder_absent_returns_none():
    from vectorsearchutil_spark.operators.reranker import (
        try_load_cross_encoder,
    )

    assert try_load_cross_encoder("any-model") is None


# ---------------------------------------------------------------- skew report


def test_skew_report_math(spark):
    from vectorsearchutil_spark.functions.skew import skew_report

    df = spark.createDataFrame(
        [("hot",)] * 80 + [("warm",)] * 15 + [(None,)] * 5,
        "k string",
    )
    rows = skew_report(df, "k", top_n=2, target_share=0.10).collect()
    assert [r["key"] for r in rows] == ["hot", "warm"]
    hot = rows[0]
    assert hot["n_rows"] == 80
    assert hot["share"] == 0.8
    assert hot["suggested_salt"] == 8  # ceil(0.8 / 0.1)


def test_skew_report_nulls_are_a_group(spark):
    from vectorsearchutil_spark.functions.skew import skew_report

    df = spark.createDataFrame([(None,), (None,), ("a",)], "k string")
    rows = skew_report(df, "k", top_n=10).collect()
    assert rows[0]["key"] == "<null>" and rows[0]["n_rows"] == 2


# ---------------------------------------------------------------- truncation


def test_truncation_stats_handmade(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        truncation_stats,
    )

    # BPE-ish tokens: 'aa bb' -> ['aa', ' bb'] = 2 tokens
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa")],  # 4 and 1 tokens
        "doc_id long, text string",
    )
    rows = {
        r["ctx_len"]: r
        for r in truncation_stats(docs, [2, 8]).collect()
    }
    assert rows[2]["n_truncated"] == 1
    assert rows[2]["lost_tokens"] == 2  # doc1 loses 4-2
    assert rows[2]["total_tokens"] == 5
    assert rows[2]["lost_frac"] == 0.4
    assert rows[8]["n_truncated"] == 0 and rows[8]["lost_frac"] == 0.0


def test_pending_registry_has_oracles():
    from vectorsearchutil_spark.queries_pending import (
        PENDING_ORACLES,
        PENDING_QUERIES,
    )

    assert set(PENDING_ORACLES) == set(PENDING_QUERIES)
    assert len(PENDING_QUERIES) == 11


# ---------------------------------------------------------------- containment


def test_containment_finds_short_in_long(spark):
    from vectorsearchutil_spark.operators.dedup import containment_pairs

    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(10, 20))  # embedded run
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, other)],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, n=3, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["containment"] == 1.0


def test_containment_jaccard_would_miss_it(spark):
    """The motivating case: containment 1.0 but Jaccard far below
    any dedup threshold."""
    from vectorsearchutil_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    long_text = " ".join(f"w{i}" for i in range(60))
    short_text = " ".join(f"w{i}" for i in range(10, 18))
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text)], "doc_id long, text string"
    )
    assert containment_pairs(docs, n=3, threshold=0.9).count() == 1
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.8).count() == 0


def test_containment_partitioning_invariance(spark):
    from vectorsearchutil_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{(i * 7 + j) % 50}" for j in range(20)))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, containment_pairs(docs, n=3, threshold=0.8).collect())
    )
    b = sorted(
        map(
            tuple,
            containment_pairs(
                docs.repartition(7), n=3, threshold=0.8
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------- hubness


def test_hubness_arrow_matches_expression(spark):
    """Strategy equality: the gated Arrow path must reproduce the
    JVM expression path's counts exactly (bit-identical scores →
    identical ranks)."""
    from vectorsearchutil_spark.operators.knn import knn_hubness

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    expr = {
        (r["vec_id"], r["k_occurrence"])
        for r in knn_hubness(
            emb, k=5, vector_col="embedding", id_col="vec_id"
        ).collect()
    }
    arrow = {
        (r["vec_id"], r["k_occurrence"])
        for r in knn_hubness(
            emb,
            k=5,
            vector_col="embedding",
            id_col="vec_id",
            n_rows=10_000_000,  # force the gate over the cell limit
        ).collect()
    }
    assert expr == arrow


def test_hubness_excludes_invalid_vectors(spark):
    from vectorsearchutil_spark.operators.knn import knn_hubness

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),        # zero-norm: excluded
            (4, None),              # NULL: excluded
            (5, [float("nan"), 1.0]),  # non-finite: excluded
        ],
        "id long, vector array<double>",
    )
    got = {
        r["id"]: r["k_occurrence"]
        for r in knn_hubness(df, k=1).collect()
    }
    # 1 and 2 are each other's only neighbour; 3/4/5 present with 0
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


# ---------------------------------------------------------------- fk audit


def test_fk_orphan_audit_counts(spark):
    from vectorsearchutil_spark.operators.integrity import fk_orphan_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = fk_orphan_audit(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()[0]
    assert row["n_children"] == 5
    assert row["n_distinct_keys"] == 3
    assert row["n_orphan_rows"] == 1  # the fk=99 row; NULL not orphan
    assert row["n_orphan_keys"] == 1
    assert row["orphan_rate"] == 0.2


# ---------------------------------------------------------------- retrieval eval


def test_retrieval_metrics_handmade(spark):
    """2-D geometry with known ranking: query label 1 at (1,0);
    corpus: (1,0.01)->label 1 (rank 1, rel), (0.9,0.2)->label 0
    (rank 2), (0.5,0.5)->label 1 (rank 3, rel)."""
    import math

    from pyspark.sql import functions as F

    from vectorsearchutil_spark.operators.evaluation import (
        retrieval_label_metrics,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),        # the query
            (10, [1.0, 0.01], 1),
            (11, [0.9, 0.2], 0),
            (12, [0.5, 0.5], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    row = retrieval_label_metrics(
        emb, F.col("vec_id") < 10, k=10, id_col="vec_id"
    ).collect()[0]
    assert row["n_relevant"] == 2
    assert row["mrr"] == 1.0
    d = [
        int(math.floor(1e12 / math.log2(r + 1) + 0.5)) for r in (1, 2, 3)
    ]
    dcg = d[0] + d[2]       # relevant at ranks 1 and 3
    idcg = d[0] + d[1]      # ideal: both relevant up front
    want = math.floor(dcg / idcg * 1e6 + 0.5) / 1e6
    assert row["ndcg"] == want


def test_retrieval_metrics_no_relevant_is_zero(spark):
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.operators.evaluation import (
        retrieval_label_metrics,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 5), (10, [1.0, 0.1], 7)],
        "vec_id long, embedding array<double>, label int",
    )
    row = retrieval_label_metrics(
        emb, F.col("vec_id") < 10, k=10, id_col="vec_id"
    ).collect()[0]
    assert row["mrr"] == 0.0 and row["ndcg"] == 0.0


# ---------------------------------------------------------------- pct rank


def test_percentile_rank_handmade(spark):
    from vectorsearchutil_spark.operators.sketches import (
        percentile_rank_enrich,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "a", 2.0),
            (3, "a", 2.0),   # tie with id 2
            (4, "a", 5.0),
            (5, "b", 7.0),   # singleton group -> NULL (n-1 = 0)
            (6, "a", None),  # NULL value -> NULL rank
        ],
        "id long, g string, v double",
    )
    got = {
        r["id"]: r["pct_rank"]
        for r in percentile_rank_enrich(df, "v", "g", "id").collect()
    }
    assert got[1] == 0.0
    assert got[2] == got[3] == pytest.approx(1 / 3, abs=1e-6)
    assert got[4] == 1.0
    assert got[5] is None and got[6] is None


def test_percentile_rank_matches_percent_rank_when_distinct(spark):
    """On all-distinct cent-quantized values the two-level result
    equals SQL percent_rank over raw rows."""
    from pyspark.sql import Window

    from vectorsearchutil_spark.operators.sketches import (
        percentile_rank_enrich,
    )

    df = spark.createDataFrame(
        [(i, "g", float((i * 37) % 97)) for i in range(200)],
        "id long, g string, v double",
    )
    got = {
        r["id"]: r["pct_rank"]
        for r in percentile_rank_enrich(df, "v", "g", "id").collect()
    }
    import math

    w = Window.partitionBy("g").orderBy("v")
    want = {
        r["id"]: math.floor(r["pr"] * 1e6 + 0.5) / 1e6
        for r in df.withColumn(
            "pr", F.percent_rank().over(w)
        ).collect()
    }
    assert got == want
