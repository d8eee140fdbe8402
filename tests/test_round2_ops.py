import pyspark.sql.functions as F
import pytest

from vectorsearchutil_spark.operators.embeddings import (
    normalize_vectors,
    quantize_int8,
)
from vectorsearchutil_spark.operators.knn import knn_filtered
from vectorsearchutil_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)
from vectorsearchutil_spark.operators.textanalysis import filter_pipeline
from vectorsearchutil_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_knn_filtered_pre_filter_semantics(spark, emb):
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = knn_filtered(
        emb, qv, F.col("label").isin(1, 2), k=10,
        vector_col="embedding", id_col="vec_id",
    ).collect()
    assert len(out) == 10  # pre-filter: k full results
    assert all(r["label"] in (1, 2) for r in out)


def test_knn_filtered_predicate_pushed_to_scan(spark):
    from vectorsearchutil_spark.plans.explain import formatted_plan

    # sf0.01 here: the module fixture caches the sf0.001 scan, and
    # cache substitution would swap in an InMemoryTableScan with no
    # PushedFilters line
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    out = knn_filtered(
        emb, [0.0] * 64, F.col("label") == 3, k=5,
        vector_col="embedding", id_col="vec_id",
    )
    plan = formatted_plan(out)
    import re

    assert re.search(r"PushedFilters: \[[^\]]*label", plan), plan


def test_hash_sample_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.3, "doc_id").collect()
    }
    assert a == b  # df.sample() would fail this
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n


def test_stratified_sample_rates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = stratified_hash_sample(
        orders,
        rates={"1-URGENT": 1.0, "5-LOW": 0.0},
        stratum_col="o_orderpriority",
        key_col="o_orderkey",
        default_rate=0.1,
    )
    by_prio = {
        r["o_orderpriority"]: r["n"]
        for r in out.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_prio["1-URGENT"] == total["1-URGENT"]  # rate 1.0 keeps all
    assert "5-LOW" not in by_prio  # rate 0.0 drops all
    assert 0 < by_prio["3-MEDIUM"] < total["3-MEDIUM"]  # default 0.1


def test_normalize_unit_norm(emb):
    out = normalize_vectors(emb, vector_col="embedding")
    from vectorsearchutil_spark.functions.vector import l2_norm

    norms = out.select(l2_norm(F.col("unit_vec")).alias("n")).collect()
    assert all(abs(r["n"] - 1.0) < 1e-9 for r in norms)


def test_quantize_reconstruction_error_bounded(emb):
    out = quantize_int8(emb, vector_col="embedding")
    # reconstruction q*scale within scale/2 of the original per dim
    err = out.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("q8"),
                lambda v, q: F.abs(v - q * F.col("scale")),
            )
        ).alias("max_err"),
        F.col("scale"),
    ).collect()
    assert all(r["max_err"] <= r["scale"] / 2 + 1e-12 for r in err)
    # int8 range respected
    rng = out.select(
        F.array_max("q8").alias("hi"), F.array_min("q8").alias("lo")
    ).agg(F.max("hi"), F.min("lo")).first()
    assert rng[0] <= 127 and rng[1] >= -127


def test_filter_pipeline_reasons(spark):
    rows = [
        (0, "the " + " ".join(f"tok{i}word" for i in range(40))),  # keep
        (1, "short doc"),  # too_short
        (2, " ".join(["aa"] * 50)),  # mean_tok_short (len 2)
        # mean length in range, one 25-char token over the cap
        (3, "the " + " ".join(f"tok{i:02d}" for i in range(40))
            + " superlongtokenxxxxxxxxxxx"),
        (4, "the " + " ".join(["repeat"] * 60)),  # repetitive
        (5, " ".join(f"uniq{i}xx" for i in range(50))),  # no_stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in filter_pipeline(df).collect()}
    assert out[0]["keep"] and out[0]["reject_reason"] is None
    assert out[1]["reject_reason"] == "too_short"
    assert out[2]["reject_reason"] == "mean_tok_short"
    assert out[3]["reject_reason"] == "token_too_long"
    assert out[4]["reject_reason"] == "repetitive"
    assert out[5]["reject_reason"] == "no_stopwords"
    assert not out[4]["keep"]


def test_mmr_diversifies_over_plain_topk(spark):
    from vectorsearchutil_spark.operators.similarity import mmr_rerank

    # candidates: d1 and d2 nearly identical and most relevant,
    # d3 orthogonal-ish but still relevant. Plain top-2 = {1, 2};
    # MMR must pick d3 second (d2's redundancy penalty dominates).
    rows = [
        (0, 1, 0.99, [1.0, 0.0]),
        (0, 2, 0.98, [0.999, 0.01]),
        (0, 3, 0.60, [0.0, 1.0]),
    ]
    cands = spark.createDataFrame(
        rows, "query_id long, vec_id long, rel double, embedding array<double>"
    )
    out = mmr_rerank(cands, k=2, lam=0.5).collect()
    picked = {r["mmr_rank"]: r["vec_id"] for r in out}
    assert picked == {1: 1, 2: 3}


def test_mmr_rank1_is_most_relevant_and_deterministic(spark, emb):
    from vectorsearchutil_spark.operators.knn import knn_batch
    from vectorsearchutil_spark.operators.similarity import mmr_rerank

    qs = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    cands = (
        knn_batch(emb, qs, k=8, vector_col="embedding", id_col="vec_id",
                  metric="cosine")
        .select("query_id", "vec_id", F.round("distance", 6).alias("rel"))
        .join(emb.select("vec_id", "embedding"), "vec_id")
    )
    a = {(r["query_id"], r["mmr_rank"]): r["vec_id"]
         for r in mmr_rerank(cands, k=4).collect()}
    b = {(r["query_id"], r["mmr_rank"]): r["vec_id"]
         for r in mmr_rerank(cands.repartition(7), k=4).collect()}
    assert a == b  # partitioning-independent
    assert a[(0, 1)] == 0 and a[(1, 1)] == 1  # self is most relevant
