"""Scale probe for the round-3 operator additions at ~25× bench scale
(VERDICT r3 #6): CMS, KMV overlap, exact heavy hitters (including a
vocabulary-heavy adversarial case), FFD packing, weighted reservoir,
Z-order layout.

Synthetic inputs are deterministic (spark.range + hash mixes — no RNG)
so runs are comparable across machines. Each op is timed warm (one
small run first) the way bench.py times headline queries. Results are
recorded in PERF.md.

Usage: python tools/probe_round4_scale.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

N_EVENTS = 2_500_000
N_DOCS = 125_000


def _tokens(spark, n, vocab_pow=1.5, distinct=50_000):
    """n zipf-ish token rows: rank = floor(u^-1/s scaled), token =
    'tok<rank>' — heavy head, long tail, deterministic."""
    return spark.range(n).selectExpr(
        "id",
        f"concat('tok', cast(pow(pmod(xxhash64(id), 1000000) / 1000000.0"
        f" + 1e-9, -{1.0 / vocab_pow}) * 17 as bigint) % {distinct})"
        " AS token",
    )


def _events(spark, n, groups=40):
    return spark.range(n).selectExpr(
        f"concat('g', pmod(xxhash64(id, 7), {groups})) AS grp",
        "pmod(xxhash64(id, 11), 200000) AS user_id",
        "pmod(xxhash64(id, 13), 100000) / 100.0 AS value",
    )


def _docs(spark, n, groups=8):
    # text length 20..320 words, skewed: a few giants, many small
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat('s', pmod(xxhash64(id, 3), {groups})) AS source",
        "repeat('w ', 20 + cast(pmod(xxhash64(id, 5), 1000) *"
        " pmod(xxhash64(id, 5), 1000) / 3333 as int)) AS text",
    )


def probe_cms(spark):
    from vectorsearchutil_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )

    toks = _tokens(spark, N_EVENTS).cache()
    toks.count()
    t0 = time.time()
    cms = cms_table(toks, "token").cache()
    cms.count()
    build = time.time() - t0
    probes = toks.select("token").distinct().limit(50)
    t0 = time.time()
    cms_estimate(cms, probes, "token").count()
    est = time.time() - t0
    toks.unpersist(); cms.unpersist()
    return f"build {build:.1f}s, 50-probe estimate {est:.1f}s @ {N_EVENTS} rows"


def probe_kmv(spark):
    from vectorsearchutil_spark.operators.sketches import (
        kmv_overlap_pairs,
        kmv_sketch,
    )

    ev = _events(spark, N_EVENTS).cache()
    ev.count()
    t0 = time.time()
    sk = kmv_sketch(ev, ["grp"], "user_id", k=64).cache()
    sk.count()
    build = time.time() - t0
    t0 = time.time()
    n_pairs = kmv_overlap_pairs(sk, "grp", k=64).count()
    pairs = time.time() - t0
    ev.unpersist(); sk.unpersist()
    return (
        f"sketch {build:.1f}s, {n_pairs} pair estimates {pairs:.1f}s"
        f" @ {N_EVENTS} rows / 40 groups"
    )


def probe_heavy_hitters(spark):
    from vectorsearchutil_spark.operators.sketches import heavy_hitters_exact

    toks = _tokens(spark, N_EVENTS).cache()
    toks.count()
    t0 = time.time()
    n = heavy_hitters_exact(toks, "token", phi=0.001).count()
    zipf = time.time() - t0
    # adversarial: vocabulary-heavy (nearly all-distinct) partitions —
    # the per-partition Counter is the documented memory bound
    wide = spark.range(N_EVENTS).selectExpr(
        "concat('u', id) AS token"
    ).cache()
    wide.count()
    t0 = time.time()
    n2 = heavy_hitters_exact(wide, "token", phi=0.001).count()
    flat = time.time() - t0
    toks.unpersist(); wide.unpersist()
    return (
        f"zipf {zipf:.1f}s ({n} hitters), all-distinct {flat:.1f}s"
        f" ({n2}) @ {N_EVENTS} rows"
    )


def probe_ffd(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        pack_bins_first_fit_decreasing,
    )

    docs = _docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    pack_bins_first_fit_decreasing(docs, capacity=512).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs / 8 groups (~15.6k docs/group)"


def probe_weighted_sample(spark):
    from vectorsearchutil_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    ev = _events(spark, N_EVENTS).withColumn(
        "w", F.col("value") + F.lit(0.01)
    ).cache()
    ev.count()
    t0 = time.time()
    weighted_reservoir_sample(
        ev, k=100, weight_col="w", key_col="user_id", stratum_col="grp"
    ).count()
    dt = time.time() - t0
    ev.unpersist()
    return f"{dt:.1f}s @ {N_EVENTS} rows, k=100 × 40 strata"


def probe_zorder(spark, tmp="/tmp/probe_zorder"):
    import shutil

    from vectorsearchutil_spark.functions.zorder import zorder_by

    ev = _events(spark, N_EVENTS).withColumn(
        "ts", (F.col("user_id") * 7 % 100000).cast("long")
    )
    shutil.rmtree(tmp, ignore_errors=True)
    t0 = time.time()
    zorder_by(
        ev,
        "cast(user_id * 65535 / 200000 as int)",
        "cast(ts * 65535 / 100000 as int)",
        partitions=32,
    ).write.parquet(tmp)
    dt = time.time() - t0
    shutil.rmtree(tmp, ignore_errors=True)
    return f"layout+write {dt:.1f}s @ {N_EVENTS} rows → 32 files"


PROBES = {
    "cms": probe_cms,
    "kmv": probe_kmv,
    "heavy_hitters": probe_heavy_hitters,
    "ffd": probe_ffd,
    "weighted_sample": probe_weighted_sample,
    "zorder": probe_zorder,
}


def main():
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        try:
            print(f"{name}: {fn(spark)}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


# -- round-4 operator probes (appended after the r3-op probes) --------


def probe_dsir(spark):
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.operators.sampling import dsir_importance

    docs = _docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    dsir_importance(docs, F.col("source") == "s0").count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs (~100 tokens/doc)"


def probe_segment_dedup(spark):
    from vectorsearchutil_spark.operators.dedup import segment_dedup

    docs = _docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    segment_dedup(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs"


def probe_outliers(spark):
    from vectorsearchutil_spark.operators.embeddings import centroid_outliers

    emb = spark.range(500_000).selectExpr(
        "id AS vec_id",
        "cast(pmod(xxhash64(id), 16) as int) AS label",
        "transform(sequence(1, 64), j -> pmod(xxhash64(id, j), 1000)"
        " / 1000.0) AS embedding",
    ).cache()
    emb.count()
    t0 = time.time()
    centroid_outliers(emb).count()
    dt = time.time() - t0
    emb.unpersist()
    return f"{dt:.1f}s @ 500k x 64-dim vectors, 16 labels"


def probe_token_entropy(spark):
    from vectorsearchutil_spark.operators.textanalysis import token_entropy

    docs = _docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    token_entropy(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs"


def probe_semdedup(spark):
    from vectorsearchutil_spark.operators.similarity import semdedup

    emb = spark.range(125_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> pmod(xxhash64(id, j), 1000)"
        " / 1000.0) AS embedding",
    ).cache()
    emb.count()
    t0 = time.time()
    semdedup(emb, k=32, iterations=2, threshold=0.95).count()
    dt = time.time() - t0
    emb.unpersist()
    return f"{dt:.1f}s @ 125k x 64-dim, k=32 clusters"


PROBES.update(
    {
        "dsir": probe_dsir,
        "segment_dedup": probe_segment_dedup,
        "outliers": probe_outliers,
        "token_entropy": probe_token_entropy,
        "semdedup": probe_semdedup,
    }
)




# -- round-4b operator probes (this session's additions) --------------


def _varied_docs(spark, n, vocab=2000, avg_tokens=80):
    """Docs whose tokens vary (zipf-ish) — the all-'w' _docs generator
    is useless for LM / PMI / OOV probes."""
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat_ws(' ', transform(sequence(1, 20 + cast(pmod(xxhash64(id), "
        f"{2 * (avg_tokens - 20)}) as int)), "
        f"j -> concat('tok', pmod(xxhash64(id, j), {vocab})))) AS text",
    )


def probe_bigram_logprob(spark):
    from vectorsearchutil_spark.operators.textanalysis import bigram_logprob

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    bigram_logprob(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs, ~80 tok/doc, 2k vocab"


def probe_vocab_oov(spark):
    from vectorsearchutil_spark.operators.textanalysis import vocab_oov_stats

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    vocab_oov_stats(docs, vocab_k=500).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs, top-500 vocab"


def probe_token_pmi(spark):
    from vectorsearchutil_spark.operators.textanalysis import token_pmi_pairs

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    token_pmi_pairs(docs, vocab_k=100, min_support=50).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs, top-100 vocab pair fan-out"


def probe_fuzzy_pairs(spark):
    from vectorsearchutil_spark.operators.fuzzyjoin import fuzzy_pairs_ed1

    # 375k 10-char keys at ~3% density in a 1e7 space -> plenty of
    # one-digit-apart neighbors without a quadratic output
    df = spark.range(375_000).selectExpr(
        "id AS k",
        "concat('u', lpad(cast(pmod(id * 37, 10000000) as string), 9, '0'))"
        " AS s",
    ).cache()
    df.count()
    t0 = time.time()
    n = fuzzy_pairs_ed1(df, "k", "s").count()
    dt = time.time() - t0
    df.unpersist()
    return f"{dt:.1f}s @ 375k strings -> {n} ed<=1 pairs"


def probe_pagerank(spark):
    from vectorsearchutil_spark.operators.graph import pagerank_over_pairs

    pairs = spark.range(2_000_000).selectExpr(
        "pmod(xxhash64(id, 1), 200000) AS id_a",
        "200000 + pmod(xxhash64(id, 2), 200000) AS id_b",
    ).cache()
    pairs.count()
    t0 = time.time()
    pagerank_over_pairs(pairs, iters=3).count()
    dt = time.time() - t0
    pairs.unpersist()
    return f"{dt:.1f}s @ 2M edges / 400k nodes, 3 iterations"


def probe_markov(spark):
    from pyspark.sql import Window

    ev = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 200000) AS user_id",
        "timestamp '2024-01-01' + make_interval(0,0,0,0,0,0, id % 86400)"
        " AS ts",
        "concat('t', pmod(xxhash64(id, 5), 12)) AS event_type",
    ).cache()
    ev.count()
    t0 = time.time()
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    nxt.groupBy("from_type", "to_type").count().count()
    dt = time.time() - t0
    ev.unpersist()
    return f"{dt:.1f}s @ {N_EVENTS} events, 200k users, 12 types"


PROBES.update(
    {
        "bigram_logprob": probe_bigram_logprob,
        "vocab_oov": probe_vocab_oov,
        "token_pmi": probe_token_pmi,
        "fuzzy_pairs": probe_fuzzy_pairs,
        "pagerank": probe_pagerank,
        "markov": probe_markov,
    }
)




# -- round-4b wave-2 probes -------------------------------------------


def probe_concurrency(spark):
    from vectorsearchutil_spark.operators.intervals import concurrency_by_day

    iv = spark.range(2_500_000).selectExpr(
        "timestamp '2024-01-01' + make_interval(0,0,0,0,0,0,"
        " pmod(xxhash64(id, 1), 2592000)) AS start_ts",
    ).selectExpr(
        "start_ts",
        "start_ts + make_interval(0,0,0,0,0,0,"
        " 60 + pmod(xxhash64(start_ts), 7200)) AS end_ts",
    ).cache()
    iv.count()
    t0 = time.time()
    concurrency_by_day(iv).count()
    dt = time.time() - t0
    iv.unpersist()
    return f"{dt:.1f}s @ 2.5M intervals over 30 days"


def probe_snapshot_diff(spark):
    from vectorsearchutil_spark.operators.diffing import corpus_diff

    docs = _docs(spark, N_DOCS).cache()
    docs.count()
    old = docs.filter("doc_id % 10 != 0")
    new = docs.filter("doc_id % 10 != 3").selectExpr(
        "doc_id", "source",
        "IF(doc_id % 7 = 0, reverse(text), text) AS text",
    )
    t0 = time.time()
    corpus_diff(old, new, compare_cols=["text", "source"]).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2 x {N_DOCS}-doc snapshots"


def probe_cdc(spark):
    from vectorsearchutil_spark.operators.cdc import cdc_apply

    snap = spark.range(2_500_000).selectExpr(
        "id", "concat('n', id) AS name",
        "pmod(xxhash64(id), 1000) / 10.0 AS bal",
    ).cache()
    changes = spark.range(250_000).selectExpr(
        "pmod(xxhash64(id, 3), 2600000) AS id",
        "id AS seq",
        "IF(id % 5 = 0, 'delete', 'upsert') AS op",
        "concat('m', id) AS name",
        "id / 7.0 AS bal",
    ).cache()
    snap.count(); changes.count()
    t0 = time.time()
    cdc_apply(snap, changes, "id").count()
    dt = time.time() - t0
    snap.unpersist(); changes.unpersist()
    return f"{dt:.1f}s @ 2.5M snapshot + 250k changelog"


def probe_ahash(spark):
    from vectorsearchutil_spark.operators.multimodal import (
        image_ahash,
        synthesize_binary,
    )

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    image_ahash(synthesize_binary(docs)).select("doc_id", "ahash").count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} synthesized images"


PROBES.update(
    {
        "concurrency": probe_concurrency,
        "snapshot_diff": probe_snapshot_diff,
        "cdc": probe_cdc,
        "ahash": probe_ahash,
    }
)




def probe_ahash_neardup(spark):
    from vectorsearchutil_spark.operators.multimodal import (
        ahash_neardup_pairs,
        image_ahash,
        synthesize_binary,
    )

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    h = image_ahash(synthesize_binary(docs)).select("doc_id", "ahash")
    t0 = time.time()
    # 16-bit bands at this scale: 8-bit buckets would hold ~500
    # rows each (quadratic candidates); radius 3 keeps buckets ~2
    n = ahash_neardup_pairs(h, max_hamming=3, n_bands=4).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} images -> {n} pairs (radius 3, 4 bands)"


PROBES.update({"ahash_neardup": probe_ahash_neardup})


# -- round-4 session-3 probes: the newest queries read real table
# layouts, so each probe synthesizes a 25×-sf0.1 copy of exactly the
# table its registered query function loads and invokes the query
# unmodified — the probe times the SHIPPED plan, not a re-derivation.


def _probe_query(spark, name, table, df, warm_limit=2_000):
    """Write `df` as `/tmp/probe25_<name>/<table>.parquet`, warm the
    query's codegen on a small slice dir, then time the full run."""
    import shutil

    from vectorsearchutil_spark import queries as Q

    base = f"/tmp/probe25_{name}"
    shutil.rmtree(base, ignore_errors=True)
    warm = f"{base}_warm"
    shutil.rmtree(warm, ignore_errors=True)
    df.write.parquet(f"{base}/{table}.parquet")
    df.limit(warm_limit).write.parquet(f"{warm}/{table}.parquet")
    Q.QUERIES[name](spark, warm).count()
    # min-of-2, same convention as bench.py: the first full run still
    # pays one-time codegen/worker tails the warm slice didn't cover
    best, n = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        n = Q.QUERIES[name](spark, base).count()
        best = min(best, time.time() - t0)
    return best, n


def probe_weighted_median(spark):
    li = spark.range(15_000_000).selectExpr(
        "id AS l_orderkey",
        "cast(pmod(id, 7) AS INT) AS l_linenumber",
        "cast(1 + pmod(xxhash64(id, 3), 50) AS DOUBLE) AS l_quantity",
        "pmod(xxhash64(id, 5), 9000000) / 100.0 + 900.0"
        " AS l_extendedprice",
        "element_at(array('A','N','R'),"
        " cast(pmod(xxhash64(id, 7), 3) AS INT) + 1) AS l_returnflag",
    )
    dt, n = _probe_query(
        spark, "lineitem_weighted_median", "lineitem", li
    )
    return f"{dt:.1f}s @ 15M lines -> {n} groups"


def probe_neyman(spark):
    o = spark.range(3_750_000).selectExpr(
        "id AS o_orderkey",
        "concat(cast(1 + pmod(xxhash64(id, 3), 5) AS STRING), '-PRI')"
        " AS o_orderpriority",
        # heavy-tailed price: variance differs sharply by stratum, so
        # the allocation is non-uniform (the interesting case)
        "pmod(xxhash64(id, 5), 10000) / 100.0 *"
        " (1 + pmod(xxhash64(id, 3), 5)) AS o_totalprice",
    )
    dt, n = _probe_query(spark, "orders_neyman_sample", "orders", o)
    return f"{dt:.1f}s @ 3.75M orders -> {n} sampled"


def probe_attribution(spark):
    e = spark.range(2_500_000).selectExpr(
        "id AS event_id",
        "timestamp '2024-01-01' + make_interval(0,0,0,0,0,0,"
        " pmod(xxhash64(id, 1), 2592000)) AS ts",
        "pmod(xxhash64(id, 11), 200000) AS user_id",
        "element_at(array('view','click','purchase','scroll'),"
        " cast(pmod(xxhash64(id, 13), 4) AS INT) + 1) AS event_type",
        "pmod(xxhash64(id, 17), 10000) / 100.0 AS value",
        "'{}' AS props",
    )
    dt, n = _probe_query(spark, "events_attribution", "events", e)
    return f"{dt:.1f}s @ 2.5M events -> {n} purchases"


def probe_dim_covariance(spark):
    emb = spark.range(50_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i),"
        " 2000) / 1000.0 - 1.0 AS FLOAT)) AS embedding",
        "cast(pmod(xxhash64(id, 9), 8) AS INT) AS label",
    )
    dt, n = _probe_query(
        spark, "embeddings_dim_covariance", "embeddings", emb
    )
    return f"{dt:.1f}s @ 50k x 64-dim -> {n} cov cells"


def probe_logreg(spark):
    emb = spark.range(50_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i),"
        " 2000) / 1000.0 - 1.0 AS FLOAT)) AS embedding",
        "cast(pmod(xxhash64(id, 9), 8) AS INT) AS label",
    )
    dt, n = _probe_query(
        spark, "embeddings_logreg_train", "embeddings", emb
    )
    return f"{dt:.1f}s @ 50k x 64-dim, 3 GD iterations -> {n} weights"


PROBES.update(
    {
        "weighted_median": probe_weighted_median,
        "neyman": probe_neyman,
        "attribution": probe_attribution,
        "dim_covariance": probe_dim_covariance,
        "logreg": probe_logreg,
    }
)




def probe_random_projection(spark):
    emb = spark.range(50_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i),"
        " 2000) / 1000.0 - 1.0 AS FLOAT)) AS embedding",
        "cast(pmod(xxhash64(id, 9), 8) AS INT) AS label",
    )
    dt, n = _probe_query(
        spark, "embeddings_random_projection", "embeddings", emb
    )
    return f"{dt:.1f}s @ 50k x 64 -> 16 dims ({n} coords)"


PROBES.update({"random_projection": probe_random_projection})




def probe_duplicate_spans(spark):
    from vectorsearchutil_spark.operators.dedup import duplicate_spans

    # 10% of docs carry a 40-token block shared with exactly ONE
    # partner doc (6.25k disjoint pairs) — bounded-frequency
    # duplication, the regime max_df declares. (A block shared by
    # thousands of docs is stop content: with the default max_df=50
    # it is dropped before the join; an earlier probe that disabled
    # the cap produced 19.5M pairs / 645M match rows in 125 s —
    # quadratic by construction, which is WHY the cap exists.)
    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        "concat("
        " concat_ws(' ', transform(sequence(1, 20 +"
        "   cast(pmod(xxhash64(id, 5), 60) AS INT)),"
        "   i -> concat('u', id, '_', i))),"
        " IF(id % 10 < 2,"
        "    concat(' ', concat_ws(' ', transform(sequence(1, 40),"
        "      i -> concat('blk', id div 10, '_', i)))), ''),"
        " ' ', concat_ws(' ', transform(sequence(1, 20),"
        "   i -> concat('v', id, '_', i)))"
        ") AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    n = duplicate_spans(docs, width=8, min_span=12).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} duplicate-span pairs"


PROBES.update({"duplicate_spans": probe_duplicate_spans})


# -- round-4 session-3 wave 2: query-level probes over synthesized
# 25x tables (same _probe_query mechanics)


def _events25(spark):
    return spark.range(2_500_000).selectExpr(
        "id AS event_id",
        "timestamp '2024-01-01' + make_interval(0,0,0,0,0,0,"
        " pmod(xxhash64(id, 1), 2592000)) AS ts",
        "pmod(xxhash64(id, 11), 200000) AS user_id",
        "element_at(array('view','click','purchase','scroll','buy2'),"
        " cast(pmod(xxhash64(id, 13), 5) AS INT) + 1) AS event_type",
        "pmod(xxhash64(id, 17), 10000) / 100.0 AS value",
        "'{}' AS props",
    )


def _docs25(spark):
    return spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        "concat('src', pmod(xxhash64(id, 3), 20)) AS source",
        "concat_ws(' ', transform(sequence(1, 20 +"
        " cast(pmod(xxhash64(id, 5), 160) AS INT)),"
        " i -> concat('w', pmod(xxhash64(id, i), 5000)))) AS text",
    )


def probe_winsorize(spark):
    dt, n = _probe_query(
        spark, "events_value_winsorized", "events", _events25(spark)
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} rows"


def probe_basket(spark):
    dt, n = _probe_query(
        spark, "events_basket_lift", "events", _events25(spark)
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} type pairs"


def probe_mad(spark):
    dt, n = _probe_query(
        spark, "events_value_mad_outliers", "events", _events25(spark)
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} outliers"


def probe_trend(spark):
    dt, n = _probe_query(
        spark, "events_trend_by_type", "events", _events25(spark)
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} groups"


def probe_diversity(spark):
    dt, n = _probe_query(
        spark, "docs_ngram_diversity", "documents", _docs25(spark)
    )
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} sources"


def probe_calibrated(spark):
    dt, n = _probe_query(
        spark, "docs_calibrated_quality", "documents", _docs25(spark)
    )
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} rows"


def probe_pareto(spark):
    dt, n = _probe_query(
        spark, "docs_pareto_frontier", "documents", _docs25(spark)
    )
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} frontier docs"


def probe_unimax(spark):
    dt, n = _probe_query(
        spark, "docs_unimax_allocation", "documents", _docs25(spark)
    )
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} sources"


def probe_drift_psi(spark):
    emb = spark.range(50_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i),"
        " 2000) / 1000.0 - 1.0 AS FLOAT)) AS embedding",
        "cast(pmod(xxhash64(id, 9), 8) AS INT) AS label",
    )
    dt, n = _probe_query(
        spark, "embeddings_dim_drift_psi", "embeddings", emb
    )
    return f"{dt:.1f}s @ 50k x 64 -> {n} dims"


PROBES.update(
    {
        "winsorize": probe_winsorize,
        "basket": probe_basket,
        "mad": probe_mad,
        "trend": probe_trend,
        "diversity": probe_diversity,
        "calibrated": probe_calibrated,
        "pareto": probe_pareto,
        "unimax": probe_unimax,
        "drift_psi": probe_drift_psi,
    }
)


def probe_seasonality(spark):
    dt, n = _probe_query(
        spark, "events_seasonality", "events", _events25(spark)
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} cells"


def probe_running_distinct(spark):
    dt, n = _probe_query(
        spark, "events_running_distinct_hll", "events", _events25(spark)
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} days"


PROBES.update(
    {
        "seasonality": probe_seasonality,
        "running_distinct": probe_running_distinct,
    }
)


def probe_overlap_join(spark):
    ev = spark.range(2_500_000).selectExpr(
        "id AS event_id",
        "timestamp '2024-01-01' + make_interval(0,0,0,0,0,0,"
        " pmod(xxhash64(id, 1), 2592000)) AS ts",
        "pmod(xxhash64(id, 11), 200000) AS user_id",
        "element_at(array('view','click','purchase','scroll','error'),"
        " cast(pmod(xxhash64(id, 13), 5) AS INT) + 1) AS event_type",
        "pmod(xxhash64(id, 17), 10000) / 100.0 AS value",
        "'{}' AS props",
    )
    dt, n = _probe_query(
        spark, "events_incident_overlap_join", "events", ev
    )
    return f"{dt:.1f}s @ 2.5M events -> {n} session-incident pairs"


PROBES.update({"overlap_join": probe_overlap_join})


def probe_binary_rerank(spark):
    emb = spark.range(500_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i),"
        " 2000) / 1000.0 - 1.0 AS FLOAT)) AS embedding",
        "cast(pmod(xxhash64(id, 9), 8) AS INT) AS label",
    )
    dt, n = _probe_query(
        spark, "knn_binary_rerank", "embeddings", emb
    )
    return f"{dt:.1f}s @ 500k x 64 (1-bit codes + rerank) -> {n} hits"


def probe_gopher(spark):
    dt, n = _probe_query(
        spark, "text_gopher_repetition", "documents", _docs25(spark)
    )
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} rows"


PROBES.update(
    {"binary_rerank": probe_binary_rerank, "gopher": probe_gopher}
)


def probe_token_budget(spark):
    # TWO sources only — the dominant-source skew case the two-level
    # prefix sum exists for (one window per source would serialize
    # ~1.25M narrow rows through a single task)
    from vectorsearchutil_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.range(N_DOCS * 20).selectExpr(
        "id AS doc_id",
        "IF(id % 20 = 0, 'small', 'big') AS source",
        "repeat('w ', 10 + cast(pmod(xxhash64(id, 5), 90) AS INT))"
        " AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    n = token_budget_sample(
        docs, {"big": 40_000_000, "small": 2_000_000}
    ).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2.5M docs / 2 sources -> {n} admitted"


PROBES.update({"token_budget": probe_token_budget})


def probe_deciles(spark):
    cust = spark.range(3_750_000).selectExpr(
        "id AS c_custkey",
        "concat('c', id) AS c_name",
        "cast(pmod(xxhash64(id, 3), 25) AS INT) AS c_nationkey",
        # heavy ties: only 1.1M distinct cent values, like real money
        "pmod(xxhash64(id, 5), 1100000) / 100.0 - 999.0 AS c_acctbal",
    )
    dt, n = _probe_query(
        spark, "customers_acctbal_deciles", "customer", cust
    )
    return f"{dt:.1f}s @ 3.75M customers -> {n} rows"


PROBES.update({"deciles": probe_deciles})


def probe_scrub_spans(spark):
    from vectorsearchutil_spark.operators.dedup import (
        scrub_duplicate_spans,
    )

    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        "concat("
        " concat_ws(' ', transform(sequence(1, 20 +"
        "   cast(pmod(xxhash64(id, 5), 60) AS INT)),"
        "   i -> concat('u', id, '_', i))),"
        " IF(id % 10 < 2,"
        "    concat(' ', concat_ws(' ', transform(sequence(1, 40),"
        "      i -> concat('blk', id div 10, '_', i)))), ''),"
        " ' ', concat_ws(' ', transform(sequence(1, 20),"
        "   i -> concat('v', id, '_', i)))"
        ") AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    out = scrub_duplicate_spans(docs, width=8, min_span=12)
    from pyspark.sql import functions as F
    removed = out.agg(F.sum("n_removed_tokens")).first()[0]
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs -> {removed} tokens scrubbed"


PROBES.update({"scrub_spans": probe_scrub_spans})


def probe_tfidf_cosine(spark):
    from vectorsearchutil_spark.operators.fuzzyjoin import (
        tfidf_cosine_pairs,
    )

    # per-doc unique filler (df=1) + a 40-token block shared by
    # exactly one partner (df=2) — every token survives the df cap,
    # and 12.5k REORDERED near-dup pairs are planted (the partner
    # shuffles its block: cosine ignores order)
    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        "concat("
        " concat_ws(' ', transform(sequence(1, 20),"
        "   i -> concat('u', id, '_', i))),"
        " IF(id % 10 < 2,"
        "    concat(' ', concat_ws(' ', transform(sequence(1, 40),"
        "      i -> concat('blk', id div 10, '_',"
        "      IF(id % 10 = 0, i, 41 - i))))), ''),"
        " ' ', concat_ws(' ', transform(sequence(1, 10),"
        "   i -> concat('v', id, '_', i)))"
        ") AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    n = tfidf_cosine_pairs(docs, threshold=0.3, max_df=50).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ {N_DOCS} docs -> {n} reordered near-dup pairs"


PROBES.update({"tfidf_cosine": probe_tfidf_cosine})


if __name__ == "__main__":
    main()
