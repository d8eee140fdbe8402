"""Scale probes for the round-6 PENDING operator wave (25x-bench-ish
synthetic inputs, same warm-run discipline as probe_round4_scale).
Run before promotion so every pending entry lands with a measured
scale story.

Usage: python tools/probe_round6_pending.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from tools.probe_round4_scale import _varied_docs  # noqa: E402


def probe_contamination(spark):
    """500k train docs vs a 5k-doc benchmark split, 8-gram overlap:
    the eval gram set stays broadcast-sized while the train side is
    one shingle pass + map-side join."""
    from vectorsearchutil_spark.operators.textanalysis import (
        benchmark_contamination,
    )

    # planted leak: every 100th train doc copies a benchmark template
    docs = spark.range(505_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 5000 OR pmod(id, 100) = 0 THEN "
        " concat_ws(' ', transform(sequence(1, 60),"
        "   j -> concat('bench', pmod(id, 5000), '_', j)))"
        " ELSE concat_ws(' ', transform(sequence(1, 60),"
        "   j -> concat('tok', pmod(xxhash64(id, j), 50000)))) END"
        " AS text",
    ).cache()
    docs.count()
    train = docs.filter(F.col("doc_id") >= 5_000)
    bench = docs.filter(F.col("doc_id") < 5_000)
    # aggregate over computed columns so Catalyst cannot eliminate
    # the (unique-keyed) left join — a bare count() measures nothing
    t0 = time.time()
    row = benchmark_contamination(train, bench, n=8).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_contaminated") > 0).cast("int")).alias("hits"),
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return (
        f"{dt:.1f}s @ 500k train docs vs 5k bench -> "
        f"{row['n']} rows ({row['hits']} contaminated)"
    )


def probe_keep_best(spark):
    """125k docs with planted exact-dup groups: pairs -> CC -> argmax
    survivor. The planted duplication (every 8th doc repeats one of
    1k templates) gives real multi-member clusters."""
    from vectorsearchutil_spark.operators import dedup as _dd

    docs = spark.range(125_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN pmod(id, 8) = 0 THEN "
        " concat_ws(' ', transform(sequence(1, 40),"
        "   j -> concat('dup', pmod(id, 1000), '_', j)))"
        " ELSE concat_ws(' ', transform(sequence(1, 40),"
        "   j -> concat('tok', pmod(xxhash64(id, j), 50000)))) END AS text",
        "cast(40 + pmod(xxhash64(id, 11), 400) AS BIGINT) AS n_chars",
    ).cache()
    docs.count()
    t0 = time.time()
    pairs = _dd.ngram_jaccard_pairs(
        docs, n=3, threshold=0.8, max_df=200
    ).localCheckpoint()
    n_pairs = pairs.count()
    dt_pairs = time.time() - t0
    t0 = time.time()
    kept = _dd.keep_best_representative(
        docs.select("doc_id", "n_chars"), pairs, "n_chars"
    ).count()
    dt = time.time() - t0
    docs.unpersist()
    return (
        f"pairs {dt_pairs:.1f}s ({n_pairs} pairs) + election {dt:.1f}s "
        f"@ 125k docs -> {kept} survivors"
    )


def probe_truncation(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        truncation_stats,
    )

    docs = _varied_docs(spark, 2_000_000).cache()
    docs.count()
    t0 = time.time()
    truncation_stats(docs, [64, 128, 256]).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2M docs, 3 ctx lengths"


def probe_tdigest(spark):
    """10M values through the 32x64 sketch, vs the exact
    percentile() aggregate on the same data — the constant-state
    trade measured."""
    from vectorsearchutil_spark.operators.sketches import (
        tdigest_centroids,
        tdigest_quantiles,
    )

    e = spark.range(10_000_000).selectExpr(
        "id",
        "pmod(xxhash64(id, 13), 1000000) / 100.0 AS v",
    ).cache()
    e.count()
    t0 = time.time()
    cents = tdigest_centroids(e, "v", "id", n_buckets=32, n_centroids=64)
    ests = {
        r["q"]: r["est"]
        for r in tdigest_quantiles(cents, [0.5, 0.99]).collect()
    }
    dt = time.time() - t0
    t0 = time.time()
    exact = e.agg(
        F.expr("percentile(v, array(0.5, 0.99))").alias("p")
    ).collect()[0]["p"]
    dt_exact = time.time() - t0
    err50 = abs(ests[0.5] - exact[0]) / max(exact[0], 1e-9)
    err99 = abs(ests[0.99] - exact[1]) / max(exact[1], 1e-9)
    e.unpersist()
    return (
        f"{dt:.1f}s sketch vs {dt_exact:.1f}s exact @ 10M rows; "
        f"rel err p50={err50:.4%} p99={err99:.4%}"
    )


def probe_rerank(spark):
    """500 queries x 1000-candidate shortlists (500k pair scores)
    through the grouped-Arrow stub scorer."""
    from vectorsearchutil_spark.operators.reranker import rerank_shortlist

    short = spark.range(500_000).selectExpr(
        "cast(id / 1000 AS LONG) AS query_id",
        "id AS vec_id",
        "pmod(xxhash64(id, 3), 1000) / 1000.0 AS score",
    ).cache()
    short.count()
    t0 = time.time()
    n = rerank_shortlist(short, k=10, id_col="vec_id").count()
    dt = time.time() - t0
    short.unpersist()
    return f"{dt:.1f}s @ 500 queries x 1k candidates -> {n} rows"


def probe_skew_report(spark):
    from vectorsearchutil_spark.functions.skew import skew_report

    e = spark.range(20_000_000).selectExpr(
        "CASE WHEN pmod(id, 2) = 0 THEN 'hot'"
        " ELSE concat('k', pmod(xxhash64(id), 100000)) END AS k",
    ).cache()
    e.count()
    t0 = time.time()
    rows = skew_report(e, "k", top_n=5).collect()
    dt = time.time() - t0
    e.unpersist()
    top = rows[0]
    return (
        f"{dt:.1f}s @ 20M rows, 100k keys -> top key share "
        f"{top['share']:.3f}, salt {top['suggested_salt']}"
    )


PROBES = {
    "contamination": probe_contamination,
    "keep_best": probe_keep_best,
    "truncation": probe_truncation,
    "tdigest": probe_tdigest,
    "rerank": probe_rerank,
    "skew_report": probe_skew_report,
}




def probe_containment(spark):
    """125k docs, planted short-in-long inclusions (every 40th doc is
    a 10-token excerpt of a template)."""
    from vectorsearchutil_spark.operators.dedup import containment_pairs

    docs = spark.range(125_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN pmod(id, 40) = 0 THEN "
        " concat_ws(' ', transform(sequence(5, 14),"
        "   j -> concat('tpl', pmod(id, 500), '_', j)))"
        " WHEN pmod(id, 40) = 1 THEN "
        " concat_ws(' ', transform(sequence(1, 50),"
        "   j -> concat('tpl', pmod(id - 1, 500), '_', j)))"
        " ELSE concat_ws(' ', transform(sequence(1, 40),"
        "   j -> concat('tok', pmod(xxhash64(id, j), 50000)))) END"
        " AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    n = containment_pairs(docs, n=3, threshold=0.9, max_df=200).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 125k docs -> {n} containment pairs"


def probe_hubness(spark):
    """50k x 64-dim exact hubness through the gated Arrow path —
    320G flop-equivalents of dim-at-a-time accumulation."""
    from vectorsearchutil_spark.operators.knn import knn_hubness

    emb = spark.range(50_000).selectExpr(
        "id",
        "transform(sequence(1, 64),"
        " j -> pmod(xxhash64(id, j), 1000) / 1000.0 - 0.5) AS v",
    ).cache()
    emb.count()
    t0 = time.time()
    out = knn_hubness(
        emb, k=10, vector_col="v", id_col="id", metric="cosine",
        n_rows=50_000,
    )
    mx = out.agg(F.max("k_occurrence")).collect()[0][0]
    dt = time.time() - t0
    emb.unpersist()
    return f"{dt:.1f}s @ 50k x 64d (Arrow path), max k-occurrence {mx}"


def probe_fk_audit(spark):
    from vectorsearchutil_spark.operators.integrity import fk_orphan_audit

    child = spark.range(20_000_000).selectExpr(
        "id", "pmod(xxhash64(id, 3), 1100000) AS fk"
    )
    parent = spark.range(1_000_000).selectExpr("id AS pk")
    t0 = time.time()
    row = fk_orphan_audit(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ 20M children vs 1M parents -> "
        f"orphan_rate {row['orphan_rate']}"
    )


PROBES["containment"] = probe_containment
PROBES["hubness"] = probe_hubness
PROBES["fk_audit"] = probe_fk_audit




def probe_pct_rank(spark):
    """20M events / 5 types / ~100k distinct cents: the prefix-sum
    state is bounded by the value domain, so the window never sees
    raw rows."""
    from vectorsearchutil_spark.operators.sketches import (
        percentile_rank_enrich,
    )

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "pmod(xxhash64(id, 13), 100000) / 100.0 AS value",
    ).cache()
    e.count()
    t0 = time.time()
    row = percentile_rank_enrich(
        e, "value", "event_type", "event_id"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.avg("pct_rank").alias("m")
    ).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return (
        f"{dt:.1f}s @ 20M events, 5 types, 100k-cent domain -> "
        f"{row['n']} rows (mean rank {row['m']:.3f})"
    )


PROBES["pct_rank"] = probe_pct_rank


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round6-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
