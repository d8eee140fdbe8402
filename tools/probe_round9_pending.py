"""25x-scale probes for the round-9 staging wave (triangle census,
ordered funnel, dup-cluster-aware split leakage, semi-hard triplet
mining, audience overlap). Same discipline as
probe_round8_pending.py: synthesize the operator's INPUT at ~25x the
sf0.1 bench scale, time the SHIPPED plan, force evaluation through
computed columns.

Usage: python tools/probe_round9_pending.py [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

PROBES = {}


def _events(spark, n=25_000_000, users=500_000):
    types = "('view'),('click'),('purchase'),('signup'),('error')"
    return spark.range(n).selectExpr(
        "id AS event_id",
        "cast(timestamp_micros(cast(1704067200000000 + "
        "pmod(xxhash64(id), 5184000) * 1000000 as bigint))"
        " as timestamp_ntz) AS ts",
        f"pmod(xxhash64(id, 1), {users}) AS user_id",
        "element_at(array('view','click','purchase','signup','error'),"
        " cast(pmod(xxhash64(id, 2), 5) as int) + 1) AS event_type",
    )


def probe_triangles(spark):
    """Two regimes. (a) 20M random edges / 2M nodes (avg degree 20):
    the wedge join is the cost, bounded by degree-ordered
    orientation. (b) hub-degeneracy: 5M edges where one endpoint
    concentrates on 100 hubs (deg ~50k) — a naive low-id orientation
    would generate ~50k^2 wedges PER HUB (125G pairs); the
    degree-ordered orientation keeps hub out-degrees tiny, so the
    probe finishing at all is the point."""
    from vectorsearchutil_spark.operators.graph import triangle_count

    e1 = spark.range(20_000_000).selectExpr(
        "pmod(xxhash64(id), 2000000) AS x",
        "pmod(xxhash64(id, 1), 2000000) AS y",
    ).filter("x != y").selectExpr(
        "least(x, y) AS id_a", "greatest(x, y) AS id_b"
    ).distinct().cache()
    e1.count()
    t0 = time.time()
    r1 = triangle_count(e1).collect()[0]
    dt1 = time.time() - t0
    e1.unpersist()

    e2 = spark.range(5_000_000).selectExpr(
        "pmod(xxhash64(id), 5000000) + 1000 AS x",
        "pmod(xxhash64(id, 1), 100) AS y",
    ).filter("x != y").selectExpr(
        "least(x, y) AS id_a", "greatest(x, y) AS id_b"
    ).distinct().cache()
    e2.count()
    t0 = time.time()
    r2 = triangle_count(e2).collect()[0]
    dt2 = time.time() - t0
    e2.unpersist()
    return (
        f"random {dt1:.1f}s @ {r1.n_edges} edges -> {r1.n_triangles} tri;"
        f" hub-heavy {dt2:.1f}s @ {r2.n_edges} edges"
        f" ({r2.n_wedges} wedges) -> {r2.n_triangles} tri"
    )


def probe_funnel(spark):
    """25M events / 500k users: three narrow per-user aggregates."""
    from vectorsearchutil_spark.queries_pending import funnel_conversion

    ev = _events(spark).cache()
    ev.count()
    t0 = time.time()
    rows = funnel_conversion(
        ev, ("view", "click", "purchase")
    ).collect()
    dt = time.time() - t0
    ev.unpersist()
    u = {r.step: r.users for r in rows}
    return f"{dt:.1f}s @ 25M events -> funnel {u[1]}/{u[2]}/{u[3]}"


def probe_split_leakage(spark):
    """50M docs, 2M of them in 400k near-dup clusters: the split is a
    narrow hash filter; the only joins are doc->component (dup
    members only) and the per-cluster spread re-join."""
    from vectorsearchutil_spark.queries_pending import split_leakage

    docs = spark.range(50_000_000).selectExpr("id AS doc_id")
    # component ids are member-shaped (multiples of 17) so they can't
    # collide with singleton doc ids — the real CC contract (component
    # = min member id)
    comp = spark.range(2_000_000).selectExpr(
        "id * 17 AS doc_id",  # spread members across the id space
        "pmod(xxhash64(id), 400000) * 17 AS component",
    )
    t0 = time.time()
    out = split_leakage(docs, comp).collect()
    dt = time.time() - t0
    total = sum(r.n_docs for r in out)
    leaked = sum(r.naive_leaked_docs for r in out)
    return f"{dt:.1f}s @ 50M docs / 2M clustered -> {total} split, {leaked} naive-leaked"


def probe_triplet(spark):
    """2M x 64-dim x 32 anchors = 4.1G cells: the auto gate must take
    the matrix path (the expr HOF form runs ~20M cells/s -> ~3-4
    minutes; BLAS partials finish in seconds)."""
    from vectorsearchutil_spark.operators.similarity import triplet_mining

    emb = spark.range(2_000_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as float) / 1000.0) AS embedding",
        "cast(pmod(id, 10) as int) AS label",
    )
    t0 = time.time()
    out = triplet_mining(emb, n_rows=2_000_000).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_semihard").alias("s"),
    ).collect()[0]
    dt = time.time() - t0
    return f"{dt:.1f}s @ 2M x 64-dim (matrix path) -> {out['n']} anchors, {out['s']} semi-hard"


def probe_audience(spark):
    """25M events: one (user, type) distinct + <=T^2-per-user fanout."""
    from vectorsearchutil_spark.queries_pending import audience_overlap

    ev = _events(spark)
    t0 = time.time()
    out = audience_overlap(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_both").alias("s")
    ).collect()[0]
    dt = time.time() - t0
    return f"{dt:.1f}s @ 25M events -> {out['n']} type pairs"


def probe_recall_curve(spark):
    """2M x 64-dim corpus, 32 IVF lists, 8 queries: the exact
    ground-truth arm dominates (8 x 2M x 64 = 1G cells — 53.7 s
    interpreted; the n_rows gate routes it through knn_batch_matrix's
    BLAS path); the three probe arms prune by list id before any
    distance."""
    from vectorsearchutil_spark.queries_pending import recall_curve

    emb = spark.range(2_000_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as double) / 1000.0) AS embedding",
    ).cache()
    emb.count()
    cents = spark.range(32).selectExpr(
        "id AS centroid_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j + 99),"
        " 1000) as double) / 1000.0) AS centroid_vec",
    )
    t0 = time.time()
    out = recall_curve(emb, cents, n_rows=2_000_000).collect()
    dt = time.time() - t0
    emb.unpersist()
    r = {x.nprobe: x for x in out}
    return (
        f"{dt:.1f}s @ 2M x 64 / 32 lists -> recall"
        f" {r[1].recall}/{r[2].recall}/{r[3].recall}, scanned_frac"
        f" {r[1].scanned_frac}/{r[2].scanned_frac}/{r[3].scanned_frac}"
    )


def probe_conformal(spark):
    """100M orders over a 10-year grid: ONE narrow daily aggregate,
    then every window runs on the ~3,650-row day grid."""
    from vectorsearchutil_spark.operators.analytics import (
        conformal_coverage_daily,
    )

    orders = spark.range(100_000_000).selectExpr(
        "id AS o_orderkey",
        "timestamp_micros(cast(1500000000000000 + "
        "pmod(xxhash64(id), 315360000) * 1000000 as bigint)) AS o_orderdate",
        "cast(pmod(xxhash64(id, 3), 100000) as double) / 100.0"
        " AS o_totalprice",
    )
    t0 = time.time()
    r = conformal_coverage_daily(orders).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ 100M orders / 10y grid -> cal {r.n_calibration},"
        f" eval {r.n_eval}, coverage {r.coverage}"
    )


def probe_mutual_knn(spark):
    """50k x 64-dim exact mutual-kNN through the gated Arrow path —
    same shape as the hubness probe; the mutual self-join adds only
    n*k-row work on top of the scoring."""
    from vectorsearchutil_spark.operators.knn import knn_mutual_pairs

    emb = spark.range(50_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as double) / 1000.0) AS embedding",
    )
    t0 = time.time()
    r = knn_mutual_pairs(
        emb, k=10, vector_col="embedding", id_col="vec_id",
        metric="cosine", n_rows=50_000,
    ).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ 50k x 64 (Arrow path) -> {r.n_mutual_pairs} mutual"
        f" pairs, reciprocity {r.reciprocity}"
    )


PROBES["triangles"] = probe_triangles
PROBES["mutual_knn"] = probe_mutual_knn
PROBES["conformal"] = probe_conformal
PROBES["recall_curve"] = probe_recall_curve
PROBES["funnel"] = probe_funnel
PROBES["split_leakage"] = probe_split_leakage
PROBES["triplet"] = probe_triplet
PROBES["audience"] = probe_audience


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round9-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
