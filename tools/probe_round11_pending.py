"""25x-scale probes for the round-11 staging wave (log-rank, Poisson
rate test, Holt forecast, Hurst exponent, degree assortativity,
common-neighbour link prediction, term burstiness, rater agreement,
OCR garbage, TwoNN intrinsic dim, dim-split CKA). Same discipline as
probe_round10_pending.py: synthesize the operator's INPUT at ~25x the
sf0.1 bench scale, time the SHIPPED plan.

Usage: python tools/probe_round11_pending.py [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

PROBES = {}


def _events(spark, n=2_500_000, users=50_000, days=400):
    """25x the sf0.1 events table, 400-day span (the round-10 synth)."""
    return spark.range(n).selectExpr(
        "id AS event_id",
        "cast(timestamp_micros(cast(1704067200000000 + "
        f"pmod(xxhash64(id), {days} * 86400) * 1000000 as bigint))"
        " as timestamp_ntz) AS ts",
        f"pmod(xxhash64(id, 1), {users}) AS user_id",
        "element_at(array('view','click','purchase','signup','error'),"
        " cast(pmod(xxhash64(id, 2), 5) as int) + 1) AS event_type",
        "cast(pmod(xxhash64(id, 3), 100000) as double) / 100.0 AS value",
    )


def _docs(spark, n=125_000, toks=200):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"array_join(transform(sequence(1, {toks}), "
        "j -> concat('w', cast(pmod(xxhash64(id, j), "
        "1 + cast(pmod(xxhash64(j), 5000) as int)) as string))), ' ') "
        "AS text",
        "'en' AS lang",
        "concat('src', cast(pmod(xxhash64(id, 99), 20) as string)) "
        "AS source",
        f"cast({toks} * 6 as bigint) AS n_chars",
    )


def _edges(spark, n=500_000, nodes=100_000):
    """Skewed near-dup-graph-shaped edge list: power-law-ish degrees
    via a squared hash draw, self-loops and dup edges removed."""
    e = spark.range(n).selectExpr(
        f"pmod(xxhash64(id), {nodes}) AS x",
        # skew via the product of two bounded draws (317² ≪ 2^63 —
        # a raw xxhash64 product overflows under ANSI)
        "pmod(pmod(xxhash64(id, 7), 317) * pmod(xxhash64(id, 11), 317),"
        f" {nodes}) AS y",
    )
    return (
        e.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
        )
        .distinct()
    )


def probe_logrank(spark):
    from vectorsearchutil_spark.operators.analytics import logrank_test

    t0 = time.time()
    r = logrank_test(_events(spark)).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ 2.5M events / 50k users -> O_A {r.observed_a},"
        f" chi2 {r.chi2}"
    )


def probe_poisson_rate(spark):
    from vectorsearchutil_spark.operators.analytics import (
        poisson_rate_test,
    )

    t0 = time.time()
    n = poisson_rate_test(_events(spark)).count()
    return f"{time.time() - t0:.1f}s @ 2.5M events -> {n} types"


def probe_holt(spark):
    from vectorsearchutil_spark.operators.analytics import (
        holt_forecast_daily,
    )

    t0 = time.time()
    n = holt_forecast_daily(_events(spark)).count()
    return f"{time.time() - t0:.1f}s @ 2.5M events / 400-day grid -> {n}"


def probe_hurst(spark):
    from vectorsearchutil_spark.operators.analytics import (
        hurst_exponent_daily,
    )

    t0 = time.time()
    n = hurst_exponent_daily(_events(spark)).count()
    return f"{time.time() - t0:.1f}s @ 2.5M events / 400-day grid -> {n}"


def probe_assortativity(spark):
    from vectorsearchutil_spark.operators.graph import (
        degree_assortativity,
    )

    t0 = time.time()
    r = degree_assortativity(_edges(spark)).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ {r.n_edges} edges / {r.n_nodes} nodes ->"
        f" r {r.assortativity}"
    )


def probe_link_prediction(spark):
    from vectorsearchutil_spark.operators.graph import (
        common_neighbor_link_prediction,
    )

    t0 = time.time()
    rows = common_neighbor_link_prediction(_edges(spark), k=20).collect()
    dt = time.time() - t0
    top = rows[0].common_neighbors if rows else 0
    return f"{dt:.1f}s @ ~500k skewed edges -> top cn {top}"


def probe_burstiness(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        term_burstiness,
    )

    t0 = time.time()
    n = term_burstiness(_docs(spark)).count()
    return f"{time.time() - t0:.1f}s @ 125k docs x 200 toks -> {n} terms"


def probe_rater_agreement(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        rater_agreement,
    )

    t0 = time.time()
    r = rater_agreement(_docs(spark)).collect()[0]
    return f"{time.time() - t0:.1f}s @ 125k docs -> kappa {r.kappa}"


def probe_ocr_garbage(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        ocr_garbage_score,
    )

    t0 = time.time()
    n = ocr_garbage_score(_docs(spark)).count()
    return f"{time.time() - t0:.1f}s @ 125k docs -> {n} rows"


def probe_twonn_blocked(spark):
    """50k x 64 TwoNN through the blocked (no-collect) path — the
    100 TB posture; auto at this size picks arrow, so force blocked
    to probe the scale plan."""
    from vectorsearchutil_spark.operators.knn import intrinsic_dim_twonn

    emb = spark.range(50_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as double) / 1000.0) AS embedding",
    )
    t0 = time.time()
    r = intrinsic_dim_twonn(
        emb, vector_col="embedding", id_col="vec_id",
        n_rows=50_000, strategy="blocked",
    ).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ 50k x 64 (blocked) -> dim {r.intrinsic_dim},"
        f" used {r.n_used}"
    )


def probe_cka(spark):
    from vectorsearchutil_spark.operators.embeddings import cka_dim_split

    emb = spark.range(125_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as double) / 1000.0) AS embedding",
    )
    t0 = time.time()
    r = cka_dim_split(emb).collect()[0]
    return f"{time.time() - t0:.1f}s @ 125k x 64 -> cka {r.cka}"


PROBES["logrank"] = probe_logrank
PROBES["poisson_rate"] = probe_poisson_rate
PROBES["holt"] = probe_holt
PROBES["hurst"] = probe_hurst
PROBES["assortativity"] = probe_assortativity
PROBES["link_prediction"] = probe_link_prediction
PROBES["burstiness"] = probe_burstiness
PROBES["rater_agreement"] = probe_rater_agreement
PROBES["ocr_garbage"] = probe_ocr_garbage
PROBES["twonn_blocked"] = probe_twonn_blocked
PROBES["cka"] = probe_cka


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round11-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
