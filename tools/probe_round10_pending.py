"""25x-scale probes for the round-10 staging wave (Nelson-Aalen,
Mann-Kendall + BH-FDR, EWMA forecast, DAU/MAU stickiness,
diff-in-diff, trigram stupid backoff, template clusters, LOO source
influence, quality ECE, price elasticity). Same discipline as
probe_round9_pending.py: synthesize the operator's INPUT at ~25x the
sf0.1 bench scale, time the SHIPPED plan.

Usage: python tools/probe_round10_pending.py [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

PROBES = {}


def _events(spark, n=2_500_000, users=50_000, days=400):
    """25x the sf0.1 events table (100k rows), 400-day span so the
    day-grid operators see a full-size calendar."""
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
    """25x the sf0.1 documents table (5k rows), ~200 tokens each,
    Zipf-ish vocab so n-gram tables are realistic."""
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


def probe_survival(spark):
    """NA + MK share the bounded-histogram posture: cost is the
    per-user/day collapse, everything after is calendar-sized."""
    from vectorsearchutil_spark.operators.analytics import nelson_aalen

    e = _events(spark)
    t0 = time.time()
    n = nelson_aalen(e).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 2.5M events -> {n} hazard rows"


def probe_mann_kendall_fdr(spark):
    from vectorsearchutil_spark.operators.analytics import fdr_bh_trend

    e = _events(spark)
    t0 = time.time()
    rows = fdr_bh_trend(e).collect()
    dt = time.time() - t0
    rej = sum(1 for r in rows if r.rejected)
    return (
        f"{dt:.1f}s @ 2.5M events / 400-day grid (O(d^2) pairs ="
        f" {400 * 399 // 2}/type on the aggregate) -> {len(rows)} tests,"
        f" {rej} rejected"
    )


def probe_ewma(spark):
    from vectorsearchutil_spark.operators.analytics import (
        ewma_forecast_daily,
    )

    e = _events(spark)
    t0 = time.time()
    n = ewma_forecast_daily(e).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 2.5M events, 400-day refolds per type -> {n} rows"


def probe_dau_mau(spark):
    from vectorsearchutil_spark.operators.analytics import (
        dau_mau_stickiness,
    )

    e = _events(spark)
    t0 = time.time()
    n = dau_mau_stickiness(e).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 2.5M events / 50k users -> {n} day rows"


def probe_did(spark):
    from vectorsearchutil_spark.operators.analytics import diff_in_diff

    e = _events(spark)
    t0 = time.time()
    r = diff_in_diff(e).collect()[0]
    dt = time.time() - t0
    return f"{dt:.1f}s @ 2.5M events -> did {r.did_estimate}"


def probe_trigram(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        trigram_stupid_backoff,
    )

    d = _docs(spark)
    t0 = time.time()
    n = trigram_stupid_backoff(d).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 125k docs x 200 toks (25M positions) -> {n} rows"


def probe_template(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        template_clusters,
    )

    d = _docs(spark)
    t0 = time.time()
    n = template_clusters(d).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 125k docs -> {n} clusters"


def probe_loo_ece(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        loo_source_influence,
        quality_ece,
    )

    d = _docs(spark)
    t0 = time.time()
    n1 = loo_source_influence(d).count()
    n2 = quality_ece(d).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 125k docs -> {n1} sources + {n2} bins"


def probe_elasticity(spark):
    from vectorsearchutil_spark.operators.analytics import price_elasticity

    li = spark.range(15_000_000).selectExpr(
        "id AS l_orderkey",
        "pmod(xxhash64(id), 200000) AS l_partkey",
        "cast(1 + pmod(xxhash64(id, 1), 50) as double) AS l_quantity",
        "cast(1 + pmod(xxhash64(id, 2), 100000) as double) / 10.0"
        " AS l_extendedprice",
    )
    part = spark.range(200_000).selectExpr(
        "id AS p_partkey",
        "concat('Brand#', cast(pmod(xxhash64(id), 25) as string))"
        " AS p_brand",
    )
    t0 = time.time()
    n = price_elasticity(li, part).count()
    dt = time.time() - t0
    return f"{dt:.1f}s @ 15M lineitems x 200k parts -> {n} brands"


PROBES["survival"] = probe_survival
PROBES["mk_fdr"] = probe_mann_kendall_fdr
PROBES["ewma"] = probe_ewma
PROBES["dau_mau"] = probe_dau_mau
PROBES["did"] = probe_did
PROBES["trigram"] = probe_trigram
PROBES["template"] = probe_template
PROBES["loo_ece"] = probe_loo_ece
PROBES["elasticity"] = probe_elasticity


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round10-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
