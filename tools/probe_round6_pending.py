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


# ---- wave 3 (blocklist .. RFM) -----------------------------------


def probe_blocklist(spark):
    """2M docs vs a 200-word broadcast blocklist: one narrow
    projection, no join — should run at scan speed."""
    from vectorsearchutil_spark.operators.textanalysis import (
        blocklist_screen,
    )

    docs = _varied_docs(spark, 2_000_000).cache()
    docs.count()
    bad = [f"tok{i}" for i in range(200)]
    t0 = time.time()
    row = blocklist_screen(docs, badwords=bad).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("keep")).cast("int")).alias("dropped"),
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return (
        f"{dt:.1f}s @ 2M docs x 200-word list -> "
        f"{row['n']} rows ({row['dropped']} dropped)"
    )


def probe_norm_dedup(spark):
    """2M docs, every 4th a case/punct variant of a canonical text:
    md5-of-normalized groupBy, same shape as exact dedup."""
    from vectorsearchutil_spark.operators.dedup import (
        normalized_exact_dedup,
    )

    docs = spark.range(2_000_000).selectExpr(
        "id AS doc_id",
        "CASE pmod(id, 4)"
        " WHEN 0 THEN concat('Canon Text, number ', pmod(id, 250000), '!')"
        " WHEN 1 THEN concat('canon  text number ', pmod(id, 250000))"
        " ELSE concat('unique doc ', id) END AS text",
        "'en' AS lang",
        "concat('s', pmod(id, 7)) AS source",
        "length('x') AS n_chars",
    ).cache()
    docs.count()
    t0 = time.time()
    n = normalized_exact_dedup(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2M docs -> {n} survivors"


def probe_zipf(spark):
    """2M docs / 50k vocab: explode -> counts -> top-100 via
    TakeOrderedAndProject; regression over 100 aggregated rows."""
    from vectorsearchutil_spark.operators.textanalysis import zipf_fit

    docs = _varied_docs(spark, 2_000_000, vocab=50_000).cache()
    docs.count()
    t0 = time.time()
    row = zipf_fit(docs, top_n=100).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return (
        f"{dt:.1f}s @ 2M docs, 50k vocab -> slope "
        f"{row['zipf_slope']:.3f}"
    )


def probe_js_divergence(spark):
    """1M docs / 20 sources / 20k vocab: the source x vocab grid is
    400k rows and the pair join is token-equi — never all-pairs on
    raw rows."""
    from vectorsearchutil_spark.operators.textanalysis import (
        js_divergence_by_source,
    )

    docs = _varied_docs(spark, 1_000_000, vocab=20_000).selectExpr(
        "doc_id", "text", "concat('s', pmod(doc_id, 20)) AS source"
    ).cache()
    docs.count()
    t0 = time.time()
    n = js_divergence_by_source(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 1M docs, 20 sources, 20k vocab -> {n} pairs"


def probe_top_terms(spark):
    """2M docs: tf + df aggregations over narrow (doc, token) pairs;
    rank window bounded by per-doc distinct tokens."""
    from vectorsearchutil_spark.operators.textanalysis import (
        top_terms_per_doc,
    )

    docs = _varied_docs(spark, 2_000_000, vocab=50_000).cache()
    docs.count()
    t0 = time.time()
    n = top_terms_per_doc(docs, k=3).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2M docs -> {n} (doc, term) rows"


def probe_langid_confusion(spark):
    """2M labeled docs: projection + one tiny cells aggregate."""
    from vectorsearchutil_spark.operators.textanalysis import (
        langid_confusion,
    )

    docs = _varied_docs(spark, 2_000_000).selectExpr(
        "doc_id", "text",
        "element_at(array('en','de','fr','es'), "
        "cast(pmod(doc_id, 4) as int) + 1) AS lang",
    ).cache()
    docs.count()
    t0 = time.time()
    n = langid_confusion(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 2M labeled docs -> {n} confusion cells"


def probe_rolling_zscore(spark):
    """20M events / 100k users (~200 events each): per-entity ROWS
    frame, state O(window) per task."""
    from vectorsearchutil_spark.operators.analytics import (
        rolling_zscore,
    )

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 100000) AS user_id",
        "timestamp_seconds(1700000000 + id) AS ts",
        "pmod(xxhash64(id, 13), 10000) / 100.0 AS value",
    ).cache()
    e.count()
    t0 = time.time()
    row = rolling_zscore(e).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_anomaly").cast("int")).alias("anom"),
    ).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return (
        f"{dt:.1f}s @ 20M events / 100k users -> "
        f"{row['n']} rows ({row['anom']} anomalies)"
    )


def probe_interarrival(spark):
    """20M events / 100k users / 5 types: lag bounded per entity,
    quantiles by histogram refinement over integer gaps."""
    from vectorsearchutil_spark.operators.analytics import (
        interarrival_quantiles,
    )

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 100000) AS user_id",
        "concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "timestamp_seconds(1700000000 + "
        "pmod(xxhash64(id, 11), 31536000)) AS ts",
    ).cache()
    e.count()
    t0 = time.time()
    n = interarrival_quantiles(e).count()
    dt = time.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events / 100k users / 5 types -> {n} rows"


def probe_yoy(spark):
    """40M orders over 7 years: month grid is <=84 rows after the
    map-side-combinable aggregate; the YoY self-join is broadcast."""
    from vectorsearchutil_spark.operators.analytics import yoy_growth

    o = spark.range(40_000_000).selectExpr(
        "date_add(date'2018-01-01', "
        "cast(pmod(xxhash64(id), 2557) as int)) AS o_orderdate",
        "pmod(xxhash64(id, 5), 100000) / 100.0 AS o_totalprice",
    ).cache()
    o.count()
    t0 = time.time()
    n = yoy_growth(o).count()
    dt = time.time() - t0
    o.unpersist()
    return f"{dt:.1f}s @ 40M orders / 7y -> {n} months"


def probe_rfm(spark):
    """40M orders / 2M customers: one per-customer aggregate, then
    three exact-ntile rankings over distinct-value histograms."""
    from vectorsearchutil_spark.operators.analytics import rfm_scores

    o = spark.range(40_000_000).selectExpr(
        "pmod(xxhash64(id, 3), 2000000) AS o_custkey",
        "date_add(date'2018-01-01', "
        "cast(pmod(xxhash64(id), 2557) as int)) AS o_orderdate",
        "pmod(xxhash64(id, 5), 100000) / 100.0 AS o_totalprice",
    ).cache()
    o.count()
    t0 = time.time()
    n = rfm_scores(o).count()
    dt = time.time() - t0
    o.unpersist()
    return f"{dt:.1f}s @ 40M orders / 2M customers -> {n} rows"


# ---- wave 4 (stats: ab / cusum / benford / gini / km / chi2) -----


def probe_ab_test(spark):
    """20M events / 1M users: one per-user max-flag aggregate, then
    four counters; the md5 arm hash is a narrow projection."""
    from vectorsearchutil_spark.operators.analytics import ab_test_ztest

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 1000000) AS user_id",
        "CASE WHEN pmod(xxhash64(id, 7), 20) = 0 THEN 'purchase'"
        " ELSE 'view' END AS event_type",
    ).cache()
    e.count()
    t0 = time.time()
    r = ab_test_ztest(e).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return (
        f"{dt:.1f}s @ 20M events / 1M users -> z {r['z_score']}"
    )


def probe_cusum(spark):
    """20M events / 5 types / 3650 days: grid is 18k rows; the
    cumulative window never sees raw rows."""
    from vectorsearchutil_spark.operators.analytics import (
        cusum_changepoint,
    )

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "timestamp_seconds(1500000000 + pmod(xxhash64(id, 11), 3650)"
        " * 86400) AS ts",
        "pmod(xxhash64(id, 13), 10000) / 100.0"
        " + CASE WHEN pmod(xxhash64(id, 11), 3650) > 1800"
        " THEN 20.0 ELSE 0.0 END AS value",
    ).cache()
    e.count()
    t0 = time.time()
    n = cusum_changepoint(e).count()
    dt = time.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events / 5 types / 3650 days -> {n} rows"


def probe_benford(spark):
    """40M amounts: digit substring projection + 9-group agg."""
    from vectorsearchutil_spark.operators.analytics import benford_digits

    o = spark.range(40_000_000).selectExpr(
        "exp(pmod(xxhash64(id), 1000) / 100.0) AS o_totalprice"
    ).cache()
    o.count()
    t0 = time.time()
    n = benford_digits(o).count()
    dt = time.time() - t0
    o.unpersist()
    return f"{dt:.1f}s @ 40M amounts -> {n} digits"


def probe_gini(spark):
    """40M orders / 2M customers: per-key agg then the rank-sum over
    the distinct-revenue histogram (~#distinct cents values)."""
    from vectorsearchutil_spark.operators.analytics import (
        gini_coefficient,
    )

    o = spark.range(40_000_000).selectExpr(
        "pmod(xxhash64(id, 3), 2000000) AS o_custkey",
        "pmod(xxhash64(id, 5), 100000) / 100.0 AS o_totalprice",
    ).cache()
    o.count()
    t0 = time.time()
    r = gini_coefficient(o).collect()[0]
    dt = time.time() - t0
    o.unpersist()
    return f"{dt:.1f}s @ 40M orders / 2M customers -> gini {r['gini']}"


def probe_kaplan_meier(spark):
    """20M events / 1M users / 3-year horizon: per-user collapse,
    then the KM curve over <=1100 distinct delay days."""
    from vectorsearchutil_spark.operators.analytics import kaplan_meier

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "pmod(xxhash64(id, 3), 1000000) AS user_id",
        "CASE pmod(xxhash64(id, 7), 40)"
        " WHEN 0 THEN 'signup' WHEN 1 THEN 'purchase'"
        " ELSE 'view' END AS event_type",
        "timestamp_seconds(1500000000 + pmod(xxhash64(id, 11), 1100)"
        " * 86400) AS ts",
    ).cache()
    e.count()
    t0 = time.time()
    n = kaplan_meier(e).count()
    dt = time.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events / 1M users -> {n} curve days"


def probe_token_chi2(spark):
    """1M docs / 4 labels / 20k vocab: presence counts are narrow
    (token, label) pairs; df and label totals join back broadcast."""
    from vectorsearchutil_spark.operators.textanalysis import (
        token_label_chi2,
    )

    docs = _varied_docs(spark, 1_000_000, vocab=20_000).selectExpr(
        "doc_id", "text",
        "element_at(array('en','de','fr','es'), "
        "cast(pmod(doc_id, 4) as int) + 1) AS lang",
    ).cache()
    docs.count()
    t0 = time.time()
    n = token_label_chi2(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 1M docs / 4 labels / 20k vocab -> {n} cells"


def probe_mannwhitney(spark):
    """20M events / ~100k distinct cents: all rank math on the
    histogram; the raw rows see one filter + one groupBy."""
    from vectorsearchutil_spark.operators.analytics import mann_whitney_u

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "CASE WHEN pmod(xxhash64(id, 7), 2) = 0 THEN 'purchase'"
        " ELSE 'view' END AS event_type",
        "(pmod(xxhash64(id, 13), 100000)"
        " + CASE WHEN pmod(xxhash64(id, 7), 2) = 0 THEN 500 ELSE 0 END)"
        " / 100.0 AS value",
    ).cache()
    e.count()
    t0 = time.time()
    r = mann_whitney_u(e).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events, 100k-cent domain -> z {r['z_score']}"


def probe_ks_drift(spark):
    """20M events with a planted second-half level shift."""
    from vectorsearchutil_spark.operators.analytics import ks_two_sample

    e = spark.range(20_000_000).selectExpr(
        "id AS event_id",
        "timestamp_seconds(1700000000 + id) AS ts",
        "(pmod(xxhash64(id, 13), 100000)"
        " + CASE WHEN id >= 10000000 THEN 20000 ELSE 0 END)"
        " / 100.0 AS value",
    ).cache()
    e.count()
    t0 = time.time()
    r = ks_two_sample(e).collect()[0]
    dt = time.time() - t0
    e.unpersist()
    return f"{dt:.1f}s @ 20M events -> KS {r['ks_stat']}"


def probe_daily_acf(spark):
    """40M orders / 7 years: seven broadcast self-joins over the
    <=2557-row daily grid."""
    from vectorsearchutil_spark.operators.analytics import daily_acf

    o = spark.range(40_000_000).selectExpr(
        "date_add(date'2018-01-01', "
        "cast(pmod(xxhash64(id), 2557) as int)) AS o_orderdate",
        "(pmod(xxhash64(id, 5), 100000)"
        " + pmod(cast(datediff(date_add(date'2018-01-01', "
        "cast(pmod(xxhash64(id), 2557) as int)), date'2018-01-01')"
        " as bigint), 7) * 3000) / 100.0 AS o_totalprice",
    ).cache()
    o.count()
    t0 = time.time()
    rows = {r["lag"]: r["acf"] for r in daily_acf(o).collect()}
    dt = time.time() - t0
    o.unpersist()
    return f"{dt:.1f}s @ 40M orders / 7y -> acf(7) {rows[7]}"


PROBES["mannwhitney"] = probe_mannwhitney
PROBES["ks_drift"] = probe_ks_drift
PROBES["daily_acf"] = probe_daily_acf

PROBES["ab_test"] = probe_ab_test
PROBES["cusum"] = probe_cusum
PROBES["benford"] = probe_benford
PROBES["gini"] = probe_gini
PROBES["kaplan_meier"] = probe_kaplan_meier
PROBES["token_chi2"] = probe_token_chi2

PROBES["blocklist"] = probe_blocklist
PROBES["norm_dedup"] = probe_norm_dedup
PROBES["zipf"] = probe_zipf
PROBES["js_divergence"] = probe_js_divergence
PROBES["top_terms"] = probe_top_terms
PROBES["langid_confusion"] = probe_langid_confusion
PROBES["rolling_zscore"] = probe_rolling_zscore
PROBES["interarrival"] = probe_interarrival
PROBES["yoy"] = probe_yoy
PROBES["rfm"] = probe_rfm


def probe_matryoshka(spark):
    """2M x 64-dim vectors through the 64->16 truncation + renorm —
    a pure narrow projection; the probe forces evaluation through an
    aggregate over the computed columns."""
    from vectorsearchutil_spark.operators.embeddings import (
        matryoshka_truncate,
    )

    emb = spark.range(2_000_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " AS DOUBLE) / 500.0 - 1.0) AS embedding",
    )
    t0 = time.time()
    row = matryoshka_truncate(emb, prefix_dim=16).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("retained_frac").alias("mean_ret"),
        F.min(F.element_at("mrl_vec", 1)).alias("probe_elem"),
    ).collect()[0]
    dt = time.time() - t0
    return (
        f"{dt:.1f}s @ 2M x 64 -> 16 dims"
        f" (mean retained {row['mean_ret']:.3f})"
    )


def probe_knn_label_eval(spark):
    """1k holdout queries vs a 500k x 64 corpus (32G candidate cells
    -> the Arrow matrix gate): batch-kNN top-5 + vote + accuracy."""
    from vectorsearchutil_spark.operators.evaluation import (
        knn_label_vote_eval,
    )

    n = 501_000
    emb = spark.range(n).selectExpr(
        "id AS vec_id",
        # clusterable geometry: label centers offset per dimension
        "transform(sequence(1, 64), j -> cast(pmod(id, 8) AS DOUBLE)"
        " + cast(pmod(xxhash64(id, j), 100) AS DOUBLE) / 100.0)"
        " AS embedding",
        "cast(pmod(id, 8) AS INT) AS label",
    ).cache()
    emb.count()
    t0 = time.time()
    out = knn_label_vote_eval(
        emb, F.col("vec_id") % 500 == 0, k=5,
        n_queries=n // 500, n_corpus=n - n // 500,
    ).collect()
    dt = time.time() - t0
    emb.unpersist()
    acc = sum(r["n_correct"] for r in out) / max(
        1, sum(r["n_eval"] for r in out)
    )
    return (
        f"{dt:.1f}s @ 1k queries x 500k corpus x 64d"
        f" (overall acc {acc:.3f})"
    )


def probe_top_pc(spark):
    """2M x 64 covariance + fixed-point power iteration: the
    distributed cost is ONE mapInPandas covariance sweep; the 64x64
    iteration is driver-side integer math."""
    from vectorsearchutil_spark.operators.embeddings import (
        power_iteration_top_pc,
    )

    emb = spark.range(2_000_000).selectExpr(
        "id AS vec_id",
        # dim 1 dominated by a shared low-rank factor
        "transform(sequence(1, 64), j -> CASE WHEN j = 1 THEN"
        " cast(pmod(id, 97) AS DOUBLE)"
        " ELSE cast(pmod(xxhash64(id, j), 19) AS DOUBLE) END)"
        " AS embedding",
    )
    t0 = time.time()
    out = power_iteration_top_pc(emb).collect()
    dt = time.time() - t0
    lead = max(out, key=lambda r: abs(r["loading"]))
    return (
        f"{dt:.1f}s @ 2M x 64 (lead dim {lead['dim']},"
        f" eigenvalue {lead['eigenvalue']:.1f})"
    )


PROBES["matryoshka"] = probe_matryoshka
PROBES["knn_label_eval"] = probe_knn_label_eval
PROBES["top_pc"] = probe_top_pc


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round6-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
