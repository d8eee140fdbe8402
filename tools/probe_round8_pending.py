"""25x-scale probes for the round-8 staging wave (queries_pending.py:
Spearman/Kendall daily grids, transition entropy, Fano, boilerplate
prefixes, n-gram novelty, chunk overlap, PQ subspace distortion).
Same discipline as probe_round7_pending.py: synthesize inputs at
~25x the sf0.1 bench scale, time the SHIPPED operator plan, force
evaluation through computed columns.

Usage: python tools/probe_round8_pending.py [probe ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

PROBES = {}


def _events(spark, n=25_000_000, users=50_000, days=60):
    # NTZ timestamps = the engine's canonical read type
    return spark.range(n).selectExpr(
        "id AS event_id",
        f"cast(timestamp_micros(cast(1704067200000000 + "
        f"(pmod(xxhash64(id), {days * 86400}) * 1000000) as bigint))"
        f" as timestamp_ntz) AS ts",
        f"pmod(xxhash64(id, 1), {users}) AS user_id",
        "concat('t', pmod(xxhash64(id, 2), 5)) AS event_type",
        "cast(pmod(xxhash64(id, 3), 10000) as double) / 100.0 AS value",
    )


def probe_rank_stats(spark):
    """25M events -> per-type daily grid (5 x 60 rows); the rank
    windows + pair self-join run on the aggregate only."""
    from vectorsearchutil_spark.operators.analytics import (
        kendall_tau_daily,
        spearman_daily,
    )

    ev = _events(spark).cache()
    ev.count()
    t0 = time.time()
    s = spearman_daily(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("spearman_rho").alias("s")
    ).collect()[0]
    dt1 = time.time() - t0
    t0 = time.time()
    k = kendall_tau_daily(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("tau_b").alias("s")
    ).collect()[0]
    dt2 = time.time() - t0
    ev.unpersist()
    return (
        f"spearman {dt1:.1f}s, kendall {dt2:.1f}s @ 25M events"
        f" -> {s['n']}/{k['n']} types"
    )


def probe_transition_entropy(spark):
    """25M events / 50k users: ONE per-user lead window on narrow
    columns; everything after is the 5x5 transition table."""
    from vectorsearchutil_spark.operators.analytics import transition_entropy

    ev = _events(spark).cache()
    ev.count()
    t0 = time.time()
    out = transition_entropy(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h_bits").alias("h")
    ).collect()[0]
    dt = time.time() - t0
    ev.unpersist()
    return f"{dt:.1f}s @ 25M events / 50k users -> {out['n']} states"


def probe_fano(spark):
    from vectorsearchutil_spark.operators.analytics import fano_daily

    ev = _events(spark).cache()
    ev.count()
    t0 = time.time()
    out = fano_daily(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("fano_factor").alias("s")
    ).collect()[0]
    dt = time.time() - t0
    ev.unpersist()
    return f"{dt:.1f}s @ 25M events -> {out['n']} types"


def _docs(spark, n=1_250_000, toks=60):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "concat('s', pmod(id, 20)) AS source",
        f"concat_ws(' ', transform(sequence(1, {toks}),"
        f" j -> concat('tok', pmod(xxhash64(id, j), 200000)))) AS text",
    )


def probe_boilerplate(spark):
    """1.25M docs: fixed-width prefix aggregate, no text shuffle —
    inject a 30%-share template prefix per source."""
    from vectorsearchutil_spark.operators.textanalysis import (
        boilerplate_prefixes,
    )

    docs = _docs(spark).selectExpr(
        "doc_id",
        "source",
        "CASE WHEN pmod(doc_id, 10) < 3"
        " THEN concat('TEMPLATE_HEADER_COMMON ', text)"
        " ELSE text END AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    out = boilerplate_prefixes(docs).agg(
        F.count(F.lit(1)).alias("n"), F.sum("top_prefix_share").alias("s")
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 1.25M docs -> {out['n']} sources"


def probe_novelty(spark):
    """1.25M docs x ~56 5-grams = 70M shingles: distinct (doc, md5)
    pairs shuffle as 16-byte keys; two aggregates, no pair re-join."""
    from vectorsearchutil_spark.operators.textanalysis import ngram_novelty

    docs = _docs(spark).cache()
    docs.count()
    t0 = time.time()
    out = ngram_novelty(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_novel").alias("nn"),
        F.sum("n_grams").alias("ng"),
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return (
        f"{dt:.1f}s @ 1.25M docs / {out['ng'] / 1e6:.0f}M grams"
        f" ({out['nn'] / 1e6:.1f}M novel)"
    )


def probe_chunk_overlap(spark):
    from vectorsearchutil_spark.operators.textanalysis import (
        chunk_overlap_stats,
    )

    docs = _docs(spark, toks=300).cache()
    docs.count()
    t0 = time.time()
    out = chunk_overlap_stats(docs).agg(
        F.count(F.lit(1)).alias("n"), F.sum("total_chunks").alias("c")
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 1.25M docs x 300 tokens -> {out['c']} chunks"


def probe_pq_distortion(spark):
    """500k x 64 float vectors, m=8 k=16: one broadcast-codebook
    corpus pass + an m-wide explode; value-quantized exact mean."""
    from vectorsearchutil_spark.operators.pq import (
        pq_subspace_distortion,
        pq_train,
    )

    emb = spark.range(500_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as float) / 1000.0) AS embedding",
    ).cache()
    emb.count()
    books = pq_train(emb, m=8, k=16, iterations=2)
    t0 = time.time()
    out = pq_subspace_distortion(emb, books).agg(
        F.count(F.lit(1)).alias("n"), F.sum("mean_sq_err").alias("s")
    ).collect()[0]
    dt = time.time() - t0
    emb.unpersist()
    return f"{dt:.1f}s @ 500k x 64 -> {out['n']} subspaces"


PROBES["rank_stats"] = probe_rank_stats
PROBES["transition_entropy"] = probe_transition_entropy
PROBES["fano"] = probe_fano
PROBES["boilerplate"] = probe_boilerplate
PROBES["novelty"] = probe_novelty
PROBES["chunk_overlap"] = probe_chunk_overlap
PROBES["pq_distortion"] = probe_pq_distortion


def probe_hill(spark):
    """25M events: per-type top-101 via WindowGroupLimit — each task
    keeps 101 candidates before the merge, no full sort."""
    from vectorsearchutil_spark.operators.analytics import hill_tail_index

    ev = _events(spark).cache()
    ev.count()
    t0 = time.time()
    out = hill_tail_index(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("hill").alias("s")
    ).collect()[0]
    dt = time.time() - t0
    ev.unpersist()
    return f"{dt:.1f}s @ 25M events -> {out['n']} types"


def probe_norm_anova(spark):
    from vectorsearchutil_spark.operators.pq import pq_train  # noqa: F401
    from vectorsearchutil_spark.operators.analytics import norm_anova

    emb = spark.range(2_000_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as float) / 1000.0) AS embedding",
        "cast(pmod(id, 10) as int) AS label",
    ).cache()
    emb.count()
    t0 = time.time()
    out = norm_anova(emb).collect()[0]
    dt = time.time() - t0
    emb.unpersist()
    return f"{dt:.1f}s @ 2M x 64 -> F over {out['k_labels']} labels"


def probe_latency_quantiles(spark):
    """40M lineitem x 10M orders join + integer-day histogram
    quantiles; the quantile windows touch only the value domain."""
    from vectorsearchutil_spark.operators.analytics import (
        interpurchase_median,
        ship_delay_quantiles,
    )

    orders = spark.range(10_000_000).selectExpr(
        "id AS o_orderkey",
        "pmod(xxhash64(id), 1500000) AS o_custkey",
        "cast(timestamp_micros(cast(1640995200000000 + pmod(xxhash64(id, 9),"
        " 63072000) * 1000000 as bigint)) as timestamp_ntz) AS o_orderdate",
        "concat('P', pmod(id, 5)) AS o_orderpriority",
    ).cache()
    li = spark.range(40_000_000).selectExpr(
        "pmod(xxhash64(id, 7), 10000000) AS l_orderkey",
        "cast(timestamp_micros(cast(1640995200000000 + pmod(xxhash64(id, 8),"
        " 63072000) * 1000000 as bigint)) as timestamp_ntz) AS l_shipdate",
    ).cache()
    cust = spark.range(1_500_000).selectExpr(
        "id AS c_custkey", "concat('SEG', pmod(id, 5)) AS c_mktsegment"
    ).cache()
    orders.count(); li.count(); cust.count()
    t0 = time.time()
    a = ship_delay_quantiles(orders, li).agg(
        F.count(F.lit(1)).alias("n")).collect()[0]
    dt1 = time.time() - t0
    t0 = time.time()
    b = interpurchase_median(orders, cust).agg(
        F.count(F.lit(1)).alias("n")).collect()[0]
    dt2 = time.time() - t0
    for c in (orders, li, cust):
        c.unpersist()
    return (
        f"ship_delay {dt1:.1f}s @ 40M lineitem, interpurchase {dt2:.1f}s"
        f" @ 10M orders/1.5M customers -> {a['n']}/{b['n']} groups"
    )


PROBES["hill"] = probe_hill
PROBES["norm_anova"] = probe_norm_anova
PROBES["latency_quantiles"] = probe_latency_quantiles


def probe_wave3(spark):
    """Pair-similarity histogram at threshold 0.5 (the weakest prefix
    filter this family ships), source overlap at 0.8, token
    quantiles — all over 250k docs."""
    from vectorsearchutil_spark.operators import dedup as _dd
    from vectorsearchutil_spark.operators.analytics import (
        _int_value_quantiles,
    )
    from vectorsearchutil_spark.functions.text import tokens

    docs = _docs(spark, n=250_000, toks=40).selectExpr(
        "doc_id",
        "source",
        # plant near-dup mass: 20% of docs form ~50-doc template
        # clusters (5000 distinct templates) — realistic dup-cluster
        # sizes; giant clusters belong to keep_best/cluster_profile,
        # and their pair table is inherently quadratic in cluster size
        "CASE WHEN pmod(doc_id, 5) = 0 THEN concat_ws(' ',"
        " transform(sequence(1, 40), j -> concat('tpl',"
        " pmod(doc_id, 5000), '_', pmod(j + pmod(doc_id, 3), 42))))"
        " ELSE text END AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    h = _dd.ngram_jaccard_pairs(docs, n=3, threshold=0.5).groupBy(
        F.least(F.floor(F.col("jaccard") * 20), F.lit(19)).alias("b")
    ).count().agg(F.sum("count").alias("p")).collect()[0]
    dt1 = time.time() - t0
    t0 = time.time()
    q = _int_value_quantiles(
        docs.select("source", F.size(tokens(F.col("text"))).alias("t")),
        "source", "t", [0.5, 0.99], ["a", "b"],
    ).count()
    dt2 = time.time() - t0
    docs.unpersist()
    return (
        f"pair_hist(0.5) {dt1:.1f}s @ 250k docs -> {h['p']} pairs;"
        f" token_quantiles {dt2:.1f}s -> {q} sources"
    )


PROBES["wave3"] = probe_wave3


def probe_wave4(spark):
    """Wave-4 25x probes: lorenz (two-level rank over 2M users),
    drawdown/rolling-corr (day-grid windows under 25M raw rows),
    corr matrix (single full-scan aggregate over 150M rows), scd2
    (per-key lead over 2M keys x 3 versions), fertility (regex
    tallies over 1.25M docs), storage budget (byte histogram)."""
    from vectorsearchutil_spark.operators.analytics import (
        lorenz_curve_by_user,
        max_drawdown_daily,
        numeric_corr_matrix,
        rolling_corr_daily,
    )
    from vectorsearchutil_spark.operators.cdc import scd2_build
    from vectorsearchutil_spark.operators.multimodal import (
        storage_budget,
        synthesize_binary,
    )
    from vectorsearchutil_spark.operators.textanalysis import (
        tokenizer_fertility,
    )

    ev = _events(spark, n=25_000_000, users=2_000_000).selectExpr(
        "event_id", "ts", "user_id",
        "CASE WHEN pmod(event_id, 2) = 0 THEN 'purchase'"
        " ELSE 'click' END AS event_type",
        "value",
    ).cache()
    ev.count()
    t0 = time.time()
    lz = lorenz_curve_by_user(ev).agg(
        F.count(F.lit(1)).alias("n"), F.sum("cum_share").alias("s")
    ).collect()[0]
    dt_l = time.time() - t0
    t0 = time.time()
    max_drawdown_daily(ev).collect()
    dt_d = time.time() - t0
    t0 = time.time()
    rc = rolling_corr_daily(ev).count()
    dt_r = time.time() - t0
    ev.unpersist()

    li = spark.range(150_000_000).selectExpr(
        "cast(pmod(xxhash64(id), 50) + 1 as double) AS l_quantity",
        "cast(pmod(xxhash64(id, 1), 10000000) as double)"
        " / 100.0 AS l_extendedprice",
        "cast(pmod(xxhash64(id, 2), 11) as double) / 100.0 AS l_discount",
    )
    t0 = time.time()
    cm = numeric_corr_matrix(
        li,
        [("l_quantity", 1), ("l_extendedprice", 100), ("l_discount", 100)],
    ).count()
    dt_c = time.time() - t0

    log = spark.range(2_000_000).selectExpr(
        "id AS k", "1 AS seq", "'upsert' AS op", "cast(id as double) AS bal"
    ).unionByName(
        spark.range(2_000_000).where("id % 10 in (1, 2)").selectExpr(
            "id AS k", "2 AS seq", "'upsert' AS op",
            "cast(id + 100 as double) AS bal",
        )
    ).unionByName(
        spark.range(2_000_000).where("id % 10 = 0").selectExpr(
            "id AS k", "2 AS seq", "'delete' AS op",
            "cast(id as double) AS bal",
        )
    )
    t0 = time.time()
    sc = scd2_build(log, "k", "seq").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_current").cast("long")).alias("c"),
    ).collect()[0]
    dt_s = time.time() - t0

    docs = _docs(spark).cache()
    docs.count()
    t0 = time.time()
    tokenizer_fertility(docs, group_col="source").count()
    dt_f = time.time() - t0
    t0 = time.time()
    storage_budget(synthesize_binary(docs)).count()
    dt_b = time.time() - t0
    docs.unpersist()
    return (
        f"lorenz {dt_l:.1f}s @ 25M ev / 2M users ({lz['n']} deciles);"
        f" drawdown {dt_d:.1f}s; rolling_corr {dt_r:.1f}s ({rc} rows);"
        f" corr_matrix {dt_c:.1f}s @ 150M rows ({cm} pairs);"
        f" scd2 {dt_s:.1f}s @ 2M keys ({sc['n']} versions,"
        f" {sc['c']} current); fertility {dt_f:.1f}s @ 1.25M docs;"
        f" storage_budget {dt_b:.1f}s"
    )


PROBES["wave4"] = probe_wave4


def probe_wave5(spark):
    """Wave-5 25x probes: basket histogram (150M lines -> 40M order
    sizes -> tiny PMF), discount bands (one full-scan aggregate to a
    55-cell grid), unicode health + diversity + fertility-style
    regex tallies over 1.25M docs (diversity's token shuffle is the
    top-terms width), cluster lang purity reuses the banded CC path
    probed in round 5."""
    from vectorsearchutil_spark.operators.textanalysis import (
        diversity_indices,
        unicode_health,
    )

    li = spark.range(150_000_000).selectExpr(
        "cast(pmod(xxhash64(id), 40000000) as bigint) AS l_orderkey",
        "cast(pmod(xxhash64(id, 1), 50) + 1 as double) AS l_quantity",
        "cast(pmod(xxhash64(id, 2), 10000000) as double)"
        " / 100.0 AS l_extendedprice",
        "cast(pmod(xxhash64(id, 3), 11) as double) / 100.0 AS l_discount",
    )
    t0 = time.time()
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    bh = sizes.groupBy("k").count().count()
    dt_b = time.time() - t0
    t0 = time.time()
    db = li.groupBy(
        F.floor(F.col("l_discount") * 100.0 + 0.5).alias("d"),
        F.floor((F.col("l_quantity") - 1) / 10.0).alias("q"),
    ).agg(F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5))).count()
    dt_d = time.time() - t0

    docs = _docs(spark).cache()
    docs.count()
    t0 = time.time()
    unicode_health(docs).count()
    dt_u = time.time() - t0
    t0 = time.time()
    dv = diversity_indices(docs).count()
    dt_v = time.time() - t0
    docs.unpersist()
    return (
        f"basket_hist {dt_b:.1f}s @ 150M lines -> {bh} sizes;"
        f" discount_bands {dt_d:.1f}s ({db} cells);"
        f" unicode_health {dt_u:.1f}s @ 1.25M docs;"
        f" diversity {dt_v:.1f}s ({dv} sources)"
    )


PROBES["wave5"] = probe_wave5


def probe_wave6(spark):
    """Wave-6 25x probes: anomaly screen + completeness over 25M
    events (grid-bounded after the first aggregate); WAPE over a
    synthesized 10-year daily grid under 100M order rows; dedup
    impact reuses the banded CC path (probed separately); exact-dup
    vectors over 2M 64-dim vectors (md5-narrowed shuffle keys)."""
    from vectorsearchutil_spark.operators.analytics import (
        completeness_gaps,
        seasonal_anomalies_daily,
        seasonal_naive_wape,
    )

    ev = _events(spark).cache()
    ev.count()
    t0 = time.time()
    an = seasonal_anomalies_daily(ev).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_anomaly").cast("long")).alias("f"),
    ).collect()[0]
    dt_a = time.time() - t0
    t0 = time.time()
    completeness_gaps(ev).count()
    dt_c = time.time() - t0
    ev.unpersist()

    orders = spark.range(100_000_000).selectExpr(
        "id AS o_orderkey",
        "cast(timestamp_micros(cast(1400000000000000 + "
        "pmod(xxhash64(id), 3650) * 86400000000 as bigint))"
        " as timestamp_ntz) AS o_orderdate",
        "cast(pmod(xxhash64(id, 1), 100000) as double)"
        " / 100.0 AS o_totalprice",
    )
    t0 = time.time()
    seasonal_naive_wape(orders).collect()
    dt_w = time.time() - t0

    emb = spark.range(2_000_000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), j -> cast(pmod(xxhash64(id, j), 1000)"
        " as float) / 1000.0) AS embedding",
        "cast(pmod(id, 10) as int) AS label",
    )
    from vectorsearchutil_spark.queries_pending import PENDING_QUERIES
    emb.createOrReplaceTempView("_probe_emb")
    t0 = time.time()
    sig = F.md5(F.concat_ws(",", F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5))
        .cast("long").cast("string"))))
    dup = emb.select("label", sig.alias("s")).groupBy("label", "s").agg(
        F.count(F.lit(1)).alias("c")
    ).groupBy("label").agg(F.sum(F.col("c") - 1).alias("red")).count()
    dt_e = time.time() - t0
    return (
        f"anomalies {dt_a:.1f}s @ 25M events ({an['n']} days,"
        f" {an['f']} flagged); completeness {dt_c:.1f}s;"
        f" wape {dt_w:.1f}s @ 100M orders / 10y grid;"
        f" exact_dup_vectors {dt_e:.1f}s @ 2M x 64-dim ({dup} labels)"
    )


PROBES["wave6"] = probe_wave6


if __name__ == "__main__":
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("probe-round8-pending")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        print(f"{name}: {fn(spark)}", flush=True)
