"""100x-bench-scale probes (4x the 25x suite) for the signature
operator families: the 25x -> 100x scaling factor is the measured
answer to "would this plan hold at 1000x" — a near-linear factor
(~4x time for 4x data) means the plan has no hidden quadratic or
serial term on the path; the absolute numbers bound single-node
throughput.

Deterministic synthetic inputs (spark.range + hash mixes), warm-run
discipline and generators shared with tools/probe_round4_scale.py.

Usage: python tools/probe_round5_100x.py [op ...]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from tools.probe_round4_scale import (  # noqa: E402
    _probe_query,
    _varied_docs,
)

N_EVENTS = 10_000_000  # 4x the 25x suite
N_DOCS = 500_000


def probe_weighted_median_100x(spark):
    li = spark.range(60_000_000).selectExpr(
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
    return f"{dt:.1f}s @ 60M lines -> {n} groups (25x: 5.2s @ 15M)"


def probe_mad_100x(spark):
    e = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        f"concat('t', pmod(xxhash64(id, 7), 5)) AS event_type",
        "pmod(xxhash64(id, 13), 1000000) / 100.0 AS value",
    )
    dt, n = _probe_query(spark, "events_value_mad_outliers", "events", e)
    return f"{dt:.1f}s @ 10M events -> {n} outliers (25x: 6.7s @ 2.5M)"


def probe_minhash_lsh_100x(spark):
    from vectorsearchutil_spark.operators.dedup import minhash_lsh_pairs

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    n = minhash_lsh_pairs(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 500k docs -> {n} LSH candidate-verified pairs"


def probe_simhash64_100x(spark):
    from vectorsearchutil_spark.operators.dedup import simhash64_pairs

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    t0 = time.time()
    n = simhash64_pairs(docs).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 500k docs -> {n} simhash64 pairs"


def probe_ahash_neardup_100x(spark):
    from vectorsearchutil_spark.operators.multimodal import (
        ahash_neardup_pairs,
        image_ahash,
        synthesize_binary,
    )

    docs = _varied_docs(spark, N_DOCS).cache()
    docs.count()
    h = image_ahash(synthesize_binary(docs)).select("doc_id", "ahash")
    t0 = time.time()
    n = ahash_neardup_pairs(h, max_hamming=3, n_bands=4).count()
    dt = time.time() - t0
    docs.unpersist()
    return (
        f"{dt:.1f}s @ 500k images -> {n} pairs"
        " (25x after restructure: 4.1s @ 125k)"
    )


def probe_token_budget_100x(spark):
    from vectorsearchutil_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.range(N_EVENTS).selectExpr(
        "id AS doc_id",
        "concat('s', pmod(xxhash64(id, 3), 2)) AS source",
        "repeat('w ', 20 + cast(pmod(xxhash64(id, 5), 200) AS INT))"
        " AS text",
    ).cache()
    docs.count()
    t0 = time.time()
    n = token_budget_sample(
        docs, {"s0": 40_000_000, "s1": 25_000_000}, seed="tb100"
    ).count()
    dt = time.time() - t0
    docs.unpersist()
    return f"{dt:.1f}s @ 10M docs / 2 sources -> {n} admitted (25x: 4.4s @ 2.5M)"


def probe_attribution_100x(spark):
    e = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        "timestamp_micros(cast(1700000000000000 + id * 997000 AS BIGINT))"
        " AS ts",
        "pmod(xxhash64(id, 11), 200000) AS user_id",
        "CASE pmod(xxhash64(id, 13), 10) WHEN 0 THEN 'purchase'"
        " WHEN 1 THEN 'other' WHEN 2 THEN 'view' ELSE 'click' END"
        " AS event_type",
        "cast(pmod(xxhash64(id, 17), 10000) AS DOUBLE) / 100 AS value",
    )
    dt, n = _probe_query(spark, "events_attribution", "events", e)
    return f"{dt:.1f}s @ 10M events -> {n} purchases (25x: 0.2s @ 2.5M)"


PROBES = {
    "weighted_median_100x": probe_weighted_median_100x,
    "mad_100x": probe_mad_100x,
    "minhash_lsh_100x": probe_minhash_lsh_100x,
    "simhash64_100x": probe_simhash64_100x,
    "ahash_neardup_100x": probe_ahash_neardup_100x,
    "token_budget_100x": probe_token_budget_100x,
    "attribution_100x": probe_attribution_100x,
}


def main():
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("scale-probe-100x")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    for name, fn in PROBES.items():
        if only and name not in only:
            continue
        try:
            print(f"{name}: {fn(spark)}", flush=True)
        except Exception as e:  # noqa: BLE001 — probe must report
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
