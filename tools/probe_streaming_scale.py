"""Adversarial-scale streaming probe (VERDICT r4 #8): drive the
stateful streaming operators through a MULTI-RESTART availableNow
replay at 25x event volume and confirm (a) state stays O(keys) —
measured from the state-store progress metrics, not the docstring
claim — and (b) the output is restart-invariant (3-restart replay ==
one-shot run over the same data, byte-for-byte as sorted tuples).

Usage: python tools/probe_streaming_scale.py [attribution|budget ...]

Volumes: 2.5M events / 50k users for attribution (25x the sf0.1
events table), 250k sized docs / 200 sources for token budget. The
state contracts under test: attribution keeps ONE long per user,
token budget ONE long per source.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Overridable for larger-key sweeps (VERDICT r9 #8: probe state at
# bigger key counts, e.g. PROBE_N_USERS=500000 PROBE_N_EVENTS=5000000)
N_EVENTS = int(os.environ.get("PROBE_N_EVENTS", 2_500_000))
N_USERS = int(os.environ.get("PROBE_N_USERS", 50_000))
N_DOCS = int(os.environ.get("PROBE_N_DOCS", 250_000))
N_SOURCES = int(os.environ.get("PROBE_N_SOURCES", 200))


def _state_rows(q) -> int:
    """Max state rows across the run's progress events."""
    rows = 0
    for p in q.recentProgress:
        for so in (p.get("stateOperators") or []):
            rows = max(rows, int(so.get("numRowsTotal") or 0))
    return rows


def _run_availablenow(spark, make_stream, src, out, ckpt) -> int:
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        make_stream(spark, src)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return _state_rows(q)


def probe_attribution(spark):
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.streaming.stateful import (
        streaming_attribution,
    )

    events = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        # event time advances with id so ts-ordered arrival == id order
        "timestamp_micros(cast(1700000000000000 + id * 997000 AS BIGINT))"
        " AS ts",
        f"pmod(xxhash64(id, 11), {N_USERS}) AS user_id",
        "CASE pmod(xxhash64(id, 13), 10)"
        "  WHEN 0 THEN 'purchase' WHEN 1 THEN 'other'"
        "  WHEN 2 THEN 'view' ELSE 'click' END AS event_type",
        "cast(pmod(xxhash64(id, 17), 10000) AS DOUBLE) / 100 AS value",
    )
    schema = events.schema

    def make_stream(spark, src):
        return streaming_attribution(
            spark.readStream.schema(schema).parquet(src)
        )

    work = tempfile.mkdtemp(prefix="probe_attrib_")
    try:
        src = os.path.join(work, "src")
        # three arrival slices in event-time order -> three restarts
        cuts = (N_EVENTS // 3, 2 * N_EVENTS // 3, N_EVENTS)
        slices = [
            events.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < hi)
            )
            for lo, hi in zip((0,) + cuts[:-1], cuts)
        ]

        out3 = os.path.join(work, "out3")
        ckpt3 = os.path.join(work, "ckpt3")
        t0 = time.time()
        state_rows = 0
        for s in slices:
            s.write.mode("append").parquet(src)
            state_rows = max(
                state_rows,
                _run_availablenow(spark, make_stream, src, out3, ckpt3),
            )
        dt3 = time.time() - t0

        # one-shot reference over the identical arrival order
        out1 = os.path.join(work, "out1")
        ckpt1 = os.path.join(work, "ckpt1")
        one_rows = _run_availablenow(
            spark, make_stream, src, out1, ckpt1
        )

        got3 = spark.read.parquet(out3)
        got1 = spark.read.parquet(out1)
        n3, n1 = got3.count(), got1.count()
        mism = (
            got3.groupBy(got3.columns).count()
            .join(
                got1.groupBy(got1.columns).count(),
                got3.columns + ["count"],
                "full_outer",
            )
            .filter("count IS NULL")
            .count()
        ) if n3 == n1 else -1
        touched = int(N_USERS)  # every user appears at this volume
        ok_state = state_rows <= touched and one_rows <= touched
        ok_replay = n3 == n1 and mism == 0
        return (
            f"{dt3:.1f}s 3-restart @ {N_EVENTS} events/{N_USERS} users"
            f" -> {n3} attributed; state_rows max {state_rows}"
            f" (one-shot {one_rows}, keys {touched}) "
            f"{'O(keys) OK' if ok_state else 'STATE BLOWUP'};"
            f" replay {'IDENTICAL' if ok_replay else 'DIVERGED'}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_budget(spark):
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.streaming.stateful import (
        streaming_token_budget,
    )

    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        f"concat('src', pmod(xxhash64(id, 7), {N_SOURCES})) AS source",
        "pmod(xxhash64(id, 5), 400) + 20 AS n_tokens",
        "id AS _ord",
    )
    schema = docs.schema
    budgets = {f"src{i}": 120_000 for i in range(N_SOURCES)}

    def make_stream(spark, src):
        return streaming_token_budget(
            spark.readStream.schema(schema).parquet(src),
            budgets,
            order_col="_ord",
        )

    work = tempfile.mkdtemp(prefix="probe_budget_")
    try:
        src = os.path.join(work, "src")
        cuts = (N_DOCS // 3, 2 * N_DOCS // 3, N_DOCS)
        slices = [
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            for lo, hi in zip((0,) + cuts[:-1], cuts)
        ]
        out3 = os.path.join(work, "out3")
        ckpt3 = os.path.join(work, "ckpt3")
        t0 = time.time()
        state_rows = 0
        for s in slices:
            s.write.mode("append").parquet(src)
            state_rows = max(
                state_rows,
                _run_availablenow(spark, make_stream, src, out3, ckpt3),
            )
        dt3 = time.time() - t0

        out1 = os.path.join(work, "out1")
        ckpt1 = os.path.join(work, "ckpt1")
        one_rows = _run_availablenow(
            spark, make_stream, src, out1, ckpt1
        )
        got3 = spark.read.parquet(out3)
        got1 = spark.read.parquet(out1)
        n3, n1 = got3.count(), got1.count()
        mism = (
            got3.groupBy(got3.columns).count()
            .join(
                got1.groupBy(got1.columns).count(),
                got3.columns + ["count"],
                "full_outer",
            )
            .filter("count IS NULL")
            .count()
        ) if n3 == n1 else -1
        ok_state = state_rows <= N_SOURCES and one_rows <= N_SOURCES
        ok_replay = n3 == n1 and mism == 0
        return (
            f"{dt3:.1f}s 3-restart @ {N_DOCS} docs/{N_SOURCES} sources"
            f" -> {n3} admitted; state_rows max {state_rows}"
            f" (one-shot {one_rows}, keys {N_SOURCES}) "
            f"{'O(keys) OK' if ok_state else 'STATE BLOWUP'};"
            f" replay {'IDENTICAL' if ok_replay else 'DIVERGED'}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_funnel(spark):
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.streaming.stateful import streaming_funnel

    events = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        "timestamp_micros(cast(1700000000000000 + id * 997000 AS BIGINT))"
        " AS ts",
        f"pmod(xxhash64(id, 11), {N_USERS}) AS user_id",
        "CASE pmod(xxhash64(id, 13), 5)"
        "  WHEN 0 THEN 'purchase' WHEN 1 THEN 'view'"
        "  WHEN 2 THEN 'click' WHEN 3 THEN 'view' ELSE 'click'"
        " END AS event_type",
    )
    schema = events.schema

    def make_stream(spark, src):
        return streaming_funnel(
            spark.readStream.schema(schema).parquet(src)
        )

    work = tempfile.mkdtemp(prefix="probe_funnel_")
    try:
        src = os.path.join(work, "src")
        cuts = (N_EVENTS // 3, 2 * N_EVENTS // 3, N_EVENTS)
        slices = [
            events.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < hi)
            )
            for lo, hi in zip((0,) + cuts[:-1], cuts)
        ]
        out3 = os.path.join(work, "out3")
        ckpt3 = os.path.join(work, "ckpt3")
        t0 = time.time()
        state_rows = 0
        for s in slices:
            s.write.mode("append").parquet(src)
            state_rows = max(
                state_rows,
                _run_availablenow(spark, make_stream, src, out3, ckpt3),
            )
        dt3 = time.time() - t0
        got3 = spark.read.parquet(out3)
        n3 = got3.count()
        # a (user, step) may emit at most once across the whole stream
        dup = n3 - got3.select("user_id", "step").distinct().count()
        ok_state = state_rows <= N_USERS
        return (
            f"{dt3:.1f}s 3-restart @ {N_EVENTS} events/{N_USERS} users"
            f" -> {n3} step completions; state_rows max {state_rows}"
            f" {'O(keys) OK' if ok_state else 'STATE BLOWUP'};"
            f" duplicate emissions {dup}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


PROBES = {
    "funnel": probe_funnel,
    "attribution": probe_attribution,
    "budget": probe_budget,
}


def main():
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("streaming-scale-probe")
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
