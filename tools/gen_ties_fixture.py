"""Adversarial TIE-HEAVY fixture for cross-engine parity: sf0.001
tables verbatim except

- ``events.value``    → quantized to 7 distinct values (mass ties in
  every rank/percentile/quantile path; exact half-way .x5 cents);
- ``embeddings.embedding`` → only 5 distinct vectors (mass cosine
  ties in kNN / hubness / rerank / retrieval metrics — the id
  tie-break carries ALL the ordering);
- ``documents.text``  → only 12 distinct texts (exact-dup clusters
  with score ties for keep-best / containment 1.0 everywhere);
- ``customer.c_acctbal`` → 3 distinct values (ntile/decile ties).

The degenerate sweep only proves these EXECUTE; running the ORACLE
GATE here proves both engines BREAK TIES identically — the classic
cross-engine failure mode:

    python tools/gen_ties_fixture.py /tmp/ties_sf
    CHECK_ORACLES_SF_DIR=/tmp/ties_sf CHECK_ORACLES_PENDING=1 \\
        python tools/check_oracles.py

Expected reds: the two mlp_*_golden digests (pinned to sf0.01
training data by design) — everything else must be green.
"""

from __future__ import annotations

import glob
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.001"


def main(out: str) -> None:
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.session import get_spark

    import duckdb

    spark = get_spark("gen-ties-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    tmp = out.rstrip("/") + "__spark_dirs"
    for p in sorted(glob.glob(f"{SRC}/*.parquet")):
        name = os.path.basename(p)
        df = spark.read.parquet(p)
        if name == "events.parquet":
            df = df.withColumn(
                "value",
                # 7 distinct values incl. exact half-way cents
                F.element_at(
                    F.expr(
                        "array(0.125D, 10.005D, 10.005D, 42.0D,"
                        " 99.995D, 250.5D, 1000.0D)"
                    ),
                    (F.pmod(F.col("event_id"), 7) + 1).cast("int"),
                ),
            )
        elif name == "embeddings.parquet":
            first5 = [
                r["embedding"]
                for r in df.orderBy("vec_id").limit(5).collect()
            ]
            arr = (
                "array("
                + ", ".join(
                    "array("
                    + ", ".join(f"CAST({float(x)!r} AS FLOAT)" for x in v)
                    + ")"
                    for v in first5
                )
                + ")"
            )
            df = df.withColumn(
                "embedding",
                F.element_at(
                    F.expr(arr),
                    (F.pmod(F.col("vec_id"), 5) + 1).cast("int"),
                ),
            )
        elif name == "documents.parquet":
            texts = [
                r["text"]
                for r in df.orderBy("doc_id").limit(12).collect()
            ]
            lit = (
                "array("
                + ", ".join(
                    "'" + t.replace("'", "") + "'" for t in texts
                )
                + ")"
            )
            df = df.withColumn(
                "text",
                F.element_at(
                    F.expr(lit),
                    (F.pmod(F.col("doc_id"), 12) + 1).cast("int"),
                ),
            )
        elif name == "customer.parquet":
            df = df.withColumn(
                "c_acctbal",
                F.element_at(
                    F.expr("array(-500.5D, 0.005D, 7777.77D)"),
                    (F.pmod(F.col("c_custkey"), 3) + 1).cast("int"),
                ),
            )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, name)
        )
        # flatten the Spark directory into the single file DuckDB's
        # '{dir}/{t}.parquet' view registration expects
        con = duckdb.connect()
        con.execute(
            f"COPY (SELECT * FROM '{os.path.join(tmp, name)}/*.parquet')"
            f" TO '{os.path.join(out, name)}' (FORMAT PARQUET)"
        )
        con.close()
        print(f"{name} written", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ties_sf")
