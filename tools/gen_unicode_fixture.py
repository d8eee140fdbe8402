"""Adversarial unicode text fixture for cross-engine parity: sf0.001
tables verbatim except documents.text / customer.c_name, which get
deterministic multi-byte content (accents, CJK, astral-plane emoji,
RTL, case-fold traps ß/İ/ı, empty strings, 500-char tokens, tabs,
punctuation runs). Run the full oracle gate against it:

    python tools/gen_unicode_fixture.py /tmp/unicode_sf
    CHECK_ORACLES_SF_DIR=/tmp/unicode_sf \\
        python tools/check_oracles.py

Found in round 5: multimodal_decode_meta's payload_len contract mixed
DuckDB length() (chars) with Python len(utf8 bytes) — identical on
ASCII, divergent on multi-byte (fixed: strlen on the oracle side).
Expected reds on this fixture: the two mlp_*_golden digests (pinned
to sf0.01 training data by design).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = "/root/testdata/sf0.001"

FRAGMENTS = [
    "café naïve résumé",
    "日本語 中文 한국어",
    "\U0001f600\U0001f680 emoji",
    "مرحبا שלום",
    "punct!!! ??? ;;; ,,,",
    "MiXeD CaSe TOKENS",
    "",
    "   ",
    "a" * 500,
    "tok tok tok tok tok",
    "tab\tseparated\tstays",
    "ß İ ı",
]


def main(dst: str):
    import glob

    import duckdb

    from pyspark.sql import functions as F
    from vectorsearchutil_spark.session import get_spark

    spark = get_spark("unicode-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    tmp = dst + ".spark"
    n = len(FRAGMENTS)

    def case_expr(key: str) -> str:
        whens = " ".join(
            f"WHEN {i} THEN '" + f.replace("'", "''") + "'"
            for i, f in enumerate(FRAGMENTS)
        )
        return f"CASE CAST({key} AS INT) {whens} END"

    for p in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(p)
        df = spark.read.parquet(p)
        if name == "documents.parquet":
            df = df.withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', "
                    + case_expr(f"pmod(doc_id, {n})")
                    + ", "
                    + case_expr(f"pmod(doc_id * 7 + 3, {n})")
                    + ", concat('d', doc_id))"
                ),
            )
        elif name == "customer.parquet":
            df = df.withColumn(
                "c_name",
                F.expr(
                    "concat(c_name, CASE CAST(pmod(c_custkey, 4) AS INT)"
                    " WHEN 0 THEN 'é' WHEN 1 THEN '中'"
                    " WHEN 2 THEN '\U0001f600' ELSE '' END)"
                ),
            )
        df.write.mode("overwrite").parquet(f"{tmp}/{name}")

    # flatten the Spark part-file dirs to the single-file layout the
    # oracle tool's DuckDB views expect
    con = duckdb.connect()
    for d in sorted(glob.glob(f"{tmp}/*.parquet")):
        name = os.path.basename(d)
        con.execute(
            f"COPY (SELECT * FROM '{d}/*.parquet')"
            f" TO '{dst}/{name}' (FORMAT PARQUET)"
        )
        print(name, "written")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/unicode_sf")
