"""Source connectors.

The reference reads CSVs via pandas (``vsu/sample/main.py:9,13``),
SQLite tables (``VectorSearchBase.py:66-69``) and image files by path
(``vsu/image/_classes.py:40,74``). Here: Parquet/CSV through Spark's
vectorized readers (predicate pushdown + column pruning for free) and
``binaryFile`` for bulk media ingest (see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: The driver-generated benchmark tables (/root/repo/TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. A plain parquet scan: filters/projection
    applied by callers reach the scan via Catalyst pushdown.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    does not read natively — we read it as raw nanos
    (``nanosAsLong``) and floor-truncate to microseconds, matching
    DuckDB's ns→µs truncation so oracles agree.
    """
    if name == "events":
        # ensure the declared engine default (session.ENGINE_CONF) on
        # sessions built elsewhere — Spark has no per-read option for
        # nanos, and without it TIMESTAMP(NANOS) scans throw outright
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS) without tz → NTZ; session tz is UTC so
            # the cast is value-identity, and downstream watermarks /
            # window() require TimestampType.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def load_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV scan (reference A20, ``vsu/sample/main.py:8-15``)."""
    opts = {"header": "true", "inferSchema": "true"}
    opts.update({k: str(v) for k, v in options.items()})
    return spark.read.options(**opts).csv(path)


def load_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Bulk media ingest: path/modificationTime/length/content(binary).

    Replaces the reference's per-row ``Image.open(path)``
    (``vsu/image/_classes.py:40``) with a distributed scan; at 100 TB
    the binary payloads stay partition-local and flow straight into
    Arrow-batched decode UDFs.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Land a DataFrame as JSON-lines (the interchange format most
    LLM-corpus tooling speaks). One file per partition; gzip by
    default — at 100 TB prefer zstd and size partitions so files land
    near the object-store sweet spot (~1 GB)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def load_jsonl(
    spark: SparkSession, path: str, schema=None, **options
) -> DataFrame:
    """JSONL scan. ALWAYS pass ``schema`` in production: schema
    inference reads the data twice and silently widens types; a
    declared schema keeps the scan single-pass and stable. Corrupt
    lines land in ``_corrupt_record`` (PERMISSIVE default) instead of
    failing the job."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC landing (the other columnar format Spark ships a
    vectorized reader for; same pushdown/pruning behavior as
    parquet)."""
    df.write.mode("overwrite").orc(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
