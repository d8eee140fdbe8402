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


def _pin_session_confs(spark: SparkSession) -> None:
    """Pin the confs this engine's correctness depends on onto the
    CURRENT session — including driver-created sessions the engine did
    not build (``session.ENGINE_CONF`` only reaches sessions built by
    ``get_spark``; the ``__spark_entry__`` contract hands in a foreign
    one).

    - ``session.timeZone=UTC``: the testdata timestamps are TZ-naive
      parquet and every oracle is TZ-naive DuckDB, so all calendar
      arithmetic (``F.year``/``to_date``/``F.window``/``date_trunc``)
      must resolve against UTC. On a non-UTC host a bone-stock session
      shifts every window/as-of/day boundary by the zone offset.
    - ``nanosAsLong=true``: parquet TIMESTAMP(NANOS) (events.ts) has
      no per-read option and throws outright without it.

    Both are runtime-settable SQL confs; setting them per-read is
    idempotent and costs one local conf write.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. A plain parquet scan: filters/projection
    applied by callers reach the scan via Catalyst pushdown.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    does not read natively — we read it as raw nanos
    (``nanosAsLong``) and floor-truncate to microseconds, matching
    DuckDB's ns→µs truncation so oracles agree.

    Every timestamp column is normalized to ONE canonical read type —
    ``TimestampNTZType`` — regardless of which of bigint /
    TIMESTAMP_NTZ / TIMESTAMP the host Spark's read config
    (``spark.sql.parquet.inferTimestampNTZ.enabled``) produced, so
    query code never branches on the host's parquet timestamp mapping.

    NTZ is the only collect-proof choice: the testdata is TZ-naive
    parquet (isAdjustedToUTC=false) and the oracles are TZ-naive
    DuckDB, and PySpark's ``TimestampType.fromInternal`` converts
    through the PYTHON PROCESS local timezone at ``collect()`` — on a
    non-UTC host every raw-timestamp output column would shift by the
    zone offset even with the session pinned to UTC (measured: events
    rows collect as ``2023-12-31 19:09:58`` under TZ=America/New_York
    where DuckDB reads ``2024-01-01 00:09:58``). NTZ round-trips
    value-exact, and calendar functions / ``F.window`` on NTZ never
    consult the session zone.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    _pin_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as raw nanos: floor-truncate to µs,
        # matching DuckDB's ns→µs truncation so oracles agree.
        # timestamp_micros → LTZ; the immediate NTZ cast below is
        # value-identity under the UTC session pin just set.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampType):
            # LTZ → NTZ is value-identity under session tz=UTC (the
            # stored naive micros come back out exactly).
            df = df.withColumn(
                field.name, F.col(field.name).cast("timestamp_ntz")
            )
    return df


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
