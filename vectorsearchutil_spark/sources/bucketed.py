"""Bucketed storage — pre-shuffled tables for co-located joins.

The 100 TB ingest posture promised in store.py: persist the vector
store bucketed by ``hash(target)`` so the append path's anti-join
(and any equi-join on the key) reads both sides already partitioned —
no Exchange at query time. Bucketing is Spark's only *persistent*
partitioning: the shuffle is paid once at write, then every join on
the bucket key is map-side forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
