"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectorsearchutil_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: brute-force L2 kNN over sf0.001 embeddings."""
    return Q.knn_single(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each entry in ``queries()``."""
    return Q.ORACLES
