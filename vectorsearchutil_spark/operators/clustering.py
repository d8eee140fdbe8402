"""Iterative k-means (Lloyd's) over an embedding column.

The iterative-algorithm pattern on Spark: each iteration is a full
declarative plan (assign = corpus ⨯ broadcast(centroids) argmin;
recompute = posexplode + groupBy avg), driven by a Python loop.
Centroids are tiny so they broadcast; the corpus never shuffles
during assignment — per iteration the only shuffle is the centroid
recompute, which partial-aggregates down to k×dim values.

Determinism: init = the k lowest-id vectors; ties in assignment break
to the lowest centroid id; centroids round to 6dp each iteration so
independent engines (and the DuckDB oracle, which unrolls the same
iterations in SQL) converge bit-identically.

At 100 TB you would persist assignments per iteration (checkpoint to
break lineage) and sample for the centroid update; the operator keeps
the exact form since its contract is oracle-checkable determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.vector import l2_distance


def _recompute_centroids(
    assigned: DataFrame, vector_col: str, dim: int
) -> DataFrame:
    return (
        assigned.select(
            "cid",
            F.posexplode(F.col(vector_col).cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("v"), 6).alias("v"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("s"))
        .select("cid", F.transform("s", lambda x: x["v"]).alias("cv"))
    )


def _assign(df: DataFrame, centroids: DataFrame, vector_col: str, id_col: str) -> DataFrame:
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_d", l2_distance(F.col(vector_col), F.col("cv"))
    )
    win = Window.partitionBy(id_col).orderBy(F.col("_d").asc(), F.col("cid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(df["*"], "cid", "_d")
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iterations`` Lloyd's steps; returns (assignments,
    centroids). Assignments: (id, cid, distance to its centroid)."""
    centroids = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cid"),
            F.col(vector_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cid", F.col("cid") - 1)
    )
    assigned = None
    for _ in range(iterations):
        assigned = _assign(df, centroids, vector_col, id_col)
        centroids = _recompute_centroids(assigned, vector_col, dim)
    final = _assign(df, centroids, vector_col, id_col)
    return (
        final.select(
            F.col(id_col),
            F.col("cid").alias("cluster"),
            F.round(F.col("_d"), 4).alias("distance"),
        ),
        centroids,
    )
