"""Query registry: every operator in SURVEY.md §2 exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle returning the identical rows/schema.

Conventions that make the driver's order-insensitive value-hash
match:
* every computed column is aliased identically on both sides;
* float results are rounded (both sides) after double-precision
  arithmetic with identical summation order;
* ties in any top-k / argmax are broken by the id column ascending.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorsearchutil_spark.operators.knn import knn, knn_batch
from vectorsearchutil_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# kNN — reference A5/A6 (vsu/base/VectorSearchBase.py:193-213)
# --------------------------------------------------------------------------

_KNN_SINGLE_ORACLE = """
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id,
       e.label,
       ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 4) AS distance
FROM embeddings e, q
ORDER BY list_distance(e.embedding::DOUBLE[], q.qv) ASC, e.vec_id ASC
LIMIT 10
"""


@query("knn_single", _KNN_SINGLE_ORACLE)
def knn_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force L2 top-10 around the vec_id=0 embedding.

    Reference parity: distance ASC + LIMIT k
    (vsu/base/VectorSearchBase.py:199-201); plan is
    TakeOrderedAndProject over a narrow scan — no shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = knn(emb, qv, k=10, vector_col="embedding", id_col="vec_id", metric="l2")
    return out.select(
        "vec_id", "label", F.round(F.col("distance"), 4).alias("distance")
    )


_KNN_BATCH_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id,
         e.vec_id,
         list_distance(e.embedding::DOUBLE[], q.qv) AS d,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_distance(e.embedding::DOUBLE[], q.qv) ASC, e.vec_id ASC
         ) AS rank
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, ROUND(d, 4) AS distance, CAST(rank AS INT) AS rank
FROM scored WHERE rank <= 5
"""


@query("knn_batch", _KNN_BATCH_ORACLE)
def knn_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched kNN: 5 query vectors × corpus, window top-5 per query.

    Plan: broadcast(queries) ⨯ corpus (big side never shuffles) →
    per-query row_number. Reference A5 generalized to query tables.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    out = knn_batch(emb, qs, k=5, vector_col="embedding", id_col="vec_id", metric="l2")
    return out.select(
        "query_id",
        "vec_id",
        F.round(F.col("distance"), 4).alias("distance"),
        F.col("rank").cast("int").alias("rank"),
    )


_KNN_COSINE_ORACLE = """
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1
)
SELECT e.vec_id,
       e.label,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) AS score
FROM embeddings e, q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id ASC
LIMIT 10
"""


@query("knn_cosine", _KNN_COSINE_ORACLE)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-similarity top-10 (the metric option the reference gets
    implicitly for unit-norm CLIP vectors, vsu/image/_classes.py:43)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 1).select("embedding").first()[0]
    out = knn(emb, qv, k=10, vector_col="embedding", id_col="vec_id", metric="cosine")
    return out.select(
        "vec_id", "label", F.round(F.col("distance"), 4).alias("score")
    )
