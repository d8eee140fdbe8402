"""Exact k-nearest-neighbour search as declarative DataFrame plans.

Reference semantics (``vsu/base/VectorSearchBase.py:193-213``): embed
the query, ANN-search the faiss index, join payload on rowid, sort by
distance ascending, limit k. Our exact brute-force form is a
correctness superset of the reference's ANN path and maps to the plan
you actually want at scale:

* single query → ``orderBy(distance).limit(k)``. Catalyst compiles
  this to ``TakeOrderedAndProject``: each partition computes its local
  top-k over a narrow scan+project (no shuffle), the driver merges k
  rows per partition. At 100 TB this is one pass, embarrassingly
  parallel, with only O(k × partitions) rows ever leaving executors.
* query batch → broadcast the query table (it is small by
  construction), cross-join against the corpus, rank per query with a
  window. The corpus never shuffles; the only shuffle is the final
  ``partitionBy(query_id)`` over candidate rows, which we pre-shrink
  by taking per-partition top-k first.

Ties are broken by id ascending so results are deterministic (the
reference's SQLite ordering is stable on rowid for equal distances).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.vector import cosine_similarity, l2_distance


def _distance(metric: str, a: Column | str, b: Column | str) -> tuple[Column, bool]:
    """Return (distance/score column, ascending?) for a metric name."""
    if metric == "l2":
        return l2_distance(a, b), True
    if metric == "cosine":
        # similarity: higher is closer → descending
        return cosine_similarity(a, b), False
    raise ValueError(f"unknown metric {metric!r}; use 'l2' or 'cosine'")


def knn(
    corpus: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    vector_col: str = "vector",
    id_col: str = "id",
    metric: str = "l2",
) -> DataFrame:
    """Top-k nearest rows of ``corpus`` to one literal query vector.

    Mirrors ``__search_similar_embeddings``
    (``vsu/base/VectorSearchBase.py:193-202``): distance ASC, LIMIT k.
    Output: corpus columns + ``distance``.
    """
    from vectorsearchutil_spark.functions.vector import lit_vector

    lit_query = lit_vector(query_vector)
    dist, asc = _distance(metric, F.col(vector_col), lit_query)
    # NULL vectors yield NULL distances, which ascending order puts
    # FIRST — they would displace real neighbors; they are not
    # search candidates at all
    ranked = corpus.filter(F.col(vector_col).isNotNull()).withColumn(
        "distance", dist
    )
    order = [
        F.col("distance").asc() if asc else F.col("distance").desc(),
        F.col(id_col).asc(),
    ]
    # orderBy + limit → TakeOrderedAndProject (distributed top-k, no full sort)
    return ranked.orderBy(*order).limit(k)


def knn_filtered(
    corpus: DataFrame,
    query_vector: Sequence[float],
    predicate: Column,
    k: int = 5,
    vector_col: str = "vector",
    id_col: str = "id",
    metric: str = "l2",
) -> DataFrame:
    """Filtered vector search: top-k among rows satisfying a metadata
    predicate (pre-filter semantics — every result row satisfies it,
    unlike post-filtering a plain top-k which can return < k rows).

    The predicate sits below the distance projection, so Catalyst
    pushes it into the parquet scan (``PushedFilters``) — at 100 TB a
    selective filter prunes row groups before any distance is
    computed, which is the whole point of storing filterable metadata
    next to vectors.
    """
    return knn(
        corpus.filter(predicate), query_vector, k=k,
        vector_col=vector_col, id_col=id_col, metric=metric,
    )


def knn_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vector_col: str = "vector",
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vector_col: str = "query_vector",
    metric: str = "l2",
) -> DataFrame:
    """Top-k per query for a table of queries.

    Plan: broadcast(queries) ⨯ corpus → distance → window top-k per
    query. The broadcast keeps the big side shuffle-free; AQE coalesces
    the window shuffle, whose input is only the candidate rows.
    Output: query_id, corpus id, distance — ranked 1..k per query.
    """
    dist, asc = _distance(metric, F.col(vector_col), F.col(query_vector_col))
    order = [
        F.col("distance").asc() if asc else F.col("distance").desc(),
        F.col(id_col).asc(),
    ]
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .withColumn("distance", dist)
        .select(query_id_col, id_col, "distance")
    )
    win = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
