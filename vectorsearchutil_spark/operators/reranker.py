"""Cross-encoder reranking plumbing: first-stage retrieval gives a
cheap shortlist (brute-force / IVF / PQ kNN); a cross-encoder scores
each (query, candidate) PAIR and reorders the shortlist — the
standard two-stage retrieval stack (retrieve-then-rerank) behind
every production semantic-search deployment, and the reference's
natural extension point after ``query()`` (reference search surface:
``vsu/base/VectorSearchBase.py:193-213``).

The model itself follows the repo's encoder convention (SURVEY §5):
real cross-encoder wrappers are import-guarded OPTIONAL dependencies;
inside the correctness boundary runs a DETERMINISTIC stub scorer
(md5-derived, engine-portable) so the plumbing — grouped Arrow
batches, bounded per-query state, rank-and-truncate — is fully
tested and oracle-checked without the model weights.

Scale shape: the shortlist is k×n_queries rows (tiny vs the corpus);
``applyInPandas`` groups by query id, so per-task state is one
shortlist (≤ k rows). The expensive corpus scan happened in stage 1;
reranking never touches the corpus again.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stub_cross_scores(
    query_ids: pd.Series, doc_ids: pd.Series, first_stage: pd.Series
) -> pd.Series:
    """Deterministic stand-in for a cross-encoder forward pass:
    blend the first-stage score with an md5-uniform pair draw —
    0.8·first + 0.2·u(pair). Reproducible in SQL (the oracle spells
    the identical expression), so rerank plumbing is hash-checkable.
    A real scorer drops in with the same (qids, dids, first) → score
    signature.
    """
    us = []
    for q, d in zip(query_ids.tolist(), doc_ids.tolist()):
        h = hashlib.md5(f"ce:{q}:{d}".encode()).hexdigest()[:8]
        us.append(int(h, 16) / 4294967296.0)
    return 0.8 * first_stage.astype("float64") + 0.2 * pd.Series(
        us, index=first_stage.index
    )


def rerank_shortlist(
    shortlist: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "score",
    scorer: Callable[[pd.Series, pd.Series, pd.Series], pd.Series]
    | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Rerank a per-query candidate shortlist with a pair scorer and
    keep the top ``k`` per query.

    ``shortlist`` holds (query_id, id, first-stage score) rows from
    any stage-1 retriever. The scorer runs inside ``applyInPandas``
    grouped on the query id — one Arrow batch per query, state
    bounded by the shortlist length. Output: (query_id, id,
    ce_score, rank) with the cross-encoder score floor-rounded to
    ``round_dp`` (cross-engine half-way safety) and rank by
    (ce_score desc, id asc).
    """
    fn = scorer or stub_cross_scores
    schema = (
        f"{query_id_col} long, {id_col} long, ce_score double"
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        s = fn(
            pdf[query_id_col], pdf[id_col], pdf[score_col]
        ).astype("float64")
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col],
                id_col: pdf[id_col],
                "ce_score": s,
            }
        )

    scored = (
        shortlist.select(
            F.col(query_id_col).cast("long").alias(query_id_col),
            F.col(id_col).cast("long").alias(id_col),
            F.col(score_col).cast("double").alias(score_col),
        )
        .groupBy(query_id_col)
        .applyInPandas(score_group, schema)
    )
    from vectorsearchutil_spark.functions.vector import round_half_up

    rounded = scored.select(
        query_id_col,
        id_col,
        round_half_up(F.col("ce_score"), round_dp).alias("ce_score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("ce_score").desc(), F.col(id_col).asc()
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(query_id_col, id_col, "ce_score", F.col("rank").cast("int").alias("rank"))
    )


def try_load_cross_encoder(model_name: str):
    """Import-guarded real cross-encoder (sentence-transformers),
    mirroring the optional-encoder pattern of ``embedders.py``:
    returns a scorer callable or None when the dependency is absent
    (this container has no model libs — ENCODER_SMOKE.md records the
    skip evidence policy).
    """
    try:  # pragma: no cover - dependency absent in CI container
        from sentence_transformers import CrossEncoder  # type: ignore
    except Exception:
        return None

    model = CrossEncoder(model_name)  # pragma: no cover

    def scorer(qids, dids, first):  # pragma: no cover
        pairs = [(str(q), str(d)) for q, d in zip(qids, dids)]
        return pd.Series(model.predict(pairs), index=first.index)

    return scorer  # pragma: no cover
