"""Zero-shot classification by label-embedding similarity.

Reference semantics: score every stored vector against every label
vector — E5 variant normalizes both sides and scores cosine×100
(``vsu/text/_classes.py:29-44``); CLIP variant applies softmax over
100·cos (``vsu/image/_classes.py:21-36``; same argmax — softmax is
monotonic). Argmax tie-break = lowest label index
(``vsu/text/_classes.py:40``, ``vsu/image/_classes.py:32``).

Spark plan: corpus ⨯ broadcast(labels) — the label table is tiny by
construction (a handful of class names), so the big side never
shuffles; scores are higher-order-function expressions inside
codegen; the only shuffle is the per-row window for argmax/softmax
normalization, on (id, k·labels) rows. At 100 TB this is a single
narrow pass plus one bounded-width window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.vector import cosine_similarity


def zeroshot_scores(
    data: DataFrame,
    labels: DataFrame,
    vector_col: str = "vector",
    id_col: str = "id",
    label_col: str = "label",
    label_idx_col: str = "label_idx",
    label_vec_col: str = "label_vec",
    softmax: bool = False,
) -> DataFrame:
    """Long-form (id, label, score) for every row×label pair.

    ``score`` = cosine×100 (E5 form); with ``softmax=True`` adds a
    ``prob`` column = softmax over the row's scores (CLIP form).
    """
    scored = (
        data.select(id_col, vector_col)
        .crossJoin(F.broadcast(labels))
        .withColumn(
            "score",
            cosine_similarity(F.col(vector_col), F.col(label_vec_col)) * 100.0,
        )
        .select(id_col, label_idx_col, label_col, "score")
    )
    if softmax:
        row = Window.partitionBy(id_col)
        # stabilized softmax: exp(s - max) / Σ exp(s - max)
        scored = (
            scored.withColumn("_max", F.max("score").over(row))
            .withColumn("_exp", F.exp(F.col("score") - F.col("_max")))
            .withColumn("prob", F.col("_exp") / F.sum("_exp").over(row))
            .drop("_max", "_exp")
        )
    return scored


def zeroshot(
    data: DataFrame,
    labels: DataFrame,
    vector_col: str = "vector",
    id_col: str = "id",
    label_col: str = "label",
    label_idx_col: str = "label_idx",
    label_vec_col: str = "label_vec",
    softmax: bool = False,
) -> DataFrame:
    """Per-row prediction: data columns + ``zeroshot_pred`` (+ score).

    Mirrors the reference's ``data["zeroshot_pred"]`` materialization
    (``vsu/text/_classes.py:43``).
    """
    scored = zeroshot_scores(
        data, labels, vector_col, id_col, label_col, label_idx_col,
        label_vec_col, softmax,
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col(label_idx_col).asc()
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col(label_col).alias("zeroshot_pred"),
            *(["score", "prob"] if softmax else ["score"]),
        )
    )
    return data.join(best, id_col, "left")
