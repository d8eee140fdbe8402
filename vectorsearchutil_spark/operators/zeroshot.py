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

    The label set travels as ONE broadcast row holding an
    array<struct(idx, label, vec)>; per data row the scores are a
    transform() over that array and the argmax is array_min over
    (-score, idx) structs — lexicographic struct ordering reproduces
    the reference's first-max / lowest-index tie-break
    (vsu/text/_classes.py:40). Fully narrow: no per-label row
    expansion, no window shuffle, no join-back — the corpus is
    scanned once and never moves (the shape that survives 100 TB).
    """
    labels_row = labels.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(label_idx_col).alias("idx"),
                    F.col(label_col).alias("label"),
                    F.col(label_vec_col).alias("cv"),
                )
            )
        ).alias("_labels")
    )
    scores_arr = F.transform(
        F.col("_labels"),
        lambda lab: F.struct(
            (
                cosine_similarity(F.col(vector_col), lab["cv"]) * 100.0
            ).alias("score"),
            lab["idx"].alias("idx"),
            lab["label"].alias("label"),
        ),
    )
    best = F.array_min(
        F.transform(
            F.col("_s"),
            lambda x: F.struct(
                (-x["score"]).alias("negscore"),
                x["idx"].alias("idx"),
                x["label"].alias("label"),
            ),
        )
    )
    out = (
        data.crossJoin(F.broadcast(labels_row))
        .withColumn("_s", scores_arr)
        .withColumn("_b", best)
    )
    score = (-F.col("_b.negscore")).alias("score")
    pred = F.col("_b.label").alias("zeroshot_pred")
    if softmax:
        # stabilized softmax of the winning label: exp(max-max)=1 over
        # the sum of exp(s-max) in label-index order
        sumexp = F.aggregate(
            F.col("_s"),
            F.lit(0.0),
            lambda acc, x: acc + F.exp(x["score"] + F.col("_b.negscore")),
        )
        return out.select(
            *data.columns, pred, score, (F.lit(1.0) / sumexp).alias("prob")
        )
    return out.select(*data.columns, pred, score)
