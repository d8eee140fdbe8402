"""Embedding-column transforms for vector pipelines.

The reference stores raw float vectors and serializes them to float32
for its index (``vsu/base/VectorSearchBase.py:74-75``). Production
vector pipelines go further before landing 100 TB of embeddings:

* **unit L2 normalization** — makes dot ≡ cosine, so downstream
  similarity is a plain (BLAS-friendly) inner product;
* **symmetric int8 quantization** — 4× storage and bandwidth vs
  float32; per-vector scale keeps relative error bounded. This is the
  faiss ``SQ8`` idea expressed as a declarative column transform.

Both are narrow projections (no shuffle, codegen-friendly, pushdown
around them intact). The per-vector scalar (norm / scale) is
materialized as its OWN column before the ``transform`` lambda
references it — expressions inside lambda bodies are not CSE'd, so
an inline aggregate would re-evaluate per element (PERF.md lesson 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.vector import l2_norm


def normalize_vectors(
    df: DataFrame,
    vector_col: str = "embedding",
    out_col: str = "unit_vec",
    norm_col: str = "norm",
) -> DataFrame:
    """Unit-L2-normalize a vector column; keeps the norm as a column.
    Zero vectors map to NULL components (try_divide convention)."""
    with_norm = df.withColumn(norm_col, l2_norm(F.col(vector_col)))
    unit = F.transform(
        F.col(vector_col).cast("array<double>"),
        lambda x: F.try_divide(x, F.col(norm_col)),
    )
    return with_norm.withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame,
    vector_col: str = "embedding",
    out_col: str = "q8",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization.

    ``scale = max(|v|) / 127``; ``q_j = round(v_j / scale)`` clamped
    to [-127, 127]. Reconstruction is ``q_j * scale``. An all-zero
    vector gets scale NULL and an all-zero q8 (guarded division).
    """
    v = F.col(vector_col).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    with_scale = df.withColumn(
        scale_col, F.try_divide(absmax, F.lit(127.0))
    )
    q = F.transform(
        F.col(vector_col).cast("array<double>"),
        lambda x: F.least(
            F.lit(127),
            F.greatest(
                F.lit(-127),
                F.coalesce(
                    F.round(F.try_divide(x, F.col(scale_col)), 0),
                    F.lit(0.0),
                ).cast("int"),
            ),
        ),
    )
    return with_scale.withColumn(out_col, q)
