"""Data-dependent projection — reference A7's all-null column drop
(``query_with_info``, ``vsu/base/VectorSearchBase.py:215-217``:
``DataFrame(...).dropna(how='all', axis=1)``).

Two-pass by necessity: one aggregate computes per-column non-null
counts (a single reduced row — cheap at any scale), then a plain
select keeps the surviving columns. The aggregate is partial-agg
friendly so the shuffle carries one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prune_all_null_columns(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Drop columns whose values are entirely null. ``keep`` columns
    are never dropped."""
    keep_set = set(keep or [])
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    survivors = [c for c in df.columns if c in keep_set or counts[c] > 0]
    return df.select(*survivors)
