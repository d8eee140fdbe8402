"""Corpus snapshot diff — the audit step between two versions of a
document set (yesterday's crawl vs today's, pre- vs post-cleaning):
which docs were added, removed, changed, or untouched.

Scale shape: each side reduces to narrow (id, content-hash) rows IN
THE SCAN PROJECTION — raw text never shuffles — then one full-outer
hash join on the id produces the verdict. At 100 TB both sides are
id-bucketed tables and the join co-locates without a shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: field separator / null sentinel for the content hash — chosen
#: outside the data alphabet so (a, None) never collides with (a+"", "")
_SEP = "\x01"
_NULL = "\x00"


def content_hash(cols: list[str]) -> Column:
    """md5 over the null-safe concatenation of ``cols``."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return F.md5(F.concat_ws(_SEP, *parts))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document diff verdict between two snapshots: (id, status)
    with status ∈ {added, removed, changed, unchanged}.

    ``compare_cols`` defaults to every non-id column the two sides
    share (sorted by name, so the hash is schema-order-independent).
    """
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {id_col}
        )
    o = old.select(
        F.col(id_col).alias("_id"), content_hash(compare_cols).alias("_oh")
    )
    n = new.select(
        F.col(id_col).alias("_id"), content_hash(compare_cols).alias("_nh")
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("_id").alias(id_col), status.alias("status"))
