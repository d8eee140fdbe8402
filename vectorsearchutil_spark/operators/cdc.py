"""Change-data-capture apply — the row-level MERGE that turns a
snapshot plus a changelog into the next snapshot (the lakehouse
"MERGE INTO" / upsert primitive, implemented engine-side so it works
on plain parquet snapshots without a table format; the manifest-log /
Delta backends version whole table states, this operator reconciles
ROWS).

Semantics: the changelog carries (id, seq, op, payload...); per id
the change with the highest ``seq`` wins (callers must make ``seq``
a total order per id — a CDC stream's log offset). A winning
``delete`` drops the row; a winning ``upsert`` replaces (or inserts)
the payload; untouched snapshot rows pass through.

Scale shape: the changelog reduces to one winner row per touched id
(one shuffle of the CHANGELOG only — typically ≪ snapshot); the
snapshot is LEFT-ANTI-joined against the touched-id set (broadcast
when the changelog is small) and never shuffles; winners with
op='upsert' union in. At 100 TB this is the standard
"big-table merge with small daily delta" plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    id_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a changelog to a snapshot; returns the next snapshot
    with the snapshot's columns. ``changes`` must contain
    ``id_col``, ``seq_col``, ``op_col`` ('upsert' | 'delete') and
    every snapshot column an upsert replaces."""
    payload_cols = [c for c in snapshot.columns]
    win = Window.partitionBy(id_col).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    winners = (
        changes.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = winners.select(id_col)
    survivors = snapshot.join(touched, id_col, "left_anti")
    upserts = winners.filter(F.col(op_col) == "upsert").select(*payload_cols)
    return survivors.unionByName(upserts)


def scd2_build(
    changelog: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Build a slowly-changing-dimension TYPE 2 history from a CDC
    changelog: each upsert opens a version valid from its own change
    sequence until the NEXT change of the same key (upsert or
    delete); the last un-deleted version is current. The standard
    snapshot-reconstruction table behind "what did this row look
    like at change N".

    Plan: one window per key (lead over (key, seq)) — partitions by
    the dimension key, so the sort is per-key and parallel; deletes
    contribute interval CLOSURE only and are dropped from the
    output. Duplicate (key, seq) rows are the caller's contract to
    avoid (cdc_apply's latest-change-wins collapse produces one).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).asc())
    versions = changelog.select(
        "*",
        F.lead(F.col(seq_col)).over(w).alias("_next_seq"),
    )
    return (
        versions.filter(F.col(op_col) != delete_op)
        .drop(op_col)
        .withColumnsRenamed(
            {seq_col: "valid_from_seq", "_next_seq": "valid_to_seq"}
        )
        .withColumn(
            "is_current", F.col("valid_to_seq").isNull()
        )
    )
