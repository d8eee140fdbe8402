"""Scale-adaptive parallelism floor for fan-out stages.

Spark sizes scan partitions by INPUT BYTES (``maxPartitionBytes``) and
AQE coalesces shuffle partitions by MAP-OUTPUT BYTES — both lie for a
stage whose row count EXPLODES downstream of the partitioning decision
(pair joins, shingle/token explodes, per-query candidate fan-outs): a
few-MB input collapses to one task and the quadratic/linear expansion
serializes on one core while the rest of the cluster idles. The
optimization playbook's partitioning rule (guide §2): partition by the
post-explosion size, not the pre-explosion bytes, and derive the
number from the session, never a hard-coded constant.
"""

from __future__ import annotations

from pyspark.errors import PySparkException
from pyspark.sql import DataFrame


def fanout_repartition(df: DataFrame, gated: bool = True) -> DataFrame:
    """Raise a narrow input's partition count to the session's default
    parallelism ahead of a fan-out stage.

    ``gated=True`` (scan-rooted inputs): no-op when the plan already
    carries >= defaultParallelism partitions — any real at-scale scan
    — so the extra exchange exists ONLY in the small-input regime
    where it is ~free (the shuffle moves the small pre-explosion rows
    once). ``gated=False`` (bounded aggregate outputs, e.g. calendar
    grids): repartition unconditionally — the static partition count
    of a not-yet-executed aggregate is the shuffle-partition constant,
    not what AQE will actually run (it coalesces a KB-sized grid to
    ONE partition at runtime), so the probe cannot see the serialization
    it needs to prevent; the exchange cost is bounded by the grid.

    Output-invariance: round-robin repartition is deterministic under
    retries (Spark sorts before distributing, SPARK-23207); every
    consumer of these frames in this repo is partitioning-invariant
    (per-row projections, unique-key tie-broken ranks, integer or
    fixpoint aggregates, array_sort-ed collect_lists).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if gated:
        # INVARIANT (every gated call site): the input is SCAN-ROOTED
        # (no exchange between the source scan and this probe), so the
        # static partition count the probe sees IS the runtime count —
        # AQE only re-plans downstream of exchanges. On an input with
        # an upstream exchange the static count could exceed
        # defaultParallelism while AQE coalesces to 1 at runtime,
        # silently defeating the floor; such inputs must use
        # gated=False (ADVICE r10). Streaming frames have no .rdd —
        # the probe fails closed (no repartition on a streaming plan).
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except PySparkException:
            return df
    return df.repartition(target)
