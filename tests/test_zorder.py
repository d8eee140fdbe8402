"""Z-order layout: key correctness and the pruning property that
justifies it — per-partition stats stay selective for range
predicates on EITHER interleaved column."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearchutil_spark.functions.zorder import (
    zorder_by,
    zorder_key_sql,
)


def _morton(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    pts = [(3, 5), (65535, 0), (0, 65535), (12345, 54321), (256, 255)]
    df = spark.createDataFrame(pts, ["a", "b"]).selectExpr(
        "a", "b", f"{zorder_key_sql('a', 'b')} AS z"
    )
    for r in df.collect():
        assert r["z"] == _morton(r["a"], r["b"])


def test_zorder_layout_prunes_on_either_column(spark):
    """256x256 grid into 16 partitions. Linear (a-sorted) layout: a
    predicate on b alone touches EVERY partition. Z-ordered layout:
    partitions are compact z-tiles, so the same predicate touches at
    most half — the mechanism file-level min/max skipping exploits."""
    grid = spark.range(0, 256 * 256).selectExpr(
        "CAST(id % 256 AS BIGINT) AS a", "CAST(id DIV 256 AS BIGINT) AS b"
    )

    def partitions_touched(df, pred):
        # per-partition bounding boxes, then count boxes intersecting
        # the predicate's rectangle — the stats-pruning decision
        boxes = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                F.min("a").alias("a_lo"), F.max("a").alias("a_hi"),
                F.min("b").alias("b_lo"), F.max("b").alias("b_hi"),
            )
            .collect()
        )
        (a_lo, a_hi), (b_lo, b_hi) = pred
        return sum(
            1
            for r in boxes
            if not (
                r["a_hi"] < a_lo or r["a_lo"] > a_hi
                or r["b_hi"] < b_lo or r["b_lo"] > b_hi
            )
        ), len(boxes)

    linear = grid.repartitionByRange(16, "a").sortWithinPartitions("a")
    zordered = zorder_by(grid, "a", "b", partitions=16)

    pred_on_b = ((0, 255), (96, 127))  # all a, narrow b strip
    lin_hit, lin_total = partitions_touched(linear, pred_on_b)
    z_hit, z_total = partitions_touched(zordered, pred_on_b)
    assert lin_hit == lin_total  # linear layout cannot prune on b
    assert z_hit <= z_total // 2  # z-layout prunes most partitions

    # z-ranges per partition are disjoint (range partitioning on the
    # key) — the property that makes per-file stats monotone
    zb = (
        zordered.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, nxt in zip(zb, zb[1:]):
        assert prev["hi"] < nxt["lo"]
