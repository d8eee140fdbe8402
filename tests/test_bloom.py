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


def test_sized_n_bits_scales_with_keys():
    from vectorsearchutil_spark.functions.bloom import sized_n_bits

    assert sized_n_bits(100) == 8192       # floor
    assert sized_n_bits(1_000) == 16384    # 10k bits -> next pow2
    assert sized_n_bits(100_000) == 1 << 20
    # monotone and never below ~10 bits/key
    for n in (10, 819, 820, 5_000, 1_000_000):
        assert sized_n_bits(n) >= 10 * n or sized_n_bits(n) == 8192


def test_join_equivalence(spark, sides):
    big, small = sides
    got = bloom_prefiltered_join(big, small, "key")
    want = big.join(small, "key")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_filter_runs_before_shuffle(spark, sides):
    """The probe must sit below the Exchange on the big side: the
    point of the reduction is that pruned rows never shuffle.

    Structural check (ADVICE r2): find the physical node whose detail
    block carries the bloom probe (xxhash64 bit tests against the
    broadcast bit-set), then walk the plan tree upward from that node
    taking only true ancestors (strictly decreasing indentation) and
    require a shuffle Exchange among them."""
    import re

    from vectorsearchutil_spark.plans.explain import formatted_plan

    big, small = sides
    # force a shuffle join so the claim is observable
    plan = formatted_plan(
        bloom_prefiltered_join(
            big.hint("merge"), small.hint("merge"), "key"
        )
    )
    tree, _, details = plan.partition("\n\n")
    probe_ids = [
        int(m.group(1))
        for blk in details.split("\n\n")
        if "xxhash64" in blk and "bloom" in blk
        and (m := re.match(r"\((\d+)\)", blk.strip()))
    ]
    assert probe_ids, "no physical node carries the bloom probe"

    def indent(line: str) -> int:
        m = re.search(r"[A-Za-z*]", line)
        return m.start() if m else 10**9

    lines = tree.splitlines()
    pid = probe_ids[-1]
    node_at = next(
        i for i, ln in enumerate(lines) if re.search(rf"\({pid}\)\s*$", ln)
    )
    # true ancestors: walk upward, a line is an ancestor iff its
    # indent is strictly below every line between it and the node
    ancestors = []
    threshold = indent(lines[node_at])
    for ln in reversed(lines[:node_at]):
        if indent(ln) < threshold:
            ancestors.append(ln)
            threshold = indent(ln)
    assert any(
        "Exchange" in a and "BroadcastExchange" not in a for a in ancestors
    ), f"probe node {pid} has no shuffle Exchange ancestor:\n{tree}"
