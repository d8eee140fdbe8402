"""Registry-wide plan lint as a permanent gate (tools/plan_lint.py is
the standalone runner): every ``queries()`` entry must compile to a
physical plan with no CartesianProduct (non-broadcast cross join on a
fact side) and no BatchEvalPython (row-at-a-time Python UDF). The 72
targeted plan pins in test_plans.py assert what good plans DO; this
sweep asserts what no plan may ever do — including every query added
later, with no per-query pin required."""

from __future__ import annotations

from vectorsearchutil_spark import queries as Q
from vectorsearchutil_spark.plans.explain import formatted_plan

SF_DIR = "/root/testdata/sf0.001"


def test_no_cartesian_or_rowwise_udf_anywhere(spark):
    bad = {}
    for name, fn in Q.QUERIES.items():
        plan = formatted_plan(fn(spark, SF_DIR))
        hits = [
            pat
            for pat in ("CartesianProduct", "BatchEvalPython")
            if pat in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"plan anti-patterns: {bad}"
