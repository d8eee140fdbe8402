from vectorsearchutil_spark.plans.explain import (
    assert_no_cartesian,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)

__all__ = [
    "assert_no_cartesian",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
]
