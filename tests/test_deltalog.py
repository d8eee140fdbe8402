"""Delta Lake ACID backend (sources/deltalog.py) — the ManifestLog
contract run against the production table format. The delta-spark
dependency is not part of this container, so the contract tests skip
cleanly here; they are executable in any environment that has it. The
import-guard test runs everywhere."""

from __future__ import annotations

import pytest

from vectorsearchutil_spark.sources.deltalog import delta_available

needs_delta = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed"
)


@pytest.fixture()
def log(tmp_path):
    from vectorsearchutil_spark.sources.deltalog import DeltaLog

    return DeltaLog(str(tmp_path / "delta"))


@needs_delta
def test_roundtrip_and_append(spark, log):
    log.write_and_commit(spark.createDataFrame([(1,)], ["x"]))
    log.write_and_commit(spark.createDataFrame([(2,)], ["x"]), mode="append")
    assert sorted(r["x"] for r in log.read(spark).collect()) == [1, 2]


@needs_delta
def test_replace_wipes(spark, log):
    log.write_and_commit(spark.createDataFrame([(1,)], ["x"]))
    log.write_and_commit(spark.createDataFrame([(9,)], ["x"]), mode="replace")
    assert [r["x"] for r in log.read(spark).collect()] == [9]


@needs_delta
def test_time_travel(spark, log):
    v0 = log.write_and_commit(spark.createDataFrame([(1,)], ["x"]))
    log.write_and_commit(spark.createDataFrame([(2,)], ["x"]), mode="append")
    assert [r["x"] for r in log.read(spark, version=v0).collect()] == [1]


@needs_delta
def test_read_absent_table_is_none(spark, log):
    assert log.read(spark) is None


@needs_delta
def test_store_on_delta_backend(spark, tmp_path):
    from vectorsearchutil_spark.store import VectorStore

    store = VectorStore(
        spark, acid_path=str(tmp_path / "store"), acid_format="delta"
    )
    df = spark.createDataFrame([("a", "1")], ["target", "option1"])
    store.set_data(df)
    store.set_data(
        spark.createDataFrame([("b", "2")], ["target", "option1"]),
        append=True,
    )
    reopened = VectorStore(
        spark, acid_path=str(tmp_path / "store"), acid_format="delta"
    )
    assert {r["target"] for r in reopened.data.collect()} == {"a", "b"}


def test_deltalog_guard_message(monkeypatch):
    """Without delta-spark, DeltaLog must raise a clear ImportError
    pointing at the manifest fallback (runs in both environments)."""
    import vectorsearchutil_spark.sources.deltalog as dl

    monkeypatch.setattr(dl, "delta_available", lambda spark=None: False)
    with pytest.raises(ImportError, match="manifest"):
        dl.DeltaLog("/tmp/x")
