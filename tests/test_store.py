import pyspark.sql.functions as F
import pytest

from vectorsearchutil_spark.store import SAVE_COLUMNS, VectorStore


@pytest.fixture()
def store(spark):
    return VectorStore(spark)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["target", "option1"])


def test_empty_store_query_returns_none(store):
    # reference guard: VectorSearchBase.py:209-210
    assert store.query("anything") is None


def test_set_data_requires_target(store, spark):
    df = spark.createDataFrame([("x",)], ["not_target"])
    store.set_data(df)  # silent no-op per VectorSearchBase.py:104-105
    assert store._df is None


def test_first_wins_dedup(store, spark):
    store.set_data(_df(spark, [("a", "first"), ("b", "y"), ("a", "second")]))
    rows = {r["target"]: r["option1"] for r in store.data.collect()}
    assert rows == {"a": "first", "b": "y"}


def test_append_never_overwrites(store, spark):
    # reference insert-if-absent: VectorSearchBase.py:79-87;
    # demonstrated in sample1_2_add (vsu/sample/main.py:31-54)
    store.set_data(_df(spark, [("a", "orig"), ("b", "y")]))
    store.set_data(_df(spark, [("a", "NEW"), ("c", "z")]), append=True)
    rows = {r["target"]: r["option1"] for r in store.data.collect()}
    assert rows == {"a": "orig", "b": "y", "c": "z"}


def test_ids_monotonic_and_continue_on_append(store, spark):
    store.set_data(_df(spark, [("a", "1"), ("b", "2")]))
    store.set_data(_df(spark, [("c", "3")]), append=True)
    ids = {r["target"]: r["id"] for r in store.data.collect()}
    assert sorted(ids.values()) == [1, 2, 3]
    assert ids["c"] == 3


def test_replace_wipes(store, spark):
    store.set_data(_df(spark, [("a", "1"), ("b", "2")]))
    store.set_data(_df(spark, [("c", "3")]))
    assert [r["target"] for r in store.data.collect()] == ["c"]


def test_query_returns_k_with_distance(store, spark):
    store.set_data(_df(spark, [("aa", "1"), ("bb", "2"), ("cc", "3")]))
    res = store.query("aa", k=2)
    rows = res.collect()
    assert len(rows) == 2
    assert rows[0]["target"] == "aa"  # self-match first
    assert rows[0]["distance"] == pytest.approx(0.0, abs=1e-5)
    assert list(res.columns) == ["id"] + SAVE_COLUMNS + ["distance"]


def test_query_with_info_drops_all_null_columns(store, spark):
    # reference A7: VectorSearchBase.py:215-217
    store.set_data(_df(spark, [("aa", "1"), ("bb", None)]))
    res = store.query_with_info("aa", k=2)
    assert "option2" not in res.columns
    assert "option1" in res.columns


def test_reset(store, spark):
    store.set_data(_df(spark, [("a", "1")]))
    store.reset_db()
    assert store.query("a") is None


def test_zeroshot_pred(store, spark):
    store.set_data(_df(spark, [("alpha", "1"), ("beta", "2"), ("alpha two", "3")]))
    store.set_zeroshot_labels(["alpha", "beta"])
    out = store.do_zeroshot()
    preds = {r["target"]: r["zeroshot_pred"] for r in out.collect()}
    assert preds["alpha"] == "alpha"  # self-embedding most similar
    assert preds["beta"] == "beta"
    assert set(out.columns) >= set(["id", "target", "zeroshot_pred", "score"])


def test_zeroshot_softmax_probs(store, spark):
    store.set_data(_df(spark, [("alpha", "1"), ("beta", "2")]))
    store.set_zeroshot_labels(["alpha", "beta"])
    out = store.do_zeroshot(variant="clip")
    for r in out.collect():
        assert 0.0 <= r["prob"] <= 1.0


def test_parquet_persistence_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store.parquet")
    vs = VectorStore(spark, path=path)
    vs.set_data(_df(spark, [("a", "1"), ("b", "2")]))
    # a fresh store object on the same path sees the data
    vs2 = VectorStore(spark, path=path)
    assert vs2.count() == 2
    res = vs2.query("a", k=1)
    assert res.first()["target"] == "a"
    # append persists too
    vs2.set_data(_df(spark, [("c", "3")]), append=True)
    assert VectorStore(spark, path=path).count() == 3


def test_crash_mid_swap_recovers(spark, tmp_path):
    # ADVICE r1: append must never leave the store unrecoverable.
    # Simulate every crash point of _persist's staged swap and check
    # a fresh open heals to a complete version.
    import os
    import shutil

    path = str(tmp_path / "store.parquet")
    vs = VectorStore(spark, path=path)
    vs.set_data(_df(spark, [("a", "1"), ("b", "2")]))

    # crash point 1: staging fully written, live dir renamed away
    # (the gap between the two renames)
    shutil.copytree(path, path + "__staging")
    os.rename(path, path + "__old")
    vs2 = VectorStore(spark, path=path)
    assert vs2.count() == 2
    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")

    # crash point 2: staging incomplete (no _SUCCESS), live renamed —
    # must roll back to __old, not adopt the torn staging copy
    shutil.copytree(path, path + "__staging")
    os.remove(os.path.join(path + "__staging", "_SUCCESS"))
    os.rename(path, path + "__old")
    vs3 = VectorStore(spark, path=path)
    assert vs3.count() == 2
    assert not os.path.exists(path + "__staging")


def test_no_label_tower_disables_zeroshot(spark):
    # A10 (vsu/image/_classes.py:69-70): embedders without a text
    # tower return None from do_zeroshot
    from vectorsearchutil_spark.embedders import register_embedder
    import pandas as pd

    if "notower" not in __import__(
        "vectorsearchutil_spark.embedders", fromlist=["embedder_names"]
    ).embedder_names():
        @register_embedder("notower", 4, supports_zeroshot=False)
        def _factory():
            def encode(s: pd.Series) -> pd.Series:
                return s.map(lambda t: [1.0, 0.0, 0.0, 0.0])
            return encode

    vs = VectorStore(spark, embedder="notower")
    vs.set_data(_df(spark, [("a", "1")]))
    vs.set_zeroshot_labels(["x", "y"])
    assert vs.do_zeroshot() is None


# -- bucketed-table mode: the 100 TB ingest posture -------------------


@pytest.fixture()
def bucketed_store(spark):
    spark.sql("DROP TABLE IF EXISTS vs_bucketed")
    vs = VectorStore(spark, table="vs_bucketed", num_buckets=4)
    yield vs
    spark.sql("DROP TABLE IF EXISTS vs_bucketed")


def test_bucketed_append_semantics(bucketed_store, spark):
    vs = bucketed_store
    vs.set_data(_df(spark, [("a", "orig"), ("b", "y")]))
    vs.set_data(_df(spark, [("a", "NEW"), ("c", "z")]), append=True)
    rows = {r["target"]: r["option1"] for r in vs.data.collect()}
    assert rows == {"a": "orig", "b": "y", "c": "z"}
    ids = {r["target"]: r["id"] for r in vs.data.collect()}
    assert sorted(ids.values()) == [1, 2, 3]
    # survives a fresh handle (persisted, not cached)
    vs2 = VectorStore(spark, table="vs_bucketed")
    assert vs2.count() == 3


def test_bucketed_append_no_exchange_on_store_side(bucketed_store, spark):
    from vectorsearchutil_spark.plans.explain import formatted_plan

    vs = bucketed_store
    vs.set_data(_df(spark, [(f"t{i}", "x") for i in range(50)]))
    incoming = _df(spark, [("t1", "x"), ("new1", "x")])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        anti = incoming.join(vs.data.select("target"), "target", "left_anti")
        plan = formatted_plan(anti)
        # bucketed scan is pre-partitioned by target: exactly one
        # Exchange total, on the incoming side — the store never
        # reshuffles
        import re

        assert "Bucketed: true" in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_reset_drops_table(bucketed_store, spark):
    vs = bucketed_store
    vs.set_data(_df(spark, [("a", "1")]))
    vs.reset_db()
    assert not spark.catalog.tableExists("vs_bucketed")
    assert vs.query("a") is None


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    import glob

    path = str(tmp_path / "store.parquet")
    vs = VectorStore(spark, path=path)
    # many tiny appends fragment the store
    for i in range(4):
        vs.set_data(
            _df(spark, [(f"t{i}a", "x"), (f"t{i}b", "y")]), append=(i > 0)
        )
    before = vs.data.collect()
    vs.compact(target_files=1)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 1
    after = VectorStore(spark, path=path).data.collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
