"""CSV source + the reference's sample ingest flow (A20 → A1 → A6):
users rename domain columns onto the fixed store slots
(vsu/sample/main.py:104-111) and query."""

import os

import pyspark.sql.functions as F

from vectorsearchutil_spark.sources.readers import load_csv, load_table
from vectorsearchutil_spark.store import VectorStore

CSV = os.path.join(os.path.dirname(__file__), "data", "sample_docs.csv")


def test_load_csv_schema(spark):
    df = load_csv(spark, CSV)
    assert df.columns == ["title", "author", "year"]
    assert df.count() == 12


def test_sample_flow_rename_ingest_query(spark):
    # the reference's check() flow: rename → set_data → query
    df = load_csv(spark, CSV).withColumnsRenamed(
        {"title": "target", "author": "option1"}
    )
    store = VectorStore(spark)
    store.set_data(df)
    assert store.count() == 12
    res = store.query("pigeon homing behavior in urban areas", k=3)
    rows = res.collect()
    assert rows[0]["target"] == "pigeon homing behavior in urban areas"
    assert rows[0]["option1"] == "ito"
    # extra column 'year' projected away (VectorSearchBase.py:124-126)
    assert "year" not in res.columns


def test_append_flow_no_double_registration(spark):
    # sample1_2_add semantics (vsu/sample/main.py:31-54)
    df = load_csv(spark, CSV).withColumnsRenamed(
        {"title": "target", "author": "option1"}
    )
    store = VectorStore(spark)
    store.set_data(df.limit(8))
    store.set_data(df, append=True)  # overlaps the first 8
    assert store.count() == 12


def test_binary_file_source(spark):
    from vectorsearchutil_spark.sources.readers import load_binary_files

    df = load_binary_files(spark, os.path.dirname(CSV), glob="*.csv")
    row = df.first()
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    assert row["length"] > 0
    assert bytes(row["content"]).startswith(b"title,author,year")


def test_jsonl_roundtrip_with_schema(spark, sf_dir, tmp_path):
    from vectorsearchutil_spark.sources.readers import (
        load_jsonl,
        load_table,
        write_jsonl,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = load_jsonl(spark, path, schema=docs.schema)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_orc_roundtrip_pushdown(spark, sf_dir, tmp_path):
    from vectorsearchutil_spark.plans.explain import pushed_filters
    from vectorsearchutil_spark.sources.readers import (
        load_orc,
        load_table,
        write_orc,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = load_orc(spark, path).filter("doc_id < 10")
    assert back.count() == docs.filter("doc_id < 10").count()
    # predicate reaches the ORC scan like parquet
    assert "doc_id" in " ".join(pushed_filters(back))
