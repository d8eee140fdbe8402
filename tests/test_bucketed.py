"""Bucketed tables: the join on the bucket key must be shuffle-free
(no Exchange on either side) — the pay-once partitioning that makes
the store's append anti-join scale."""

import pyspark.sql.functions as F
import pytest

from vectorsearchutil_spark.plans.explain import formatted_plan
from vectorsearchutil_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    existing = docs.select(F.col("text").alias("target"), "doc_id")
    incoming = docs.limit(100).select(
        F.col("text").alias("target"), F.lit("new").alias("src")
    )
    write_bucketed(existing, "t_store", "target", num_buckets=8)
    write_bucketed(incoming, "t_batch", "target", num_buckets=8)
    yield "t_store", "t_batch"
    spark.sql("DROP TABLE IF EXISTS t_store")
    spark.sql("DROP TABLE IF EXISTS t_batch")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    store_t, batch_t = bucketed_tables
    # force the join strategy decision away from broadcast so the
    # bucket co-location is what eliminates the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, store_t).join(
            read_table(spark, batch_t), "target"
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan  # both sides pre-shuffled
        assert joined.count() == 100
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_anti_join_semantics(spark, bucketed_tables):
    store_t, batch_t = bucketed_tables
    fresh = read_table(spark, batch_t).join(
        read_table(spark, store_t), "target", "left_anti"
    )
    assert fresh.count() == 0  # all 100 incoming targets already exist
