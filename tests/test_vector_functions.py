import math

import pyspark.sql.functions as F
import pytest

from vectorsearchutil_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["id", "a", "b"]
    )


def test_dot(vec_df):
    assert vec_df.select(dot("a", "b").alias("d")).first()["d"] == 32.0


def test_l2(vec_df):
    got = vec_df.select(l2_distance("a", "b").alias("d")).first()["d"]
    assert got == pytest.approx(math.sqrt(27.0))


def test_norm(vec_df):
    got = vec_df.select(l2_norm("a").alias("n")).first()["n"]
    assert got == pytest.approx(math.sqrt(14.0))


def test_cosine(vec_df):
    got = vec_df.select(cosine_similarity("a", "b").alias("c")).first()["c"]
    assert got == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))


def test_cosine_orthogonal(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0], [0.0, 1.0])], ["id", "a", "b"])
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] == 0.0


def test_float_input_promoted(spark):
    # float32 parquet arrays must be computed at double precision
    df = spark.createDataFrame([(1, [0.1, 0.2])], ["id", "a"])
    df = df.withColumn("a32", F.col("a").cast("array<float>"))
    d = df.select(l2_norm("a32").alias("n")).first()["n"]
    assert isinstance(d, float)
