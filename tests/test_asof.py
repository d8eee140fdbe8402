import pyspark.sql.functions as F

from vectorsearchutil_spark.operators.asofjoin import asof_join


def _ts(s):
    return f"2024-01-01 {s}"


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("10:00:00")), (2, 10, _ts("12:00:00")), (3, 20, _ts("09:00:00"))],
        ["id", "k", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(100, 10, _ts("09:30:00")), (101, 10, _ts("11:00:00")),
         (102, 20, _ts("09:30:00"))],
        ["rid", "k", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["id"]: r["rid_m"] for r in
           asof_join(left, right, key="k", right_payload=["rid"], suffix="_m").collect()}
    assert out[1] == 100   # most recent right at/before 10:00
    assert out[2] == 101   # 11:00 beats 09:30
    assert out[3] is None  # right at 09:30 is AFTER left 09:00


def test_asof_inclusive_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("10:00:00"))], ["id", "k", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, 5, _ts("10:00:00")), (9, 5, _ts("10:00:00"))], ["rid", "k", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = asof_join(left, right, key="k", right_payload=["rid"], suffix="_m").first()
    assert row["rid_m"] == 9  # inclusive match; tie -> highest id


def test_asof_forward_basic(spark):
    from vectorsearchutil_spark.operators.asofjoin import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10, _ts("10:00:00")), (2, 10, _ts("12:00:00")), (3, 20, _ts("09:40:00"))],
        ["id", "k", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(100, 10, _ts("09:30:00")), (101, 10, _ts("11:00:00")),
         (102, 20, _ts("09:30:00"))],
        ["rid", "k", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["id"]: r["rid_m"] for r in
           asof_join_forward(left, right, key="k",
                             right_payload=["rid"], suffix="_m").collect()}
    assert out[1] == 101   # earliest right at/after 10:00
    assert out[2] is None  # nothing after 12:00
    assert out[3] is None  # right at 09:30 is BEFORE left 09:40


def test_asof_forward_inclusive_and_ties(spark):
    from vectorsearchutil_spark.operators.asofjoin import asof_join_forward

    left = spark.createDataFrame(
        [(1, 5, _ts("10:00:00"))], ["id", "k", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, 5, _ts("10:00:00")), (9, 5, _ts("10:00:00"))], ["rid", "k", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = asof_join_forward(left, right, key="k",
                            right_payload=["rid"], suffix="_m").first()
    assert row["rid_m"] == 7  # inclusive; tie -> lowest id (mirror)
