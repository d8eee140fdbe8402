import pyspark.sql.functions as F

from vectorsearchutil_spark.functions.skew import (
    salted_broadcast_join,
    salted_sum_count,
)


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = {
        r["l_returnflag"]: (r["sum_l_quantity"], r["n_rows"])
        for r in salted_sum_count(li, ["l_returnflag"], "l_quantity").collect()
    }
    plain = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert abs(salted[k][0] - plain[k][0]) < 1e-6


def test_salted_join_matches_plain(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = o.join(c, "c_custkey").count()
    salted = salted_broadcast_join(o, c, "c_custkey").count()
    assert salted == plain
