import pyspark.sql.functions as F

from vectorsearchutil_spark.operators.clustering import kmeans
from vectorsearchutil_spark.sources.readers import load_table


def test_kmeans_partitions_all_rows(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assignments, centroids = kmeans(emb, k=5, iterations=2)
    assert assignments.count() == emb.count()
    assert centroids.count() <= 5
    assert assignments.select("cluster").distinct().count() <= 5


def test_kmeans_inertia_decreases(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()

    def inertia(iters):
        a, _ = kmeans(emb, k=5, iterations=iters)
        return a.agg(F.sum(F.col("distance") ** 2)).first()[0]

    assert inertia(3) <= inertia(1) + 1e-6  # Lloyd's never increases inertia
