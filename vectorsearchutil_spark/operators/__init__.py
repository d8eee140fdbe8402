from vectorsearchutil_spark.operators.knn import knn, knn_batch

__all__ = ["knn", "knn_batch"]
