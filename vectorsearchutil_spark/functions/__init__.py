from vectorsearchutil_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
    l2_squared,
    normalize,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_distance",
    "l2_norm",
    "l2_squared",
    "normalize",
]
