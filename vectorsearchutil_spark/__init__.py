"""vectorsearchutil_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of stkdev/VectorSearchUtil.

The reference (``/root/reference/``, package ``vsu``) is a single-node
vector-search utility: one relational table of (target, option1..5,
vector), a faiss-backed ANN index, exact-interface kNN queries,
zero-shot classification by label-embedding similarity, and MLP
classification/regression over stored vectors
(``vsu/base/VectorSearchBase.py``).

This engine re-expresses that surface Spark-first — the store is a
Parquet-backed DataFrame, operators are pure functions
``DataFrame -> DataFrame`` built from declarative DataFrame/SQL ops so
Catalyst supplies pushdown, pruning, broadcast joins and whole-stage
codegen — and extends it with the LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis, streaming)
designed for 100 TB scale.
"""

from vectorsearchutil_spark.session import get_spark
from vectorsearchutil_spark.store import VectorStore

__version__ = "0.1.0"

__all__ = ["get_spark", "VectorStore", "__version__"]
