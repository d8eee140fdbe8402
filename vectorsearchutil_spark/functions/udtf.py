"""Python UDTFs — the table-function surface (one input row → many
output rows with their own schema).

Completes the UDF-surface inventory alongside iterator pandas UDFs
(embedders.py) and mapInPandas (similarity/multimodal): scalar UDF,
grouped-map, map-batches, and table functions. A UDTF is the right
shape when row expansion has per-row logic that array explode can't
express (stateful per-row parsing, variable schemas).

Registered for SQL use via ``register_udtfs`` →
``SELECT * FROM sentence_chunks('...', 5)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk: string, n_words: int")
class SentenceChunks:
    """Split text into word chunks of a requested size — the UDTF
    twin of textanalysis.chunk_documents (which stays the hot-path
    implementation: pure expressions beat Python row expansion; this
    exists for ad-hoc SQL use and as the UDTF surface exemplar)."""

    def eval(self, text: str, chunk_words: int):
        if not text:
            return
        words = [w for w in text.split(" ") if w]
        size = max(int(chunk_words), 1)
        for i in range(0, len(words), size):
            piece = words[i : i + size]
            yield i // size, " ".join(piece), len(piece)


def register_udtfs(spark: SparkSession) -> None:
    """Make the UDTFs callable from SQL."""
    spark.udtf.register("sentence_chunks", SentenceChunks)
