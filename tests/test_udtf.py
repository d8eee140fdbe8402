import pyspark.sql.functions as F

from vectorsearchutil_spark.functions.udtf import SentenceChunks, register_udtfs


def test_udtf_direct_call(spark):
    out = SentenceChunks(F.lit("a b c d e"), F.lit(2)).collect()
    assert [(r["chunk_idx"], r["chunk"], r["n_words"]) for r in out] == [
        (0, "a b", 2),
        (1, "c d", 2),
        (2, "e", 1),
    ]


def test_udtf_sql_lateral_join(spark, sf_dir):
    register_udtfs(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("docs_v")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_words
        FROM docs_v d, LATERAL sentence_chunks(d.text, 50) c
        WHERE d.doc_id < 3
        """
    )
    rows = out.collect()
    assert len(rows) >= 3  # every doc produces at least one chunk
    assert all(r["n_words"] <= 50 for r in rows)


def test_udtf_empty_input(spark):
    assert SentenceChunks(F.lit(""), F.lit(3)).count() == 0
