"""Product quantization: encode/search semantics, recall ordering,
and the codes-only scan posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearchutil_spark.operators.knn import knn
from vectorsearchutil_spark.operators.pq import (
    adc_table,
    pq_adc_topk,
    pq_encode,
    pq_search_rerank,
    pq_train,
)
from vectorsearchutil_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=8, k=16, iterations=2)


def test_train_shapes_and_determinism(emb, books):
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(cv) == 8 for b in books for cv in b)
    # retrain on a repartitioned input → identical codebooks (the
    # sample is id-ordered, not partition-ordered)
    again = pq_train(emb.repartition(7), m=8, k=16, iterations=2)
    assert books == again


def test_encode_codes_in_range_and_qerr_nonneg(emb, books):
    enc = pq_encode(emb, books).cache()
    assert enc.count() == emb.count()
    bad = enc.filter(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c > 15))
        | (F.col("qerr") < 0)
    ).count()
    assert bad == 0
    enc.unpersist()


def test_finer_codebook_reduces_qerr(emb):
    coarse = pq_train(emb, m=8, k=2, iterations=2)
    fine = pq_train(emb, m=8, k=16, iterations=2)
    qe = lambda b: (  # noqa: E731
        pq_encode(emb, b).agg(F.avg("qerr")).first()[0]
    )
    assert qe(fine) < qe(coarse)


def test_rerank_recall_beats_adc(emb, books):
    """Exact re-rank of a 50-deep ADC shortlist must recall at least
    as much of the true top-10 as the raw ADC top-10 — and both
    should overlap the exact answer substantially."""
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    truth = {
        r["vec_id"]
        for r in knn(emb, qv, k=10, vector_col="embedding", id_col="vec_id")
        .select("vec_id")
        .collect()
    }
    codes = pq_encode(emb, books).cache()
    adc_ids = {
        r["vec_id"] for r in pq_adc_topk(codes, books, qv, k=10).collect()
    }
    rr_ids = {
        r["vec_id"]
        for r in pq_search_rerank(emb, codes, books, qv, k=10, shortlist=50)
        .select("vec_id")
        .collect()
    }
    assert len(rr_ids & truth) >= len(adc_ids & truth)
    assert len(rr_ids & truth) >= 5  # shortlist=10% of corpus recalls most
    codes.unpersist()


def test_adc_table_matches_encode_qerr(emb, books):
    """dtab lookups must reproduce the encode-side squared distances:
    a vector's ADC distance to ITSELF as query equals its qerr."""
    qv = list(emb.filter(F.col("vec_id") == 3).first()["embedding"])
    enc = pq_encode(emb, books)
    qerr = enc.filter(F.col("vec_id") == 3).first()["qerr"]
    dtab = adc_table(books, qv)
    codes = enc.filter(F.col("vec_id") == 3).first()["codes"]
    adc_self = round(sum(dtab[j][codes[j]] for j in range(8)), 4)
    assert abs(adc_self - qerr) < 1e-3


def test_adc_scan_reads_codes_only(spark, emb, books, tmp_path):
    """The production shape: ADC search over a persisted codes table
    must not touch the raw vector column at all."""
    from vectorsearchutil_spark.plans.explain import formatted_plan

    path = str(tmp_path / "codes.parquet")
    pq_encode(emb, books).write.mode("overwrite").parquet(path)
    codes = spark.read.parquet(path)
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    plan = formatted_plan(pq_adc_topk(codes, books, qv, k=10))
    assert "embedding" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
