import pytest

from vectorsearchutil_spark.operators import textanalysis as ta


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "der hund und die katze ist da"),
        (3, "xyzzy plugh"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_stats(docs):
    stats = {r["doc_id"]: r for r in ta.token_stats(docs).collect()}
    assert stats[1]["n_tokens"] == 6
    assert stats[1]["n_unique"] == 5  # 'the' twice
    assert stats[4]["n_tokens"] == 0


def test_quality_score_bounds(docs):
    for r in ta.quality_score(docs).collect():
        if r["n_tokens"] > 0:
            assert 0.0 <= r["quality_score"] <= 1.0
            assert 0.0 <= r["stop_ratio"] <= 1.0


def test_langid(docs):
    preds = {r["doc_id"]: r["pred_lang"] for r in ta.language_id(docs).collect()}
    assert preds[1] == "en"
    assert preds[2] == "de"
    assert preds[3] == "und"  # no markers at all
    assert preds[4] == "und"


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in ta.fingerprints(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_top_tokens(docs):
    top = ta.top_tokens(docs, k=3).collect()
    assert top[0]["token"] == "the" and top[0]["freq"] == 2
    # ties broken by token ascending
    freqs = [r["freq"] for r in top]
    assert freqs == sorted(freqs, reverse=True)
