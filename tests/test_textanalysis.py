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


def test_chunking_covers_all_tokens(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = ta.chunk_documents(docs, chunk_tokens=20, stride=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 25 tokens → chunks at 0,10,20 (sizes 20,15,5)
    assert sorted(r["n_chunk_tokens"] for r in by_doc[1]) == [5, 15, 20]
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [2]
    assert 3 not in by_doc  # empty doc → no chunks


def test_normalize_idempotent(spark):
    docs = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! 42 "), (2, "hello world 42")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["clean_hash"] for r in ta.normalize_text(docs).collect()}
    assert out[1] == out[2]  # normalization collapses to identical content


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith@corp.example.com today"),
            (2, "call +1-555-0199 or +1-555-0200"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ta.redact_pii(df).collect()}
    assert out[1]["n_pat0"] == 1 and "<EMAIL>" in out[1]["redacted"]
    assert "bob" not in out[1]["redacted"]
    assert out[2]["n_pat1"] == 2 and out[2]["redacted"].count("<PHONE>") == 2
    assert out[3]["redacted"] == "nothing sensitive here"


def test_hashed_tfidf_sparse(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )
    rows = ta.hashed_tfidf(df, n_buckets=8).collect()
    # every weight positive; doc 1's 'a' bucket outweighs doc 2's
    # ('a' has tf 2 there, same idf)
    assert all(r["weight"] > 0 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    shared = set(by_doc[1]) & set(by_doc[2])
    assert any(by_doc[1][b] > by_doc[2][b] for b in shared)


def test_pack_context_windows(spark):
    # 3 docs of 100 tokens each, capacity 64: doc boundaries straddle
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 100)) for i in range(3)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in ta.pack_context_windows(df, capacity=64).collect()
    }
    assert out[0]["start_offset"] == 0 and out[0]["first_window"] == 0
    assert out[0]["last_window"] == 1  # tokens 0..99 → windows 0,1
    assert out[1]["start_offset"] == 100
    assert out[1]["first_window"] == 1 and out[1]["last_window"] == 3
    assert out[2]["n_windows"] == out[2]["last_window"] - out[2]["first_window"] + 1


def test_pack_bins_next_fit(spark):
    rows = [
        (1, " ".join(["w"] * 30), "s1"),
        (2, " ".join(["w"] * 30), "s1"),   # fits with doc 1 (60 <= 64)
        (3, " ".join(["w"] * 10), "s1"),   # 70 > 64 → new bin
        (4, " ".join(["w"] * 100), "s1"),  # oversized → own bin
        (5, " ".join(["w"] * 5), "s2"),    # independent group
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r
        for r in ta.pack_bins_next_fit(df, capacity=64).collect()
    }
    assert out[1]["bin_idx"] == 0 and out[2]["bin_idx"] == 0
    assert out[2]["bin_fill"] == 60
    assert out[3]["bin_idx"] == 1
    assert out[4]["bin_idx"] == 2 and out[4]["bin_fill"] == 100
    assert out[5]["bin_idx"] == 0


def test_pack_bins_ffd_valid_and_tighter(spark):
    """FFD: every bin within capacity (except single-oversized-doc
    bins), deterministic under repartitioning, and never MORE bins
    than next-fit on the same input (the point of sorting
    decreasing)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, "g" + str(i % 2), " ".join("w" for _ in range(rng.randint(5, 60))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    cap = 64

    ffd = ta.pack_bins_first_fit_decreasing(df, capacity=cap)
    nf = ta.pack_bins_next_fit(df, capacity=cap)

    got = [
        (r["source"], r["bin_idx"], r["bin_fill"])
        for r in ffd.collect()
    ]
    # bin_fill after final placement per bin = the bin's total
    final_fill = {}
    for s, b, fill in got:
        final_fill[(s, b)] = max(final_fill.get((s, b), 0), fill)
    assert all(v <= cap for v in final_fill.values())

    def n_bins(out):
        per = {}
        for r in out.collect():
            per[r["source"]] = max(per.get(r["source"], -1), r["bin_idx"])
        return {k: v + 1 for k, v in per.items()}

    ffd_bins, nf_bins = n_bins(ffd), n_bins(nf)
    assert all(ffd_bins[s] <= nf_bins[s] for s in nf_bins)

    again = ta.pack_bins_first_fit_decreasing(
        df.repartition(8), capacity=cap
    )
    assert sorted(
        tuple(r) for r in again.collect()
    ) == sorted(tuple(r) for r in ffd.collect())


def test_bigram_logprob_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "x"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ta.bigram_logprob(df).collect()}
    # corpus: C(a,b)=2 C(b,a)=1 C(a,a)=1; C1(a)=3 C1(b)=1; V=3
    # doc1 bigrams (a,b)(b,a)(a,b): ln(3/6), ln(2/4), ln(3/6) = ln .5 each
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == round(math.log(0.5), 4)
    # doc2 bigram (a,a): ln((1+1)/(3+3))
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_logprob"] == round(math.log(1 / 3), 4)
    # <2-token docs produce no bigram rows
    assert 3 not in out and 4 not in out


def test_vocab_oov_stats(spark):
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "b b a d"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ta.vocab_oov_stats(df, vocab_k=2).collect()}
    # counts a=3 b=3 c=1 d=1 -> top-2 vocab {a, b}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[1]["oov_ratio"] == 0.25
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 1
    assert out[2]["oov_ratio"] == 0.25
    assert 3 not in out  # empty doc -> no token rows


def test_bigram_logprob_partition_invariant(spark):
    rows = [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} w{i % 2}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(tuple(r) for r in ta.bigram_logprob(df).collect())
    b = sorted(tuple(r) for r in ta.bigram_logprob(df.repartition(8)).collect())
    assert a == b


def test_token_pmi_hand_computed(spark):
    import math

    # docs: {a,b} x3, {a,c} x2, {b,c} x1 -> N=6
    rows = [
        (1, "a b"), (2, "a b"), (3, "b a"),
        (4, "a c"), (5, "c a"), (6, "b c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["w1"], r["w2"]): r
        for r in ta.token_pmi_pairs(df, vocab_k=10, min_support=1).collect()
    }
    # df(a)=5 df(b)=4 df(c)=3; n_ab=3 n_ac=2 n_bc=1
    assert out[("a", "b")]["n_ab"] == 3
    assert out[("a", "b")]["pmi"] == round(math.log(3 * 6 / (5 * 4)), 4)
    assert out[("a", "c")]["pmi"] == round(math.log(2 * 6 / (5 * 3)), 4)
    assert out[("b", "c")]["pmi"] == round(math.log(1 * 6 / (4 * 3)), 4)


def test_token_pmi_vocab_cap_and_support(spark):
    rows = [(i, "a b rare%d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # vocab_k=2 -> only {a,b} survive; rare tokens never form pairs
    out = ta.token_pmi_pairs(df, vocab_k=2, min_support=2).collect()
    assert [(r["w1"], r["w2"], r["n_ab"]) for r in out] == [("a", "b", 10)]
    # min_support above n_ab -> empty
    assert ta.token_pmi_pairs(df, vocab_k=2, min_support=11).count() == 0


def test_gopher_repetition_hand_computed(spark):
    """Hand-verifiable repetition: 'a b a b a b' → top 2-gram 'a b'
    ×3 of 5 grams, frac 2·3/6 = 1.0; dup-5-gram coverage counts
    overlapping repeats once."""
    from vectorsearchutil_spark.operators.textanalysis import (
        gopher_repetition_signals,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),                     # 6 tokens
            (2, "x1 x2 x3 x4 x5 x6 x7 x8"),        # all distinct
            (3, "p q r s t p q r s t"),            # 5-gram repeated, disjoint
            (4, "w w w w w w w"),                   # 7 tokens, overlapping dups
            (5, "solo"),                            # too short for both
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["top_2gram_frac"],
            r["dup_5gram_frac"],
        )
        for r in gopher_repetition_signals(docs).collect()
    }
    assert got[1] == (6, 1.0, 0.0)          # no repeated 5-gram
    assert got[2][1] < 0.3 and got[2][2] == 0.0
    # doc 3: "p q r s t" at pos 0 and 5 → covers [0,4] and [5,9] = all 10
    assert got[3] == (10, round(2 * 2 / 10, 6), 1.0)
    # doc 4: all 3 5-grams identical ("w w w w w") at 0,1,2 → union [0,6] = 7
    assert got[4] == (7, round(2 * 6 / 7, 6), 1.0)
    assert got[5] == (1, 0.0, 0.0)
