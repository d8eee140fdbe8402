import itertools
import random

from vectorsearchutil_spark.operators.fuzzyjoin import fuzzy_pairs_ed1


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[:], i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return d[len(b)]


def _brute(rows):
    return sorted(
        (a[0], b[0], a[1], b[1], _lev(a[1], b[1]))
        for a, b in itertools.combinations(rows, 2)
        if _lev(a[1], b[1]) <= 1
    )


def test_fuzzy_pairs_matches_brute_force_random(spark):
    rng = random.Random(42)
    alphabet = "abc"  # small alphabet -> dense near-pairs
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6))))
        for i in range(80)
    ]
    # distinct strings can repeat across keys (identical pairs: dist 0)
    df = spark.createDataFrame(rows, ["k", "s"])
    got = sorted(tuple(r) for r in fuzzy_pairs_ed1(df, "k", "s").collect())
    assert got == _brute(rows)
    assert any(r[4] == 0 for r in got)  # repeats exist at this density
    assert any(r[4] == 1 for r in got)


def test_fuzzy_pairs_null_and_empty(spark):
    rows = [(1, None), (2, ""), (3, "a"), (4, None)]
    df = spark.createDataFrame(rows, "k int, s string")
    got = sorted(tuple(r) for r in fuzzy_pairs_ed1(df, "k", "s").collect())
    assert got == [(2, 3, "", "a", 1)]  # NULLs match nothing


def test_fuzzy_pairs_partition_invariant(spark):
    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("xy") for _ in range(rng.randint(1, 5))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["k", "s"])
    a = sorted(tuple(r) for r in fuzzy_pairs_ed1(df, "k", "s").collect())
    b = sorted(
        tuple(r)
        for r in fuzzy_pairs_ed1(df.repartition(16), "k", "s").collect()
    )
    assert a == b


def test_fuzzy_pairs_no_cartesian_plan(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], ["k", "s"])
    plan = fuzzy_pairs_ed1(df, "k", "s")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_diff_statuses(spark):
    from vectorsearchutil_spark.operators.diffing import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s"), (3, "c", "s"), (4, None, "s")],
        "doc_id int, text string, source string",
    )
    new = spark.createDataFrame(
        [(2, "b", "s"), (3, "C", "s"), (4, None, "s"), (5, "e", "s")],
        "doc_id int, text string, source string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed", 2: "unchanged", 3: "changed",
        4: "unchanged", 5: "added",
    }


def test_corpus_diff_null_vs_empty_not_confused(spark):
    from vectorsearchutil_spark.operators.diffing import corpus_diff

    old = spark.createDataFrame(
        [(1, None, "x")], "doc_id int, text string, source string"
    )
    new = spark.createDataFrame(
        [(1, "", "x")], "doc_id int, text string, source string"
    )
    (row,) = corpus_diff(old, new).collect()
    assert row["status"] == "changed"  # NULL != '' under the sentinel


def test_tfidf_cosine_catches_reordering(spark):
    """Token reordering scores 1.0; unrelated docs never pair; the
    result is partitioning-invariant bitwise."""
    from vectorsearchutil_spark.operators.fuzzyjoin import (
        tfidf_cosine_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha"),      # reordered → cos 1.0
            (3, "alpha beta zeta eta"),          # partial overlap
            (4, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.05).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (1, 4) not in got and (2, 4) not in got
    # the shared tokens (alpha, beta) are the LOW-idf ones — the
    # overlap scores weakly by design: idf down-weights what is
    # common. Hand value: 2·ln(4/3)² / (1.0613 · 2.0024) ≈ 0.078
    assert 0.05 <= got[(1, 3)] < 0.12
    again = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            df.repartition(7), threshold=0.05
        ).collect()
    }
    assert again == got
