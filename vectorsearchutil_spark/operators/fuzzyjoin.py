"""Edit-distance similarity self-join via deletion-neighborhood
blocking (the SymSpell scheme) — the record-linkage / entity-
resolution primitive: find every pair of rows whose string key is
within Levenshtein distance 1, WITHOUT an all-pairs comparison.

Completeness argument (why the blocking loses nothing): let D(s) be
{s} ∪ {s with one character deleted}. If lev(a, b) ≤ 1 then either
a = b (share a itself), b is a one-char edit of a (substitution at i
⇒ del_i(a) = del_i(b); insertion ⇒ a ∈ D(b); deletion ⇒ b ∈ D(a)) —
in every case D(a) ∩ D(b) ≠ ∅. Sharing a deletion signature only
bounds lev ≤ 2, so candidates are verified with the exact
``levenshtein`` built-in (JVM-side) before emission.

Scale shape: each row of length L explodes into ≤ L+1 narrow
(signature, key, s) rows; the self-join hash-partitions on the
signature — no CartesianProduct anywhere in the plan. Cost is
Σ bucket², the same contract as an LSH band join: a signature shared
by k near-identical strings yields O(k²) candidate rows, and that
quadratic term is irreducible because the OUTPUT itself is the k²
matching pairs. Candidate pairs that share several signatures
(identical strings, insert/delete of a repeated char) dedupe through
one distinct before verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_signatures(col: F.Column) -> F.Column:
    """``{s} ∪ one-char deletions of s`` as a distinct array.

    ``sequence(0, length-1)`` must be guarded: for an empty string it
    would produce a DESCENDING sequence (0 → -1), so zero-length
    inputs map to just ``[s]`` explicitly.
    """
    deletions = F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(0), F.length(col) - 1),
            lambda i: F.concat(
                col.substr(F.lit(1), i),
                col.substr(i + 2, F.length(col)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(col), deletions))


def fuzzy_pairs_ed1(
    df: DataFrame, key_col: str, str_col: str
) -> DataFrame:
    """All (key_a < key_b) pairs with ``lev(str_a, str_b) <= 1``.

    Output: (key_a, key_b, str_a, str_b, dist). Exact — see the
    module docstring for the completeness argument. Rows with a NULL
    string are ignored (NULL matches nothing, as in SQL equality).
    """
    from vectorsearchutil_spark.functions.parallel import fanout_repartition

    # parallelism floor before the signature explode + self-join
    # (guide §2): a small scan serializes the candidate stage.
    # Cached within the query (r11): the (key, string) projection is
    # referenced FOUR times — both sides of the signature self-join
    # and both re-attach joins — and a plain column rename defeats
    # ReuseExchange (the before-plan shows 4 parquet scans, 0
    # ReusedExchange), so without the cache the scan + signature
    # explode chain ran once per reference (guide §2.4).
    base = fanout_repartition(
        df.filter(F.col(str_col).isNotNull()).select(
            F.col(key_col).alias("_k"), F.col(str_col).alias("_s")
        )
    ).cache()
    # the signature join and the pair-dedup move ONLY (key, key) rows
    # — strings re-attach afterwards (measured 4.8 → 2.5 s at sf0.1:
    # the distinct over string-carrying candidates was the floor)
    sigs = base.select(
        "_k", F.explode(deletion_signatures(F.col("_s"))).alias("_sig")
    )
    cand = (
        sigs.join(sigs.select("_sig", F.col("_k").alias("_k2")), "_sig")
        .filter(F.col("_k") < F.col("_k2"))
        .select("_k", "_k2")
        .distinct()
    )
    attached = cand.join(base, "_k").join(
        base.select(F.col("_k").alias("_k2"), F.col("_s").alias("_s2")),
        "_k2",
    )
    return attached.filter(
        F.levenshtein(F.col("_s"), F.col("_s2")) <= 1
    ).select(
        F.col("_k").alias("key_a"),
        F.col("_k2").alias("key_b"),
        F.col("_s").alias("str_a"),
        F.col("_s2").alias("str_b"),
        F.levenshtein(F.col("_s"), F.col("_s2")).cast("int").alias("dist"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF cosine similarity self-join — the record-linkage
    scorer that catches token REORDERINGS and partial overlaps
    edit-distance blocking (fuzzy_pairs_ed1) cannot: "alpha beta
    gamma" vs "gamma beta alpha" scores 1.0. Fully relational sparse
    algebra — vectors never materialize:

    * the vector space is tokens with df ≤ ``max_df`` (df-capped
      stop-wording: frequent tokens carry ~zero idf AND blow the
      posting join up quadratically — one declared cap does both
      jobs, the ngram-jaccard discipline);
    * candidate = any pair sharing ≥1 surviving token, surfaced BY
      the scoring join itself (one equi-join on token, Σ df²
      bounded);
    * dot products cross partitions as FIXED-POINT longs
      (floor(w_a·w_b·2³⁰) — associative, partition-invariant);
      per-doc norms fold token-sorted (deterministic order), and
      weights round to 9dp up front so libm-vs-JVM ln() ulps cannot
      reach the quantizer.

    Returns (id_a, id_b, cosine) for pairs with rounded cosine ≥
    ``threshold``.
    """
    from pyspark.sql import Window

    from vectorsearchutil_spark.functions.text import tokens_sql

    fp = float(2**30)
    # tokens join/aggregate as 60-bit md5-prefix LONGS (the span-
    # anchor economics: 8-byte keys vs variable strings through every
    # shuffle); collisions (~distinct²/2^61) merge two tokens' mass —
    # declared, like every hash-keyed operator here, and the oracle
    # hashes identically
    toks = docs.selectExpr(
        id_col,
        f"""explode(transform({tokens_sql(text_col)},
             t -> cast(conv(substring(md5(t), 1, 15), 16, 10)
                  AS BIGINT))) AS _tok""",
    )
    tf = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfq = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = docs.select(id_col).distinct().count()
    w = (
        tf.join(dfq.filter(F.col("_df") <= int(max_df)), "_tok")
        .select(
            id_col,
            "_tok",
            F.round(
                F.col("_tf")
                * F.log(F.lit(float(n_docs)) / F.col("_df")),
                9,
            ).alias("_w"),
        )
    )
    norms = w.groupBy(id_col).agg(
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_tok", "_w"))
                    ),
                    lambda e: e["_w"] * e["_w"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("_norm")
    )
    a = w.select(
        F.col(id_col).alias("id_a"), "_tok", F.col("_w").alias("_wa")
    )
    b = w.select(
        F.col(id_col).alias("id_b"), "_tok", F.col("_w").alias("_wb")
    )
    dot = (
        a.join(b, "_tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.floor(F.col("_wa") * F.col("_wb") * F.lit(fp)).cast(
                    "long"
                )
            ).alias("_dotq")
        )
    )
    cos = (F.col("_dotq") / F.lit(fp)) / (
        F.col("_na") * F.col("_nb")
    )
    return (
        dot.join(
            F.broadcast(
                norms.select(
                    F.col(id_col).alias("id_a"),
                    F.col("_norm").alias("_na"),
                )
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                norms.select(
                    F.col(id_col).alias("id_b"),
                    F.col("_norm").alias("_nb"),
                )
            ),
            "id_b",
        )
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= float(threshold))
        .select("id_a", "id_b", "cosine")
    )
