"""Text-analysis operators for training-data pipelines (north-star
scope): token statistics, quality scoring, heuristic language ID,
content fingerprinting, corpus token histograms.

Everything is built-in-function expressions over whitespace tokens —
no Python UDF in any hot path — so each operator is one narrow
pass + (at most) one aggregate shuffle, and each is reproducible in
the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.text import (
    distinct_tokens,
    doc_fingerprint,
    shingles_of_tokens,
    tokens,
    tokens_sql,
)
from vectorsearchutil_spark.functions.vector import round_half_up

#: Tiny per-language stopword lists for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "zu", "ist"],
    "en": ["the", "a", "of", "and", "to", "is"],
    "es": ["el", "la", "de", "y", "que", "es"],
    "fr": ["le", "la", "de", "et", "les", "est"],
    "zh": ["de", "le", "shi", "bu", "wo", "zai"],
}

#: Stopwords for the quality score (generic English function words).
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "is", "in", "on"]


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token counts: n_tokens, n_unique, avg_token_len."""
    toks = tokens(F.col(text_col))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        # empty doc → NULL (ANSI mode raises on /0 otherwise)
        F.round(F.try_divide(total_len, F.size(toks)), 4).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality score in [0,1]: rewards length (saturating
    at 100 tokens) and penalizes stopword-heavy text. The standard
    cheap pre-filter before expensive model-based scoring."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = F.try_divide(n_stop, n_tokens)  # NULL for empty docs
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (1.0 - stop_ratio), 4
        ).alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: count distinct marker-word hits per
    language, argmax with alphabetical tie-break; 'und' (undetermined)
    when nothing matches.

    Plan: the marker lists are tiny compile-time constants, so the
    whole operator is ONE narrow projection — per language,
    ``size(array_intersect(doc_tokens, markers))``; argmax over a
    struct array (hits desc, language asc on ties). Zero shuffles,
    zero joins: at 100 TB this runs at scan speed. (The broadcast-
    join formulation is only needed when the marker table is dynamic.)
    """
    langs = sorted(LANG_MARKERS)  # alphabetical → tie-break = lowest idx
    toks = df.select(
        F.col(id_col), distinct_tokens(F.col(text_col)).alias("_toks")
    )
    scored = toks.select(
        F.col(id_col),
        F.array(
            *[
                F.struct(
                    F.size(
                        F.array_intersect(
                            F.col("_toks"),
                            F.array(*[F.lit(w) for w in LANG_MARKERS[lang]]),
                        )
                    ).alias("hits"),
                    F.lit(-i).alias("negidx"),
                )
                for i, lang in enumerate(langs)
            ]
        ).alias("_scores"),
    )
    best = scored.select(
        F.col(id_col),
        F.array_max("_scores").alias("_best"),
    )
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return best.select(
        F.col(id_col),
        F.when(F.col("_best.hits") > 0,
               F.element_at(lang_arr, -F.col("_best.negidx") + 1))
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
        F.col("_best.hits").cast("int").alias("marker_hits"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-insensitive md5 fingerprint of each doc's token set."""
    return df.select(
        F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint")
    )


def top_tokens(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Corpus token histogram, top-k by frequency (tie → token asc).
    Partial aggregation keeps the shuffle at vocabulary size."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


#: GPT-style byte-pair pre-tokenization shape, simplified to the
#: ASCII-safe subset expressible identically in Java and RE2 regex.
BPE_PATTERN = " ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+"


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting with a BPE-ish regex pre-tokenizer (the
    length-estimation pass of LLM data pipelines): word pieces keep
    their leading space, digits and punctuation split out."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe"),
    )


def rolling_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Rolling-hash document fingerprint: minimum md5 over all
    character k-grams (one winnowing window spanning the doc) —
    robust to token reordering at the character level, O(len·k) per
    doc, no shuffle."""
    text = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
        lambda i: F.md5(F.substring(text, i, k)),
    )
    return df.select(
        F.col(id_col), F.array_min(grams).alias("rolling_fp")
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Text cleaning for training pipelines: lowercase, strip
    non-alphanumerics, collapse whitespace, trim. One narrow
    projection; emits a content hash + length for cheap downstream
    equality checks."""
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(clean).alias("clean_hash"),
        F.length(clean).alias("clean_len"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Sliding-window document chunking — the pre-embedding stage of
    an LLM pipeline: windows of ``chunk_tokens`` tokens every
    ``stride`` tokens (trailing partial windows kept). One explode,
    no shuffle; output rows carry the chunk hash + size so the 100 TB
    case doesn't duplicate text bytes downstream."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.when(n > 0, F.ceil(n / F.lit(stride)).cast("int")).otherwise(
        F.lit(0)
    )
    chunks = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(
            F.when(
                n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
        F.size(piece).alias("n_chunk_tokens"),
    )


#: filter_pipeline rule bounds (C4/Gopher-style cheap pre-filters).
FILTER_RULES = {
    "min_tokens": 20,
    "max_tokens": 100_000,
    "min_mean_tok_len": 3.0,
    "max_mean_tok_len": 10.0,
    "max_token_len": 20,
    "min_uniq_ratio": 0.2,
    "min_stop_ratio": 0.01,
}


def filter_pipeline(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4/Gopher-style document filter: every rule evaluated in one
    narrow projection, emitting per-doc signals, a ``keep`` flag, and
    the FIRST failing rule as ``reject_reason`` (NULL when kept).

    Keeping rejected rows with their reason — rather than filtering —
    is the production shape: the reject histogram is the pipeline's
    tuning dashboard, and the keep filter is one trivial predicate
    downstream. Rules (fixed evaluation order): token-count bounds,
    mean-token-length bounds, longest-token cap, distinct-token
    ratio floor (repetition guard), stopword-fraction floor
    (word-soup guard).
    """
    r = FILTER_RULES
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean_len = F.try_divide(total_len, n_tokens)
    max_len = F.array_max(F.transform(toks, lambda t: F.length(t)))
    uniq_ratio = F.try_divide(F.size(F.array_distinct(toks)), n_tokens)
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    stop_ratio = F.try_divide(
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))),
        n_tokens,
    )
    reason = (
        F.when(n_tokens < r["min_tokens"], F.lit("too_short"))
        .when(n_tokens > r["max_tokens"], F.lit("too_long"))
        .when(mean_len < r["min_mean_tok_len"], F.lit("mean_tok_short"))
        .when(mean_len > r["max_mean_tok_len"], F.lit("mean_tok_long"))
        .when(max_len > r["max_token_len"], F.lit("token_too_long"))
        .when(uniq_ratio < r["min_uniq_ratio"], F.lit("repetitive"))
        .when(stop_ratio < r["min_stop_ratio"], F.lit("no_stopwords"))
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def repetition_ratio(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> "DataFrame":
    """Per-document n-gram repetition ratio — the Gopher-style
    quality signal (1 − distinct/total shingles): boilerplate and
    template spam score high, natural prose low.

    One narrow projection + one groupBy on the doc id; documents
    shorter than ``n`` tokens produce no shingles and drop out, same
    as the SQL oracle."""
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.functions.text import (
        shingles_sql,
        tokens_sql,
    )

    sh = df.selectExpr(
        id_col, f"{tokens_sql(text_col)} AS _toks"
    ).selectExpr(
        id_col,
        f"explode({shingles_sql('_toks', n, distinct=False)}) AS shingle",
    )
    return sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count_distinct(F.col("shingle")).alias("n_distinct"),
        F.round(
            1.0 - F.count_distinct(F.col("shingle")) / F.count(F.lit(1)), 4
        ).alias("repetition_ratio"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own unigram LM — the cheap perplexity-style quality signal (very
    negative ⇒ rare-token soup; near the corpus mode ⇒ natural text).

    Plan: one (doc, token) explode; the token→count vocabulary is an
    aggregate that joins back by token (at web scale the vocabulary
    still fits executor memory after a frequency cut, so Spark picks
    a broadcast hash join; a shuffle join degrades gracefully when it
    does not). Per-doc mean runs as one partial-aggregated groupBy.
    AVG is order-insensitive only up to float ulps, so the score is
    rounded to 4dp on both engines."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    # corpus total as a window over the (small) vocabulary aggregate —
    # stays in-plan, no driver-side action
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
    )
    scored = tok.join(vocab, "token").select(
        F.col(id_col),
        (
            F.log(F.col("cnt").cast("double"))
            - F.log(F.col("total").cast("double"))
        ).alias("lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    add-k-smoothed bigram LM — the CCNet-style perplexity quality
    filter (train an n-gram LM on the corpus / a trusted subset, keep
    docs whose perplexity is unsurprising). A bigram model separates
    "common words in natural order" from "common words shuffled",
    which the unigram score (``unigram_logprob``) cannot.

    P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V), V = |unigram vocab|.
    Score = mean over a doc's bigram positions of ln P; docs with <2
    tokens have no bigram and are absent from the output (same on the
    oracle side).

    Plan: ONE tokenize pass; bigrams derive array-side (transform over
    an index sequence — no positional self-join, no second explode of
    raw text) and only narrow (id, w1, w2) rows ever shuffle. The
    bigram-count and context-count tables are Zipf-small after
    aggregation, so Catalyst broadcasts them back onto the bigram
    stream; V stays in-plan as a 1-row vocabulary aggregate cross-
    joined broadcast (no driver action). Per-doc mean is one
    partial-aggregated groupBy. AVG is order-sensitive in float ulps,
    so the score rounds to 4dp on both engines."""
    from vectorsearchutil_spark.functions.parallel import fanout_repartition

    toks = fanout_repartition(df).selectExpr(
        id_col, f"{tokens_sql(text_col)} AS _toks"
    )
    big = toks.selectExpr(
        id_col,
        "explode(CASE WHEN size(_toks) >= 2 THEN "
        "transform(sequence(0, size(_toks) - 2), "
        "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2)) "
        "ELSE array() END) AS bg",
    ).select(id_col, "bg.w1", "bg.w2")
    bg_counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    ctx_counts = big.groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("c1")
    )
    vocab_size = toks.select(F.explode("_toks").alias("token")).agg(
        F.count_distinct("token").cast("double").alias("vsz")
    )
    # pre-score the DISTINCT bigram table (vocab²-bounded) so the full
    # bigram stream joins back exactly ONCE — measured 2 shuffle joins
    # → 1 on the 25× probe (PERF.md round 4b)
    lp_table = (
        bg_counts.join(ctx_counts, ["w1"])
        .crossJoin(F.broadcast(vocab_size))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c12") + F.lit(add_k))
                / (F.col("c1") + F.lit(add_k) * F.col("vsz"))
            ).alias("lp"),
        )
    )
    scored = big.join(lp_table, ["w1", "w2"]).select(F.col(id_col), "lp")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


def vocab_oov_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 20,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_k`` token vocabulary — the tokenizer-coverage /
    "how much of this doc will become <unk> or byte-fallback" signal
    a pretraining pipeline computes before committing to a tokenizer.

    The vocabulary is deterministic: top-k by count, ties broken by
    token ascending (exact row_number cut, reproducible on any
    engine). Plan: one (doc, token) explode; the vocabulary is an
    aggregate + top-k (tiny) that LEFT-joins back broadcast; per-doc
    OOV counts are one partial-aggregated groupBy. Only narrow
    (id, token) rows shuffle — text never moves."""
    from pyspark.sql import Window

    from vectorsearchutil_spark.functions.parallel import fanout_repartition

    tok = fanout_repartition(df).selectExpr(
        id_col, f"explode({tokens_sql(text_col)}) AS token"
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy().orderBy(
                    F.col("_cnt").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("_rn") <= vocab_k)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "token", "left")
    n_oov = F.sum(
        F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.round(n_oov / F.count(F.lit(1)), 4).alias("oov_ratio"),
    )


def token_pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 50,
    min_support: int = 5,
) -> DataFrame:
    """Pointwise mutual information over token co-occurrence —
    collocation mining ("which words travel together"), the signal
    behind phrase detection and topic seeding in corpus analysis.

    PMI(a,b) = ln( n_ab · N / (n_a · n_b) ) over document-level
    co-occurrence of DISTINCT tokens; N = docs with ≥1 token. Output
    is every unordered pair with support ≥ ``min_support`` (no top-m
    cut — membership then never depends on float ordering ulps).

    Scale bounds, in order: tokens outside the corpus top-``vocab_k``
    (deterministic count-desc/token-asc cut, broadcast) are dropped
    BEFORE pair generation, so the per-doc pair fan-out is ≤ C(k,2)
    and in practice ≪ that; the pair count aggregates map-side. The
    doc-frequency table is vocab-sized, so both marginals join back
    broadcast. Only narrow (id, token) rows ever shuffle."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(distinct_tokens(F.col(text_col))).alias("token"),
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy().orderBy(
                    F.col("_df").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("_rn") <= vocab_k)
        .select("token", F.col("_df").cast("double").alias("_df"))
    )
    tok_v = tok.join(F.broadcast(vocab.select("token")), "token")
    n_docs = tok_v.agg(
        F.count_distinct("_doc").cast("double").alias("_n")
    )
    pairs = (
        tok_v.select("_doc", F.col("token").alias("w1"))
        .join(
            tok_v.select("_doc", F.col("token").alias("w2")),
            "_doc",
        )
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        pairs.join(
            F.broadcast(vocab.select(F.col("token").alias("w1"),
                                     F.col("_df").alias("_na"))),
            "w1",
        )
        .join(
            F.broadcast(vocab.select(F.col("token").alias("w2"),
                                     F.col("_df").alias("_nb"))),
            "w2",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("_n")
                    / (F.col("_na") * F.col("_nb"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def redact_pii(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str]] | None = None,
) -> "DataFrame":
    """Regex PII redaction — the masking pass every training-data
    pipeline runs before packing (emails, phone numbers, ...).

    ``patterns`` is an ordered list of (regex, replacement); each is
    applied with global replacement, and a per-pattern match count is
    emitted (``n_<i>`` columns) so downstream can audit redaction
    volume. Pure JVM regexp expressions — one narrow projection, no
    shuffle, trivially parallel at 100 TB. Patterns stick to the
    RE2-compatible subset (no backrefs/lookahead) so the same regex
    runs identically in the DuckDB oracle.
    """
    from pyspark.sql import functions as F

    if patterns is None:
        patterns = DEFAULT_PII_PATTERNS
    out = F.col(text_col)
    counts = []
    for i, (pat, _rep) in enumerate(patterns):
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("int").alias(
                f"n_pat{i}"
            )
        )
    for pat, rep in patterns:
        out = F.regexp_replace(out, pat, rep)
    return df.select(
        F.col(id_col), *counts, out.alias("redacted")
    )


#: (regex, replacement) applied in order by redact_pii.
DEFAULT_PII_PATTERNS = [
    (r"[a-z0-9.]+@[a-z0-9.-]+\.[a-z]+", "<EMAIL>"),
    (r"\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def hashed_tfidf(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> "DataFrame":
    """Sparse hashed TF-IDF document vectors (the hashing trick):
    bucket(token) = md5-derived int mod ``n_buckets``; weight(doc, b)
    = Σ_{tok→b} tf(doc,tok) · ln(1 + N/df(tok)). Output rows are the
    sparse form (doc_id, bucket, weight) — only non-zero buckets.

    Plan: one (doc,tok) partial-agg shuffle for tf, a vocabulary-size
    aggregate for df that joins back BROADCAST (Zipf: |vocab| ≪
    corpus), then one (doc,bucket) re-aggregate. The corpus text
    never shuffles — only narrow (id, token-hash) rows move. The
    fixed bucket count makes the vector width independent of
    vocabulary size, which is what makes this the 100 TB featurizer.
    """
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.functions.text import tokens_sql

    n_docs = df.count()
    cnt = (
        df.selectExpr(id_col, f"explode({tokens_sql(text_col)}) AS tok")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = cnt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    bucket = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast(
        "long"
    ) % n_buckets
    # per-bucket weights fold in token order (array_sort + aggregate)
    # so Spark and the SQL oracle add the SAME floats in the SAME
    # order — a plain SUM's partial-agg order is engine-dependent and
    # can flip the 4dp rounding on boundary values
    return (
        cnt.join(F.broadcast(dfreq), "tok")
        .withColumn("bucket", bucket.cast("int"))
        .withColumn(
            "w",
            F.col("tf") * F.log(1.0 + F.lit(float(n_docs)) / F.col("df")),
        )
        .groupBy(id_col, "bucket")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("tok", F.col("w")))
                        ),
                        lambda x: x["w"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("weight")
        )
    )


def pack_context_windows(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 256,
) -> "DataFrame":
    """Concat-and-cut sequence packing: documents are concatenated in
    id order and cut into fixed ``capacity``-token context windows
    (documents may straddle a cut — GPT-style packing). Returns per
    doc: token count, global start offset, first/last window index,
    and how many windows the doc touches.

    The running offset is a TWO-LEVEL prefix sum (the sweep-line /
    token-budget discipline): ids bucket into 1024-id blocks, block
    token totals cumulate over the tiny block histogram, and each
    row's offset = block carry-in + a within-block running sum — the
    per-row window keys on the block, parallel across blocks, instead
    of one task sorting the whole corpus. Offsets are identical to
    the single-window definition (integer sums over the same monotone
    id order). Windows never cross shard boundaries in a real loader,
    so per-source variants just add the source to every key.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.functions.text import tokens_sql

    # NUMERIC ids are a documented requirement: the packing order is
    # ascending numeric id, and the two-level block decomposition is
    # floor(id/1024). A non-numeric id must fail LOUDLY, not cast to
    # NULL and collapse every row into one serial block (ADVICE r4
    # low): coalesce short-circuits, so raise_error fires only on the
    # first id whose bigint cast is null. Numeric-STRING ids are
    # accepted and ordered numerically ('10' packs after '9'), which
    # is the same order the block math needs.
    _idn = F.coalesce(
        F.expr(f"try_cast({id_col} AS BIGINT)"),
        F.raise_error(
            F.concat(
                F.lit(
                    "pack_context_windows requires numeric ids; got "
                    f"non-numeric {id_col}="
                ),
                F.col(id_col).cast("string"),
            )
        ).cast("bigint"),
    )
    sized = (
        df.selectExpr(
            id_col, f"size({tokens_sql(text_col)}) AS n_tokens"
        )
        .withColumn("_idn", _idn)
        .withColumn("_blk", F.floor(F.col("_idn") / F.lit(1024)))
    )
    hist = sized.groupBy("_blk").agg(F.sum("n_tokens").alias("_bt"))
    carry_w = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = hist.select(
        "_blk",
        F.coalesce(F.sum("_bt").over(carry_w), F.lit(0)).alias("_carry"),
    )
    inner_w = (
        Window.partitionBy("_blk")
        .orderBy("_idn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        sized.join(carry, "_blk")
        .withColumn(
            "start_offset",
            F.col("_carry")
            + F.coalesce(F.sum("n_tokens").over(inner_w), F.lit(0)),
        )
        .select(
            id_col,
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / capacity)
            .cast("int")
            .alias("first_window"),
            F.floor(
                (F.col("start_offset") + F.col("n_tokens") - 1) / capacity
            )
            .cast("int")
            .alias("last_window"),
            (
                F.floor(
                    (F.col("start_offset") + F.col("n_tokens") - 1) / capacity
                )
                - F.floor(F.col("start_offset") / capacity)
                + 1
            )
            .cast("int")
            .alias("n_windows"),
        )
    )


def pack_bins_next_fit(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    capacity: int = 512,
) -> "DataFrame":
    """Next-fit bin packing WITHOUT splitting documents: within each
    group (source/shard), docs in id order go into the current bin
    while they fit; a doc that does not fit opens a new bin
    (oversized docs get a bin of their own). The no-split counterpart
    of ``pack_context_windows`` — what you run when examples must not
    straddle sequence boundaries.

    The scan reduces to (id, group, token count) BEFORE the shuffle;
    the inherently sequential fold runs per group inside
    ``applyInPandas`` — groups pack in parallel, and in a real loader
    bins never cross shards anyway. Output: (id, group, bin_idx,
    bin_fill) where bin_fill is the bin's running fill AFTER placing
    the doc.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from vectorsearchutil_spark.functions.text import tokens_sql

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(group_col, StringType()),
            StructField("bin_idx", IntegerType()),
            StructField("bin_fill", IntegerType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bin_idx, fills = [], []
        cur, fill = 0, None
        for n in pdf["_n"]:
            n = int(n)
            if fill is None:
                fill = n
            elif fill + n <= capacity:
                fill += n
            else:
                cur += 1
                fill = n
            bin_idx.append(cur)
            fills.append(fill)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "bin_idx": pd.Series(bin_idx, dtype="int32"),
                "bin_fill": pd.Series(fills, dtype="int32"),
            }
        )

    sized = df.selectExpr(
        id_col, group_col, f"size({tokens_sql(text_col)}) AS _n"
    ).filter(  # null text/group: nothing to pack, no bin membership
        F.col("_n").isNotNull() & F.col(group_col).isNotNull()
    )
    return sized.groupBy(group_col).applyInPandas(pack, out_schema)


def pack_bins_first_fit_decreasing(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    capacity: int = 512,
) -> "DataFrame":
    """First-fit-decreasing bin packing per group: docs sorted by
    (token count DESC, id) are each placed into the FIRST bin they
    fit; no fit opens a new bin. FFD is the classic 11/9·OPT + 6/9
    heuristic — meaningfully tighter packing than next-fit when doc
    lengths are skewed (big docs first, small docs fill the gaps).

    Same scale shape as ``pack_bins_next_fit``: the scan reduces to
    (id, group, count) BEFORE the shuffle, text never moves, and the
    inherently sequential fold runs per group in ``applyInPandas``
    (groups pack in parallel — in a real loader bins never cross
    shards). Output: (id, group, bin_idx, bin_fill) with bin_fill the
    chosen bin's fill AFTER placement. Oracle: the same fold unrolled
    as a recursive CTE carrying the per-bin fill list (found: compute
    the first-fit position ONCE in a derived subquery — DuckDB
    re-evaluating list lambdas inline in the recursive arm was ~1000×
    slower)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from vectorsearchutil_spark.functions.text import tokens_sql

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(group_col, StringType()),
            StructField("bin_idx", IntegerType()),
            StructField("bin_fill", IntegerType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["_n", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # free[i] = remaining capacity of bin i. The first-fit scan is
        # argmax(free >= n) — one vectorized C pass over the bin array
        # instead of a Python generator walk (25× probe: 17 s → ~2 s
        # at 15.6k docs/group ≈ 3k bins/group). Semantics identical:
        # argmax returns the FIRST True index.
        free = np.empty(1024, dtype=np.int64)
        n_bins = 0
        bin_idx = np.empty(len(pdf), dtype=np.int32)
        after = np.empty(len(pdf), dtype=np.int32)
        for row, n in enumerate(pdf["_n"].to_numpy()):
            n = int(n)
            view = free[:n_bins]
            fits = view >= n
            pos = int(np.argmax(fits)) if fits.any() else -1
            if pos < 0:
                if n_bins == len(free):
                    free = np.concatenate(
                        [free, np.empty(len(free), dtype=np.int64)]
                    )
                free[n_bins] = capacity - n
                pos = n_bins
                n_bins += 1
            else:
                free[pos] -= n
            bin_idx[row] = pos
            after[row] = capacity - free[pos]
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "bin_idx": pd.Series(bin_idx, dtype="int32"),
                "bin_fill": pd.Series(after, dtype="int32"),
            }
        )

    sized = df.selectExpr(
        id_col, group_col, f"size({tokens_sql(text_col)}) AS _n"
    ).filter(  # null text/group: nothing to pack, no bin membership
        F.col("_n").isNotNull() & F.col(group_col).isNotNull()
    )
    return sized.groupBy(group_col).applyInPandas(pack, out_schema)


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits)
    — the lexical-diversity quality signal: near-zero ⇒ repetitive
    degenerate text, high ⇒ diverse vocabulary. Complements
    ``repetition_ratio`` (which only sees the top token).

    Plan: one explode → (doc, token) count → per-doc fold. Both
    aggregations partial-aggregate; state per doc is its distinct
    token count. H = log2(n) - (1/n)·Σ c·log2(c) avoids a per-term
    division by n (p = c/n), so each summand depends only on the
    exact integer count — engine disagreement is confined to float
    summation order, absorbed by the 4dp rounding.
    """
    import math

    from vectorsearchutil_spark.functions.text import tokens_sql

    tok = df.selectExpr(
        id_col, f"explode({tokens_sql(text_col)}) AS token"
    )
    counts = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    log2 = math.log(2.0)
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log(F.col("c")) / F.lit(log2))
            / F.sum("c"),
            4,
        ).alias("entropy_bits"),
    )


def gopher_repetition_signals(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """The Gopher repetition family (Rae et al. 2021 §A1.1), token
    form: per document, (a) the fraction of tokens claimed by the
    single most-frequent 2-gram, and (b) the fraction of token
    POSITIONS covered by any 5-gram occurring twice or more —
    coverage, not occurrence count, so overlapping repeats are not
    double-counted. Complements :func:`repetition_ratio` (a global
    distinct/total ratio): these catch one dominant template line
    and dense local loops respectively.

    Coverage is an interval union: each duplicated 5-gram at
    position p covers [p, p+4]; per doc, intervals sort by start and
    each contributes (end − max(prev_max_end, start−1)) when
    positive — the gaps-and-islands union, windowed PER DOC (the
    doc id is high-cardinality, so the window parallelizes by
    construction). All-integer arithmetic; docs shorter than the
    gram drop out of that signal (LEFT join keeps them with 0).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.functions.parallel import fanout_repartition
    from vectorsearchutil_spark.functions.text import tokens_sql

    toks = fanout_repartition(df).selectExpr(
        id_col, f"{tokens_sql(text_col)} AS _toks"
    ).withColumn("n_tokens", F.size("_toks"))
    base = toks.select(id_col, "n_tokens")

    big = (
        toks.filter(F.col("n_tokens") >= 2)
        .selectExpr(
            id_col,
            "n_tokens",
            "explode(transform(sequence(0, n_tokens - 2),"
            " p -> concat(element_at(_toks, p + 1), ' ',"
            " element_at(_toks, p + 2)))) AS g",
        )
        .groupBy(id_col, "n_tokens", "g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col, "n_tokens")
        .agg(F.max("_c").alias("_maxc"))
        .select(
            id_col,
            (F.lit(2) * F.col("_maxc") / F.col("n_tokens")).alias(
                "top_2gram_frac"
            ),
        )
    )

    grams5 = toks.filter(F.col("n_tokens") >= 5).selectExpr(
        id_col,
        "n_tokens",
        "posexplode(transform(sequence(0, n_tokens - 5),"
        " p -> concat_ws(' ', slice(_toks, p + 1, 5)))) AS (p, g)",
    )
    dup_pos = (
        grams5.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy(id_col, "g"))
        )
        .filter(F.col("_df") >= 2)
        .select(id_col, "n_tokens", "p")
    )
    w = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max(F.col("p") + 4).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        dup_pos.withColumn(
            "_contrib",
            F.greatest(
                F.lit(0),
                (F.col("p") + 4)
                - F.greatest(
                    F.coalesce(prev_end, F.col("p") - 1),
                    F.col("p") - 1,
                ),
            ),
        )
        .groupBy(id_col, "n_tokens")
        .agg(F.sum("_contrib").alias("_cov"))
        .select(
            id_col,
            (F.col("_cov") / F.col("n_tokens")).alias("dup_5gram_frac"),
        )
    )
    return (
        base.join(big, id_col, "left")
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(F.coalesce("top_2gram_frac", F.lit(0.0)), 6).alias(
                "top_2gram_frac"
            ),
            F.round(F.coalesce("dup_5gram_frac", F.lit(0.0)), 6).alias(
                "dup_5gram_frac"
            ),
        )
    )


def benchmark_contamination(
    train: "DataFrame",
    bench: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> "DataFrame":
    """Benchmark-contamination screen (the GPT-3 §C / LLaMA
    decontamination step): for every training document, the fraction
    of its distinct word ``n``-grams that also occur anywhere in the
    held-out benchmark split. Complements the registry's
    ``docs_decontamination`` (which counts shared shingles for HITS
    only): this emits EVERY training doc with its contamination
    RATIO — the quantity pipelines threshold on (usually 13-gram,
    drop at ratio > 0).

    Output: (id, n_grams, n_contaminated, contamination_ratio).
    Docs shorter than ``n`` tokens have zero grams and ratio 0.0 by
    convention (nothing to leak).

    Scale shape: one shingle pass per side; the benchmark collapses
    to a distinct-gram set that BROADCASTS (benchmarks are ~1e6
    grams vs a 100 TB corpus), so the training side takes a map-side
    semi-join + one per-doc aggregate — the corpus text itself never
    shuffles.
    """
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.functions.vector import round_half_up
    from vectorsearchutil_spark.operators.dedup import _shingle_table

    tr = _shingle_table(train, text_col, id_col, n, None)
    ev = _shingle_table(bench, text_col, id_col, n, None).select(
        "shingle"
    ).distinct()
    per_doc = (
        tr.join(F.broadcast(ev.withColumn("_hit", F.lit(1))),
                "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("int")
            .alias("n_contaminated"),
        )
    )
    # LEFT join back so sub-n-token docs appear with 0 grams
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            round_half_up(
                F.coalesce(
                    F.try_divide(
                        F.col("n_contaminated").cast("double"),
                        F.col("n_grams").cast("double"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("contamination_ratio"),
        )
    )


def truncation_stats(
    df: "DataFrame",
    ctx_lengths: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Tokenizer-aware truncation loss: for each candidate context
    length, how much of the corpus a fixed-window trainer would
    DROP. Uses the BPE-ish regex pre-tokenizer (same convention as
    :func:`bpe_token_stats`) so counts approximate real tokenizer
    output, not whitespace words.

    Output, one row per ctx length: (ctx_len, n_docs, n_truncated,
    total_tokens, lost_tokens, lost_frac) where lost_tokens =
    Σ max(0, tokens − ctx).

    Scale shape: one narrow token-count projection (no text shuffle),
    then an explode over the tiny ctx-length literal array and a
    |ctx_lengths|-group aggregate — partial aggregation does almost
    all the work map-side.
    """
    from pyspark.sql import functions as F

    from vectorsearchutil_spark.functions.vector import round_half_up

    cnt = df.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BPE_PATTERN), 0
            )
        ).alias("_n_tok"),
    )
    ctxs = F.array(*[F.lit(int(c)) for c in sorted(ctx_lengths)])
    return (
        cnt.withColumn("ctx_len", F.explode(ctxs))
        .groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # when/otherwise, not bare casts: NULL text gives a NULL
            # token count, and summing NULL flags would emit NULL
            # where the oracle's CASE ... ELSE 0 emits 0
            F.sum(
                F.when(F.col("_n_tok") > F.col("ctx_len"), 1).otherwise(0)
            ).cast("bigint").alias("n_truncated"),
            F.sum("_n_tok").cast("bigint").alias("total_tokens"),
            F.sum(
                F.when(
                    F.col("_n_tok") > F.col("ctx_len"),
                    F.col("_n_tok") - F.col("ctx_len"),
                ).otherwise(0)
            ).cast("bigint").alias("lost_tokens"),
        )
        .select(
            "ctx_len",
            "n_docs",
            "n_truncated",
            "total_tokens",
            "lost_tokens",
            round_half_up(
                F.coalesce(
                    F.try_divide(
                        F.col("lost_tokens").cast("double"),
                        F.col("total_tokens").cast("double"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("lost_frac"),
        )
    )


#: Demo blocklist for the C4-style badword screen. Production swaps
#: in the real list (e.g. the LDNOOBW set) — the plan is list-size
#: independent as long as the list broadcasts.
BLOCKLIST_DEFAULT = [
    "slow", "crash", "spam", "leak", "junk", "noise",
]


def blocklist_screen(
    df: DataFrame,
    badwords: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bad_frac: float = 0.05,
) -> DataFrame:
    """C4-style blocklist screen: per document, total tokens, blocked
    tokens, the blocked fraction, and the keep/drop verdict at
    ``max_bad_frac`` (C4 drops on ANY hit; the fraction form
    subsumes that at threshold 0). Every input doc is emitted.

    Plan: explode_outer the tokens (outer, so zero-token docs still
    emit their row), mark blocked tokens with ``isin`` — Catalyst
    compiles a >10-element IN list to an O(1) InSet hash probe inside
    whole-stage codegen — and count per doc with a map-side-combinable
    aggregate, so the shuffle carries one row per DOC, never per
    token. Two rejected forms, both measured on a 2M-doc probe: the
    one-projection ``size(filter(tokens, t -> array_contains(...)))``
    runs the lambda interpreted (the PERF.md round-4 HOF wall,
    15.1 s), and a broadcast left join against the blocklist spends
    11 s building outer-join rows for 160M probes (13.6 s); the
    explode+InSet form is 3.1 s on identical input.
    """
    bad = sorted(set(badwords if badwords is not None else BLOCKLIST_DEFAULT))
    toks = tokens(F.col(text_col))
    exploded = df.select(
        F.col(id_col), F.explode_outer(toks).alias("_tok")
    )
    d = exploded.groupBy(id_col).agg(
        F.count("_tok").cast("int").alias("n_tokens"),
        F.coalesce(
            F.sum(F.col("_tok").isin(bad).cast("int")), F.lit(0)
        ).cast("int").alias("n_blocked"),
    )
    frac = F.coalesce(
        F.try_divide(
            F.col("n_blocked").cast("double"),
            F.col("n_tokens").cast("double"),
        ),
        F.lit(0.0),
    )
    return d.select(
        id_col,
        "n_tokens",
        "n_blocked",
        round_half_up(frac, 6).alias("blocked_frac"),
        # threshold on the 6dp-rounded value so the verdict can never
        # disagree with the published fraction (or the oracle)
        (
            round_half_up(frac, 6) <= F.lit(float(max_bad_frac))
        ).alias("keep"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf power-law fit over the corpus token distribution: OLS
    slope/intercept of ln(freq) on ln(rank) for the ``top_n`` most
    frequent tokens (rank ties broken token-ASC so the ranking is
    integer-exact). Healthy natural-language corpora sit near
    slope −1; a flat slope flags synthetic/templated text.

    Plan: one explode → token counts (map-side combinable) → top-N
    via TakeOrderedAndProject (no global sort) → the regression runs
    over ≤ top_n aggregated rows. Cross-engine exactness: each
    per-rank term (x, y, xy, x²) fixes to 1e-9 fixed-point longs —
    ln is evaluated once per scalar and the long sums are order-free,
    so both engines add identical integers; only the final slope
    division is floating point, rounded via the floor form.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(top_n)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    # the serial window is over <= top_n rows post-limit: bounded
    ranked = counts.select(
        F.row_number().over(w).alias("rank"), "freq"
    )
    fp = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)).cast("long")  # noqa: E731
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    terms = ranked.select(
        fp(x).alias("x"),
        fp(y).alias("y"),
        fp(x * y).alias("xy"),
        fp(x * x).alias("xx"),
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx") / F.lit(1e9)
    sy = F.col("sy") / F.lit(1e9)
    sxy = F.col("sxy") / F.lit(1e9)
    sxx = F.col("sxx") / F.lit(1e9)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return s.select(
        F.col("n").cast("int").alias("n_ranks"),
        round_half_up(slope, 6).alias("zipf_slope"),
        round_half_up(intercept, 6).alias("zipf_intercept"),
    )


def js_divergence_by_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (nats) between the
    add-one-smoothed unigram distributions of every pair of sources —
    the domain-shift / mixture-design diagnostic.

    Plan: per-(source, token) counts, completed to the full
    source×vocab grid (smoothing makes every cell positive, and the
    grid is |V|·|S| rows — distributed, never collected), then a
    token-equi-join pairs the grid with itself (a < b). Each
    per-token term p·ln(2p/(p+q)) fixes to a 1e-12 long so the
    per-pair sums are order-free; ln evaluates once per scalar.
    """
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("g", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("g").agg(F.sum("c").alias("n"))
    vocab = counts.select("tok").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    grid = (
        vocab.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(vsize))
        .join(counts, ["g", "tok"], "left")
        .select(
            "g",
            "tok",
            "n",
            "v",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    # smoothed probability as an exact rational: (c+1) / (n+v)
    a = grid.select(
        F.col("tok"),
        F.col("g").alias("ga"),
        F.col("c").alias("ca"),
        (F.col("n") + F.col("v")).alias("da"),
    )
    b = grid.select(
        F.col("tok"),
        F.col("g").alias("gb"),
        F.col("c").alias("cb"),
        (F.col("n") + F.col("v")).alias("db"),
    )
    pairs = a.join(b, "tok").filter(F.col("ga") < F.col("gb"))
    p = (F.col("ca") + 1).cast("double") / F.col("da").cast("double")
    q = (F.col("cb") + 1).cast("double") / F.col("db").cast("double")
    m = (p + q) / F.lit(2.0)
    term = p * F.log(p / m) + q * F.log(q / m)
    fp12 = F.floor(term * F.lit(1e12) + F.lit(0.5)).cast("long")
    return (
        pairs.select("ga", "gb", fp12.alias("t"))
        .groupBy("ga", "gb")
        .agg(F.sum("t").alias("t"))
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            round_half_up(
                F.col("t").cast("double") / F.lit(1e12) / F.lit(2.0), 6
            ).alias("js_nats"),
        )
    )


def top_terms_per_doc(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` keyword extraction by TF-IDF. The
    RANKING is the integer-exact triple (tf DESC, df ASC, token ASC)
    — a monotone proxy for tf·ln(N/df) that no floating-point tie can
    flip across engines; the rounded tf-idf score ships as an
    informational column.

    Plan: one explode → (doc, token) tf; token df by a second
    aggregation of the same narrow pairs; the rank window partitions
    by doc over its DISTINCT tokens (bounded by doc length).
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            F.col("tok").alias("term"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            round_half_up(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                ),
                6,
            ).alias("tfidf"),
        )
    )


def langid_confusion(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
) -> DataFrame:
    """Confusion matrix + per-cell share for the heuristic language
    ID against the labeled ``lang`` column — the eval that belongs
    next to any classifier-shaped operator. One row per observed
    (label, prediction) cell.

    Plan: :func:`language_id` is a zero-shuffle projection; the
    confusion matrix is one groupBy over its output joined back to
    the (id, label) pairs — the only shuffle is the tiny
    cells-per-language aggregate.
    """
    pred = language_id(df, text_col=text_col, id_col=id_col)
    labeled = df.select(F.col(id_col), F.col(label_col).alias("label"))
    cells = (
        labeled.join(pred, id_col)
        .groupBy("label", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per_label = cells.groupBy("label").agg(
        F.sum("n_docs").alias("_label_total")
    )
    return (
        cells.join(F.broadcast(per_label), "label")
        .select(
            "label",
            "pred_lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            round_half_up(
                F.col("n_docs").cast("double")
                / F.col("_label_total").cast("double"),
                6,
            ).alias("label_share"),
            (F.col("label") == F.col("pred_lang")).alias("is_correct"),
        )
    )


def token_label_chi2(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
    min_chi2: float = 3.84,
) -> DataFrame:
    """Chi-square token/label association — the feature-selection
    screen (which tokens are distinctive for which label?). For each
    (token, label) cell the 2x2 contingency table is built from
    DOCUMENT PRESENCE (distinct tokens per doc), and
    chi2 = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). Emitted cells are
    gated by two DETERMINISTIC filters — token df >= ``min_df``
    (integer) and rounded chi2 >= ``min_chi2`` (threshold applied to
    the already-rounded value) — never a float top-k, so no float
    ordering can flip membership across engines.

    Plan: one explode of per-doc DISTINCT tokens -> (token, label)
    presence counts (map-side combinable); token df and label totals
    are second-level aggregates of those narrow pairs, joined back
    broadcast (df table is <= vocab rows, label table <= labels). The
    chi2 arithmetic runs once per surviving (token, label) cell over
    six exact integers; both engines spell the identical double
    expression.
    """
    base = df.select(
        F.col(label_col).alias("label"),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
    )
    cell = base.groupBy("tok", "label").agg(
        F.count(F.lit(1)).alias("a")
    )
    tok_df = cell.groupBy("tok").agg(F.sum("a").alias("_df")).filter(
        F.col("_df") >= min_df
    )
    n_tot = df.agg(F.count(F.lit(1)).alias("_nn"))
    # label totals are docs-per-label from the raw docs (summing
    # presence per label over tokens would count each doc once per
    # distinct token)
    lab_n = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("_nl")
    )
    j = (
        cell.join(tok_df, "tok")
        .join(F.broadcast(lab_n), "label")
        .crossJoin(F.broadcast(n_tot))
    )
    a = F.col("a").cast("double")
    b = (F.col("_nl") - F.col("a")).cast("double")
    c = (F.col("_df") - F.col("a")).cast("double")
    d = (F.col("_nn") - F.col("_nl") - F.col("_df") + F.col("a")).cast(
        "double"
    )
    n = F.col("_nn").cast("double")
    num = n * (a * d - b * c) * (a * d - b * c)
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = round_half_up(F.when(den > 0, num / den), 6)
    return (
        j.select(
            "tok",
            "label",
            F.col("a").cast("long").alias("n_docs_with"),
            F.col("_df").cast("long").alias("token_df"),
            chi2.alias("chi2"),
        )
        .filter(F.col("chi2") >= F.lit(float(min_chi2)))
    )


def boilerplate_prefixes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    prefix_chars: int = 24,
) -> DataFrame:
    """Template/boilerplate detection per source: the most common
    document PREFIX (first ``prefix_chars`` characters) and its share
    of the source's documents. Crawl pipelines use exactly this to
    spot cookie banners, licence headers and scraped-template wrappers
    before they flood the dedup stage.

    Two narrow aggregates over (source, prefix) — no text shuffle
    beyond the fixed-width prefix — then a max_by argmax with a
    deterministic (count desc, prefix asc) tie-break.
    """
    pre = df.filter(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("_prefix"),
    )
    counts = pre.groupBy("source", "_prefix").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # deterministic argmax incl. string tie-break: min(prefix) among
    # rows carrying the max count (max_by's struct ordering would
    # break count ties toward the LARGEST string; the screen wants
    # the lexicographically smallest, same as the SQL oracle)
    mx = counts.groupBy("source").agg(F.max("_n").alias("_mx"))
    best = (
        counts.join(mx, "source")
        .filter(F.col("_n") == F.col("_mx"))
        .groupBy("source")
        .agg(F.min("_prefix").alias("top_prefix"), F.max("_n").alias("_bn"))
    )
    tot = pre.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    from vectorsearchutil_spark.functions.vector import round_half_up

    return tot.join(best, "source").select(
        "source",
        "n_docs",
        "top_prefix",
        F.col("_bn").cast("long").alias("top_prefix_docs"),
        round_half_up(
            F.col("_bn").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("top_prefix_share"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty in corpus order: the fraction of a
    doc's DISTINCT n-grams that the corpus sees for the FIRST time in
    this doc (first = minimum doc_id). The corpus-level novelty curve
    is the standard diminishing-returns diagnostic for whether more
    of the same source still adds information to a training mix.

    Plan: explode distinct (doc, hash(gram)) pairs — 60-bit
    md5-derived longs (the duplicate-spans anchor convention:
    8-byte shuffle keys instead of 32-char md5 strings, measured 8x
    at the 70M-gram probe, 198.6 -> 24.5 s; collisions are negligible and
    ENGINE-IDENTICAL, the oracle derives the same long) — the raw
    text never shuffles. Then TWO aggregates: per-gram min doc_id,
    re-aggregated per introducing doc; and per-doc distinct gram
    counts. No pair-table re-join: novel-per-doc falls straight out
    of grouping the per-gram minima by their introducing doc.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    grams = toked.select(
        F.col(id_col),
        F.explode(
            shingles_of_tokens(F.col("_t"), n=n, distinct=True)
        ).alias("_g"),
    ).select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    first = grams.groupBy("_h").agg(F.min(id_col).alias("_intro"))
    novel = first.groupBy(F.col("_intro").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    totals = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    from vectorsearchutil_spark.functions.vector import round_half_up

    return totals.join(novel, id_col, "left").select(
        F.col(id_col),
        "n_grams",
        F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        round_half_up(
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
            / F.col("n_grams").cast("double"),
            6,
        ).alias("novelty_ratio"),
    )


def chunk_overlap_stats(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    chunk_tokens: int = 256,
    stride_tokens: int = 192,
) -> DataFrame:
    """RAG-chunking cost report, per source: how many sliding-window
    chunks (size ``chunk_tokens``, stride ``stride_tokens``) the
    corpus expands into and the token inflation the overlap costs.
    Windows start at 0, stride, 2·stride, …; the last window starts
    before the doc ends, so a doc of T tokens yields
    1 + ceil(max(T−chunk, 0) / stride) chunks and re-emits
    (chunk − stride) tokens per extra chunk.

    Everything is closed-form integer arithmetic on per-doc token
    counts — one narrow projection, one aggregate, exact at any
    scale.
    """
    overlap = chunk_tokens - stride_tokens
    t = F.size(tokens(F.col(text_col)))
    n_chunks = F.when(t <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.ceil(
            F.greatest(t - chunk_tokens, F.lit(0)).cast("double")
            / F.lit(float(stride_tokens))
        ).cast("long")
    )
    per_doc = df.select(
        F.col(source_col).alias("source"),
        t.cast("long").alias("_t"),
        n_chunks.alias("_nc"),
    ).withColumn(
        "_emitted",
        F.col("_t")
        + F.lit(int(overlap)) * F.greatest(F.col("_nc") - 1, F.lit(0)),
    )
    from vectorsearchutil_spark.functions.vector import round_half_up

    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_t").alias("total_tokens"),
        F.sum("_nc").alias("total_chunks"),
        F.sum("_emitted").alias("emitted_tokens"),
        round_half_up(
            F.sum("_emitted").cast("double")
            / F.nullif(F.sum("_t").cast("double"), F.lit(0.0)),
            6,
        ).alias("inflation"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per
    whitespace word and characters per BPE token — the
    tokenizer-efficiency screen that decides which languages pay a
    context-length tax (high fertility = more tokens for the same
    text, the classic multilingual-tokenizer complaint).

    Exactness: all three tallies are integer sums (token counts,
    char counts) aggregated per group with map-side partials; the
    two ratios are one double division each, quantized 1e-6. No
    shuffle wider than the group key.
    """
    text = F.col(text_col)
    ws = F.size(
        F.filter(F.split(text, " "), lambda x: x != F.lit(""))
    )
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))
    agg = df.groupBy(F.col(group_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws.cast("long")).alias("_ws"),
        F.sum(bpe.cast("long")).alias("_bpe"),
        F.sum(F.length(text).cast("long")).alias("_chars"),
    )
    from vectorsearchutil_spark.functions.vector import round_half_up

    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("_ws").alias("n_ws_tokens"),
        F.col("_bpe").alias("n_bpe_tokens"),
        round_half_up(
            F.col("_bpe").cast("double")
            / F.nullif(F.col("_ws").cast("double"), F.lit(0.0)),
            6,
        ).alias("fertility"),
        round_half_up(
            F.col("_chars").cast("double")
            / F.nullif(F.col("_bpe").cast("double"), F.lit(0.0)),
            6,
        ).alias("chars_per_token"),
    )


def unicode_health(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source encoding-health screen: replacement-character docs
    (U+FFFD = something already lost bytes upstream), stray control
    characters, and the non-ASCII share — the triage pass that
    catches a mis-decoded crawl dump before it poisons a training
    mix. All counts are exact integers from three narrow regex
    tallies (identical char-class semantics on Java regex and RE2);
    the one share is a double division quantized 1e-6.
    """
    text = F.col(text_col)
    repl = F.regexp_count(text, F.lit("�"))
    ctrl = F.regexp_count(
        text, F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]")
    )
    non_ascii = F.regexp_count(text, F.lit("[^\\x00-\\x7f]"))
    agg = df.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((repl > 0).cast("long")).alias("n_replacement_docs"),
        F.sum(ctrl.cast("long")).alias("n_control_chars"),
        F.sum(non_ascii.cast("long")).alias("_na"),
        F.sum(F.length(text).cast("long")).alias("_chars"),
    )
    from vectorsearchutil_spark.functions.vector import round_half_up

    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_replacement_docs",
        "n_control_chars",
        round_half_up(
            F.col("_na").cast("double")
            / F.nullif(F.col("_chars").cast("double"), F.lit(0.0)),
            6,
        ).alias("non_ascii_share"),
    )


def diversity_indices(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Lexical diversity per source: type-token ratio, Gini–Simpson
    index, and Shannon entropy of the token distribution — the
    repetitiveness fingerprint that separates boilerplate-heavy
    sources from genuinely diverse text before mixture weighting.

    Exactness: TTR and Simpson come from exact integers (vocab,
    token count, Σc² in DECIMAL(38,0) — Simpson = 1 − Σc²/n² does
    ONE double division); Shannon uses the algebraic form
    log2(n) − Σ c·log2(c) / n so the only inexactness is the
    1e-6-quantized double fold over the type table (same tolerance
    class as transition_entropy). Plan: one explode → one
    (source, token) count → one per-source aggregate; the token
    shuffle is the same width as any top-terms pass.
    """
    toks = F.explode(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    ).alias("_tok")
    counts = df.select(
        F.col(group_col).alias("source"), toks
    ).groupBy("source", "_tok").agg(F.count(F.lit(1)).alias("_c"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = counts.groupBy("source").agg(
        F.sum(dec(F.col("_c"))).alias("_n"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(dec(F.col("_c")) * dec(F.col("_c"))).alias("_s2"),
        F.sum(
            F.col("_c").cast("double") * F.log2(F.col("_c").cast("double"))
        ).alias("_clogc"),
    )
    from vectorsearchutil_spark.functions.vector import round_half_up

    n = F.col("_n").cast("double")
    return agg.select(
        "source",
        F.col("_n").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        round_half_up(F.col("vocab").cast("double") / n, 6).alias("ttr"),
        round_half_up(
            F.lit(1.0) - F.col("_s2").cast("double") / (n * n), 6
        ).alias("gini_simpson"),
        round_half_up(
            F.log2(n) - F.col("_clogc") / n, 6
        ).alias("shannon_bits"),
    )


# ---------------------------------------------------------------------------
# Round-10 staging wave — LM scoring depth, template detection, data
# ablation, and score-calibration measurement.
# ---------------------------------------------------------------------------


def trigram_stupid_backoff(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document mean stupid-backoff trigram score (Brants et al.
    2007, "Large Language Models in Machine Translation") under the
    corpus's own counts — the standard web-scale LM quality signal
    where a smoothed probability is overkill (kin declared:
    :func:`bigram_logprob` is the add-k bigram cousin; this adds the
    3→2→1-gram fallback chain with the canonical α=0.4).

    The LM counts come from a deterministic REFERENCE HALF of the
    corpus (md5 hash split on doc_id, the repo's standard draw) and
    every doc scores against them — the CCNet shape "train the n-gram
    LM on a trusted subset, score everything". Scoring the corpus
    against its own counts would never back off (every position's
    trigram is seen at least once); the split is what makes the
    3→2→1 chain live.

    S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂) if the reference saw the trigram,
    else α·c(w₂w₃)/c(w₂) if it saw the bigram, else α²·c(w₃)/N. A
    denominator exists whenever its branch is taken (a seen trigram
    implies its context bigram, a seen bigram implies its first
    word). Per-position scores quantize to a 1e6-fixpoint BIGINT
    before the per-doc SUM (order-free — stricter than
    bigram_logprob's rounded AVG); one double division at the end.
    Docs with <3 tokens have no trigram and are absent.

    Plan: ONE tokenize per n-gram order (the trigram stream is built
    once and REUSED — filtered by the hash split — for the reference
    trigram counts; the bigram/unigram streams tokenize only the
    reference half). The three fallback levels pre-compose into
    branch-score tables on the REFERENCE-AGGREGATE side (tc⋈bc on
    (w1,w2), bc⋈uc on (w2), uc⋈N — Zipf-aggregated tables, never the
    position stream), so the 25M-row position stream takes exactly
    THREE left equi-joins (tri key, backoff-bigram key, unigram key)
    and one groupBy — measured 310 s → 57 s at the 25x probe vs the
    naive 5-join + distinct + join-back shape. The 100 TB watch item
    is head-trigram join skew; the narrow stream (ids + 3 words, no
    payload) keeps the skewed partitions shuffle-light, and AQE skew
    splitting applies.
    """
    from vectorsearchutil_spark.operators.sampling import hash_uniform

    from vectorsearchutil_spark.functions.parallel import fanout_repartition

    is_ref = hash_uniform(F.col(id_col).cast("string"), "sbo") < F.lit(0.5)
    # parallelism floor before the per-position explodes (guide §2):
    # a small docs scan serializes the tokenize + trigram fan-out
    toks = fanout_repartition(df).selectExpr(
        id_col, f"{tokens_sql(text_col)} AS _toks"
    )
    ref = toks.filter(is_ref)
    tri = toks.selectExpr(
        id_col,
        "explode(CASE WHEN size(_toks) >= 3 THEN "
        "transform(sequence(0, size(_toks) - 3), "
        "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2,"
        " _toks[i + 2] AS w3)) "
        "ELSE array() END) AS tg",
    ).select(id_col, "tg.w1", "tg.w2", "tg.w3")
    ref_big = ref.selectExpr(
        id_col,
        "explode(CASE WHEN size(_toks) >= 2 THEN "
        "transform(sequence(0, size(_toks) - 2), "
        "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2)) "
        "ELSE array() END) AS bg",
    ).select("bg.w1", "bg.w2")
    ref_uni = ref.select(F.explode("_toks").alias("w"))
    tri_counts = tri.filter(is_ref).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    bg_counts = ref_big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cb")
    )
    uni_counts = ref_uni.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    # N = Σ cu — derived from the count table, NOT a second pass over
    # the reference tokens (one fewer tokenize+explode of the corpus)
    n_total = uni_counts.agg(
        F.sum("cu").cast("double").alias("nn")
    )
    # pre-compose each fallback level on the aggregate side: a seen
    # trigram implies its context bigram, a seen bigram its first
    # word, so these inner joins never lose a branch
    t_score = tri_counts.join(
        bg_counts.select("w1", "w2", F.col("cb").alias("c_ctx")),
        ["w1", "w2"],
    ).select(
        "w1",
        "w2",
        "w3",
        (F.col("c3").cast("double") / F.col("c_ctx").cast("double"))
        .alias("_st"),
    )
    b_score = bg_counts.join(
        uni_counts.select(
            F.col("w").alias("w1"), F.col("cu").alias("cu_ctx")
        ),
        ["w1"],
    ).select(
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        (
            F.lit(backoff)
            * (F.col("cb").cast("double") / F.col("cu_ctx").cast("double"))
        ).alias("_sb"),
    )
    u_score = uni_counts.crossJoin(F.broadcast(n_total)).select(
        F.col("w").alias("w3"),
        F.when(
            F.col("nn") > 0,
            F.lit(backoff)
            * (F.lit(backoff) * (F.col("cu").cast("double") / F.col("nn"))),
        ).otherwise(F.lit(0.0)).alias("_su"),
    )
    s = F.coalesce(
        F.col("_st"), F.col("_sb"), F.col("_su"), F.lit(0.0)
    )
    per_doc = (
        tri.join(t_score, ["w1", "w2", "w3"], "left")
        .join(b_score, ["w2", "w3"], "left")
        .join(u_score, ["w3"], "left")
        .select(
            F.col(id_col),
            F.floor(s * F.lit(1e6) + F.lit(0.5)).cast("long").alias("s_ppm"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("s_ppm").alias("_sp"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_trigrams",
        round_half_up(
            F.col("_sp").cast("double")
            / F.lit(1e6)
            / F.col("n_trigrams").cast("double"),
            6,
        ).alias("sbo_score"),
    )


def template_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    min_cluster: int = 2,
) -> DataFrame:
    """Template-spam detection by structural skeleton: every maximal
    ASCII-alphanumeric run collapses to ``x`` and whitespace runs to
    one space, so documents generated from the same fill-in template
    hash identically regardless of the filled values (kin declared:
    :func:`boilerplate_prefixes` finds shared literal PREFIXES; this
    clusters on the whole-document SHAPE).

    ASCII classes only — Java and RE2 agree on ``[A-Za-z0-9]+``
    byte-for-byte, and the whitespace class is spelled EXPLICITLY as
    ``[ \\t\\n\\f\\r]+`` because Java's ``\\s`` includes ``\\x0B``
    (vertical tab) while RE2's does not — so the skeleton is
    engine-portable by construction. Output: one row per template with ≥ ``min_cluster``
    members, with the doc count, the smallest member id, and the
    bytes the cluster occupies (dedup-savings estimate).

    Plan: one narrow projection + one groupBy on the 32-char hash —
    scan-speed; no joins, no windows, nothing quadratic.
    """
    skeleton = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), "[A-Za-z0-9]+", "x"),
            "[ \\t\\n\\f\\r]+",
            " ",
        )
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.md5(skeleton).alias("template_hash"),
            F.col(id_col),
            F.col(chars_col),
        )
        .groupBy("template_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("example_doc_id"),
            F.sum(chars_col).cast("long").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= min_cluster)
    )


def loo_source_influence(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Leave-one-source-out influence of each source on the corpus
    mean quality — the cheapest honest data-ablation estimate ("what
    happens to average quality if we drop this source?") and the
    standard first pass before expensive DSIR-style reweighting (kin
    declared: :func:`quality_score` supplies the metric;
    docs_source_divergence measures distributional distance — this
    measures the MEAN-SHIFT a source's removal causes).

    influence(s) = mean(corpus) − mean(corpus \\ s): positive means
    the source was pulling the average UP. Pure aggregate algebra:
    LOO means come from (ΣQ − ΣQ_s)/(N − n_s) on 1e4-fixpoint BIGINT
    sums — no second scan, no per-source recomputation.

    Plan: one quality pass, one groupBy(source), a 1-row corpus
    aggregate broadcast back. Scan-bound at any corpus size.
    """
    q = quality_score(df, text_col=text_col, id_col=id_col)
    src = df.select(F.col(id_col), F.col("source"))
    qi = (
        q.filter(F.col("quality_score").isNotNull())
        .join(src, id_col)
        .select(
            "source",
            F.floor(F.col("quality_score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("_q4"),
        )
    )
    per_src = qi.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("_q4").alias("_s4")
    )
    # corpus totals fold the per-source aggregate (exact long sums —
    # identical values), NOT qi: a second consumer of qi re-executes
    # the whole tokenize+stopword quality pass (quality_score is a
    # pure projection, nothing for ReuseExchange to dedup), while
    # this shape shares per_src's exchange — ONE quality pass total.
    corpus = per_src.agg(
        F.sum("n_docs").alias("_n"), F.sum("_s4").alias("_s")
    )
    j = per_src.crossJoin(F.broadcast(corpus))
    mean_all = F.col("_s").cast("double") / (
        F.lit(10000.0) * F.col("_n").cast("double")
    )
    loo = F.when(
        F.col("_n") > F.col("n_docs"),
        (F.col("_s") - F.col("_s4")).cast("double")
        / (F.lit(10000.0) * (F.col("_n") - F.col("n_docs")).cast("double")),
    )
    src_mean = F.col("_s4").cast("double") / (
        F.lit(10000.0) * F.col("n_docs").cast("double")
    )
    return j.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        round_half_up(src_mean, 6).alias("source_mean"),
        round_half_up(loo, 6).alias("loo_mean"),
        round_half_up(mean_all - loo, 6).alias("influence"),
    )


def quality_ece(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected-calibration-error decomposition
    of the per-doc quality score as a predictor of "this doc's SOURCE
    is a top-half-quality source" (kin declared:
    docs_calibrated_quality NORMALIZES scores within source; this
    MEASURES whether the raw score is calibrated against a
    source-level outcome — a non-circular doc-level probe of the
    quality-by-source halo).

    The outcome: sources rank by (mean quality desc, source asc); the
    top ⌈S/2⌉ sources are positive — an exact rank cut, no
    tie-ambiguous median. Bins are equal-width on the score; per bin
    the row reports n, mean confidence (1e4-fixpoint exact sums),
    positive fraction, |gap|, and the n_b/N-weighted ECE
    contribution (sum the column for ECE).

    Plan: one quality pass; the source ranking is a tiny aggregate
    window; the bin table is ≤ n_bins rows. Scan-bound.
    """
    from pyspark.sql import Window

    q = quality_score(df, text_col=text_col, id_col=id_col)
    src = df.select(F.col(id_col), F.col("source"))
    qi = (
        q.filter(F.col("quality_score").isNotNull())
        .join(src, id_col)
        .select(
            "source",
            F.col("quality_score").alias("_q"),
            F.floor(F.col("quality_score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("_q4"),
        )
    )
    per_src = qi.groupBy("source").agg(
        F.count(F.lit(1)).alias("_ns"), F.sum("_q4").alias("_ss")
    )
    wsrc = Window.orderBy(
        (
            F.col("_ss").cast("double") / F.col("_ns").cast("double")
        ).desc(),
        F.col("source").asc(),
    )
    ranked = per_src.select(
        "source",
        F.row_number().over(wsrc).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_S"),
    ).select(
        "source",
        (F.col("_rk") <= F.ceil(F.col("_S") / F.lit(2))).alias("_pos"),
    )
    binned = qi.join(F.broadcast(ranked), "source").select(
        F.least(
            F.lit(n_bins - 1), F.floor(F.col("_q") * F.lit(n_bins))
        ).cast("int").alias("bin"),
        "_q4",
        F.col("_pos").cast("long").alias("_y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_q4").alias("_sq"),
        F.sum("_y").alias("_sy"),
    )
    # N folds the ≤ n_bins-row bin aggregate (exact long sum), NOT
    # binned: a second consumer of binned re-executes the quality
    # pass + ranked join from the scan (pure projections — nothing
    # for ReuseExchange to dedup), while this shares agg's exchange.
    total = agg.agg(F.sum("n_docs").alias("_N"))
    conf = F.col("_sq").cast("double") / (
        F.lit(10000.0) * F.col("n_docs").cast("double")
    )
    acc = F.col("_sy").cast("double") / F.col("n_docs").cast("double")
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "bin",
            F.col("n_docs").cast("long").alias("n_docs"),
            round_half_up(conf, 6).alias("avg_conf"),
            round_half_up(acc, 6).alias("frac_pos"),
            round_half_up(
                F.col("n_docs").cast("double")
                / F.col("_N").cast("double")
                * F.abs(acc - conf),
                6,
            ).alias("ece_contrib"),
        )
    )


def term_burstiness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 50,
) -> DataFrame:
    """Per-term burstiness over the corpus: for the ``top_n`` most
    frequent terms, the variance-to-mean ratio (index of dispersion)
    of per-document occurrence counts, zeros included — VMR ≈ 1 is
    Poisson scatter, VMR ≫ 1 marks bursty/topical terms concentrated
    in few documents, the signature of template spam and topic
    boilerplate that raw frequency hides (kin declared:
    :func:`zipf_fit` fits the FREQUENCY law, :func:`top_terms_per_doc`
    ranks within docs; this measures cross-document DISPERSION).

    Exactness: VMR = (n·Σc² − cf²) / (n·cf) entirely from exact
    integer moments (DECIMAL(38,0) products), one double division;
    doc_rate = df/n likewise. The (cf desc, term asc) top-N cut is a
    deterministic total order.

    Plan: one explode → per-(doc, term) counts (map-side combinable)
    → per-term moments → TakeOrderedAndProject. Vocabulary-sized
    everywhere after the first aggregate.
    """
    docs = df.filter(F.col(text_col).isNotNull())
    nd = docs.agg(F.count(F.lit(1)).alias("_n"))
    dc = (
        docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = dc.groupBy("term").agg(
        F.count(F.lit(1)).alias("_df"),
        F.sum("_c").alias("_cf"),
        F.sum(dec(F.col("_c")) * dec(F.col("_c"))).alias("_scc"),
    )
    top = per.orderBy(
        F.col("_cf").desc(), F.col("term").asc()
    ).limit(int(top_n))
    n = F.col("_n")
    vmr = (
        (dec(n) * F.col("_scc") - dec(F.col("_cf")) * dec(F.col("_cf")))
        .cast("double")
        / (dec(n) * dec(F.col("_cf"))).cast("double")
    )
    return top.crossJoin(F.broadcast(nd)).select(
        "term",
        F.col("_df").cast("long").alias("doc_freq"),
        F.col("_cf").cast("long").alias("coll_freq"),
        round_half_up(
            F.col("_df").cast("double") / n.cast("double"), 6
        ).alias("doc_rate"),
        round_half_up(vmr, 6).alias("burstiness_vmr"),
    )


def rater_agreement(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cohen's kappa between two deterministic binary quality raters
    (kin declared: :func:`quality_ece` measures CALIBRATION of a
    score against an outcome; this measures AGREEMENT between two
    raters — the inter-annotator-consistency check run before
    trusting any single heuristic as a filter label):

    - rater A (length): n_tokens ≥ 30
    - rater B (lexical diversity): 2·n_unique ≥ n_tokens

    Both raters are pure integer predicates, so the 2×2 table is
    exact on both engines; po, pe, and kappa = (n·agree − pe_num) /
    (n² − pe_num) with pe_num = a1·b1 + a0·b0 combine exact
    DECIMAL(38,0) counts in double once. ONE output row; NULL kappa
    when a rater is constant (pe = 1, the undefined case).

    Plan: one projection + one 4-cell aggregate — scan-speed.
    """
    docs = df.filter(F.col(text_col).isNotNull())
    toks = tokens(F.col(text_col))
    rated = docs.select(
        (F.size(toks) >= 30).alias("_a"),
        (
            F.lit(2) * F.size(F.array_distinct(toks)) >= F.size(toks)
        ).alias("_b"),
    )
    cell = rated.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("_a") & F.col("_b"), 1).otherwise(0)).alias(
            "_n11"
        ),
        F.sum(F.when(F.col("_a") & ~F.col("_b"), 1).otherwise(0)).alias(
            "_n10"
        ),
        F.sum(F.when(~F.col("_a") & F.col("_b"), 1).otherwise(0)).alias(
            "_n01"
        ),
        F.sum(F.when(~F.col("_a") & ~F.col("_b"), 1).otherwise(0)).alias(
            "_n00"
        ),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a1 = F.col("_n11") + F.col("_n10")
    a0 = F.col("_n01") + F.col("_n00")
    b1 = F.col("_n11") + F.col("_n01")
    b0 = F.col("_n10") + F.col("_n00")
    agree = F.col("_n11") + F.col("_n00")
    pe_num = dec(a1) * dec(b1) + dec(a0) * dec(b0)
    n = F.col("_n")
    po = agree.cast("double") / n.cast("double")
    pe = pe_num.cast("double") / (n.cast("double") * n.cast("double"))
    k_num = (dec(n) * dec(agree) - pe_num).cast("double")
    k_den = (dec(n) * dec(n) - pe_num).cast("double")
    return cell.filter(F.col("_n") > 0).select(
        F.col("_n").cast("long").alias("n_docs"),
        F.col("_n11").cast("long").alias("n_both_good"),
        F.col("_n10").cast("long").alias("n_only_a"),
        F.col("_n01").cast("long").alias("n_only_b"),
        F.col("_n00").cast("long").alias("n_neither"),
        round_half_up(po, 6).alias("p_observed"),
        round_half_up(pe, 6).alias("p_expected"),
        F.when(k_den != 0, round_half_up(k_num / k_den, 6)).alias(
            "kappa"
        ),
    )


def ocr_garbage_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """OCR/extraction-garbage heuristics per document from explicit
    character-class counts (kin declared: text_unicode_health audits
    the codepoint inventory; this scores TOKEN-SHAPE damage — the
    digit-letter blends, symbol residue, and single-char shrapnel
    that OCR and bad PDF extraction leave behind):

    - mixed_token_share: tokens containing BOTH a digit and a letter
    - nonalnum_char_share: characters outside
      ``[a-zA-Z0-9 \\t\\n\\f\\r]`` (explicit class — the Java-vs-RE2
      ``\\s``/``\\x0B`` lesson) over all characters
    - single_char_share: 1-character tokens
    - garbage_score: the plain mean ((m + s) + c) / 3 of the three

    Exactness: every numerator/denominator is an exact integer
    count; the shares and mean divide in double with one spelled op
    order, floor-rounded at 6dp. Empty docs emit NULL shares (no
    division by zero on either engine).

    Plan: per-row projection only — no shuffle, scan-speed.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mixed = F.size(
        F.filter(
            toks,
            lambda t: t.rlike("[0-9]") & t.rlike("[a-zA-Z]"),
        )
    )
    single = F.size(F.filter(toks, lambda t: F.length(t) == 1))
    nonal = n_chars - F.length(
        F.regexp_replace(
            F.col(text_col), "[^a-zA-Z0-9 \t\n\f\r]", ""
        )
    )
    m_share = F.when(
        n_tok > 0, mixed.cast("double") / n_tok.cast("double")
    )
    s_share = F.when(
        n_tok > 0, single.cast("double") / n_tok.cast("double")
    )
    c_share = F.when(
        n_chars > 0, nonal.cast("double") / n_chars.cast("double")
    )
    score = F.when(
        (n_tok > 0) & (n_chars > 0),
        ((m_share + s_share) + c_share) / F.lit(3.0),
    )
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        round_half_up(m_share, 6).alias("mixed_token_share"),
        round_half_up(s_share, 6).alias("single_char_share"),
        round_half_up(c_share, 6).alias("nonalnum_char_share"),
        round_half_up(score, 6).alias("garbage_score"),
    )
