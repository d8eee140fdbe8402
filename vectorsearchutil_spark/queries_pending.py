"""Round-6 PENDING query registry.

The live registry is FROZEN at 188 entries until the round-5 driver
window closes the 43-query rotation (VERDICT r4 "Next round" #1/#3:
new entries must not outgrow the ~50-row driver window again). These
six operators are the round-6 wave, fully implemented and
oracle-checked NOW — ``CHECK_ORACLES_PENDING=1
python tools/check_oracles.py`` runs them through the same
driver-strict gate — but kept OUT of ``__spark_entry__.queries()``
so the frozen registry stays bit-identical for the external gate.
Round 6 promotes them by moving each ``@pending_query`` to
``@query`` (same names, same oracles) once CORRECTNESS_r05 lands
188/188.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorsearchutil_spark.sources.readers import load_table

PENDING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PENDING_ORACLES: dict[str, str] = {}


def pending_query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from vectorsearchutil_spark.session import (
                ensure_package_on_executors,
            )

            ensure_package_on_executors(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        PENDING_QUERIES[name] = wrapped
        if oracle is not None:
            PENDING_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# 1. Benchmark-contamination screen (per-doc 8-gram overlap RATIO —
#    complements docs_decontamination's hits-only shared count)
# --------------------------------------------------------------------------

_CONTAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
),
sh0 AS (
  SELECT doc_id, t,
         unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         t[i] || '_' || t[i+1] || '_' || t[i+2] || '_' || t[i+3] || '_' ||
         t[i+4] || '_' || t[i+5] || '_' || t[i+6] || '_' || t[i+7]
           AS shingle
  FROM sh0
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
agg AS (
  SELECT s.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
           AS n_contaminated
  FROM sh s LEFT JOIN ev e ON s.shingle = e.shingle
  WHERE s.doc_id >= 50
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_grams, 0) AS INT) AS n_grams,
       CAST(COALESCE(a.n_contaminated, 0) AS INT) AS n_contaminated,
       floor(COALESCE(CAST(a.n_contaminated AS DOUBLE)
                      / CAST(a.n_grams AS DOUBLE), 0.0)
             * 1000000.0 + 0.5) / 1000000.0 AS contamination_ratio
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
WHERE d.doc_id >= 50
"""


@pending_query("docs_benchmark_contamination", _CONTAM_ORACLE)
def docs_benchmark_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-training-doc benchmark contamination ratio: the fraction
    of each train doc's (doc_id ≥ 50) distinct 8-gram shingles that
    appear anywhere in the held-out slice (doc_id < 50) — the
    quantity decontamination pipelines threshold on. EVERY train doc
    is emitted (ratio 0.0 when clean or sub-8-token)."""
    from vectorsearchutil_spark.operators.textanalysis import (
        benchmark_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    return benchmark_contamination(
        docs.filter(F.col("doc_id") >= 50),
        docs.filter(F.col("doc_id") < 50),
        n=8,
    )


# --------------------------------------------------------------------------
# 2. Quality-aware duplicate survivor (keep BEST, not first)
# --------------------------------------------------------------------------


def _keep_best_oracle() -> str:
    from vectorsearchutil_spark.queries import _CC_EDGES_CTE

    return f"""
WITH RECURSIVE {_CC_EDGES_CTE},
members AS (
  SELECT c.doc_id, c.component, d.n_chars
  FROM comp c JOIN documents d ON c.doc_id = d.doc_id
),
best AS (
  SELECT component, doc_id AS keep_id FROM (
    SELECT component, doc_id,
           row_number() OVER (
             PARTITION BY component
             ORDER BY n_chars DESC, doc_id ASC
           ) AS rn
    FROM members
  ) WHERE rn = 1
),
losers AS (
  SELECT m.doc_id
  FROM members m JOIN best b ON m.component = b.component
  WHERE m.doc_id != b.keep_id
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
"""


@pending_query("dedup_keep_best")
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped corpus keeping the LONGEST member of each near-dup
    cluster (3-gram Jaccard ≥ 0.8 → connected components → argmax
    n_chars, ties min doc_id) — the production survivor rule, vs
    ``dedup_canonical_docs``' min-id rule."""
    from vectorsearchutil_spark.operators import dedup as _dd

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dd.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    return _dd.keep_best_representative(
        docs.select("doc_id", "lang", "n_chars"), pairs, "n_chars"
    )


PENDING_ORACLES["dedup_keep_best"] = _keep_best_oracle()


# --------------------------------------------------------------------------
# 3. Tokenizer-aware truncation loss at candidate context lengths
# --------------------------------------------------------------------------

_TRUNC_ORACLE = """
WITH cnt AS (
  SELECT doc_id,
         len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+'))
           AS n_tok
  FROM documents
),
x AS (
  SELECT doc_id, n_tok, unnest([16, 32, 64]) AS ctx_len FROM cnt
)
SELECT CAST(ctx_len AS INT) AS ctx_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_tok > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
         AS n_truncated,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN n_tok > ctx_len THEN n_tok - ctx_len
                     ELSE 0 END) AS BIGINT) AS lost_tokens,
       floor(COALESCE(CAST(SUM(CASE WHEN n_tok > ctx_len
                                    THEN n_tok - ctx_len
                                    ELSE 0 END) AS DOUBLE)
                      / CAST(NULLIF(SUM(n_tok), 0) AS DOUBLE), 0.0)
             * 1000000.0 + 0.5) / 1000000.0 AS lost_frac
FROM x GROUP BY ctx_len
"""


@pending_query("docs_truncation_stats", _TRUNC_ORACLE)
def docs_truncation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide truncation loss if trained at context lengths
    {16, 32, 64} BPE-ish tokens: docs truncated, tokens lost, lost
    fraction — the sizing pass before choosing a packing length."""
    from vectorsearchutil_spark.operators.textanalysis import (
        truncation_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return truncation_stats(docs, [16, 32, 64])


# --------------------------------------------------------------------------
# 4. t-digest-lite: mergeable equi-depth centroid sketch quantiles
# --------------------------------------------------------------------------

_TDIGEST_ORACLE = """
WITH rows0 AS (
  SELECT CAST(event_id AS BIGINT) AS id, value::DOUBLE AS v
  FROM events
  WHERE value IS NOT NULL AND isfinite(value)
),
rows1 AS (
  SELECT id, v,
         CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_fp,
         CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
              % 32 AS INT) AS bucket
  FROM rows0
),
ranked AS (
  SELECT bucket, v_fp,
         row_number() OVER (PARTITION BY bucket ORDER BY v, id) AS rk,
         COUNT(*) OVER (PARTITION BY bucket) AS bn
  FROM rows1
),
cents AS (
  SELECT bucket,
         CAST(floor((rk - 1) * 64 / bn) AS INT) AS slice,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v_fp) AS BIGINT) AS sum_fp
  FROM ranked GROUP BY bucket, slice
),
cum AS (
  SELECT bucket, slice, n,
         (CAST(sum_fp AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0
           AS mean,
         SUM(n) OVER (
           ORDER BY (CAST(sum_fp AS DOUBLE) / CAST(n AS DOUBLE))
                    / 1000000.0, bucket, slice
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM cents
),
tot AS (SELECT SUM(n) AS total_n FROM cents),
qs AS (SELECT unnest(CAST([0.1, 0.5, 0.9, 0.99] AS DOUBLE[])) AS q)
SELECT q,
       floor(arg_min(mean, cum) * 10000.0 + 0.5) / 10000.0 AS est
FROM cum, tot, qs
WHERE cum >= greatest(1, ceil(q * CAST(total_n AS DOUBLE)))
GROUP BY q
"""


@pending_query("events_value_tdigest", _TDIGEST_ORACLE)
def events_value_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p10/p50/p90/p99 of event value from the t-digest-lite sketch
    (32 buckets × 64 centroids of fixed-point mergeable state) — the
    constant-size complement to the exact histogram-refinement
    quantile family."""
    from vectorsearchutil_spark.operators.sketches import (
        tdigest_centroids,
        tdigest_quantiles,
    )

    e = load_table(spark, sf_dir, "events")
    cents = tdigest_centroids(
        e, "value", "event_id", n_buckets=32, n_centroids=64
    )
    return tdigest_quantiles(cents, [0.1, 0.5, 0.9, 0.99])


# --------------------------------------------------------------------------
# 5. Cross-encoder rerank over a first-stage kNN shortlist
# --------------------------------------------------------------------------

_CE_RERANK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 3
),
c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id >= 3
),
scored AS (
  SELECT q.query_id, c.vec_id,
         floor(list_cosine_similarity(c.cv, q.qv) * 1000000.0 + 0.5)
           / 1000000.0 AS s,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(c.cv, q.qv) DESC,
                    c.vec_id ASC
         ) AS rn
  FROM q, c
),
short AS (SELECT query_id, vec_id, s FROM scored WHERE rn <= 20),
ce AS (
  SELECT query_id, vec_id,
         floor((0.8 * s + 0.2 *
                (('0x' || substr(md5('ce:' || query_id || ':' || vec_id),
                                 1, 8))::BIGINT / 4294967296.0))
               * 1000000.0 + 0.5) / 1000000.0 AS ce_score
  FROM short
)
SELECT query_id, vec_id, ce_score, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY ce_score DESC, vec_id ASC
  ) AS rank FROM ce
) WHERE rank <= 5
"""


@pending_query("knn_crossencoder_rerank", _CE_RERANK_ORACLE)
def knn_crossencoder_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: brute-force cosine top-20 shortlist per
    query (vec_id < 3 as queries, rest as corpus), then the stub
    cross-encoder (0.8·cosine + 0.2·md5-pair-uniform) reranks to
    top-5 via grouped-Arrow ``applyInPandas`` — the
    retrieve-then-rerank stack with deterministic, oracle-checkable
    scores. First-stage scores floor-round to 6dp on BOTH sides
    before blending, so engine cosine ulps cannot leak into the
    blend."""
    from pyspark.sql import Window

    from vectorsearchutil_spark.functions.vector import (
        cosine_similarity,
        round_half_up,
    )
    from vectorsearchutil_spark.operators.reranker import rerank_shortlist

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 3).select(
        "vec_id", F.col("embedding").alias("cv")
    )
    cos = cosine_similarity("cv", "qv")
    w = Window.partitionBy("query_id").orderBy(
        cos.desc(), F.col("vec_id").asc()
    )
    short = (
        c.crossJoin(F.broadcast(q))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "query_id",
            "vec_id",
            round_half_up(cos, 6).alias("score"),
        )
    )
    return rerank_shortlist(short, k=5, id_col="vec_id")


# --------------------------------------------------------------------------
# 6. Shuffle-key skew diagnostic
# --------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH counts AS (
  SELECT COALESCE(CAST(event_type AS VARCHAR), '<null>') AS key,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(n_rows) AS total FROM counts)
SELECT key, n_rows,
       floor(CAST(n_rows AS DOUBLE) / total * 1000000.0 + 0.5)
         / 1000000.0 AS share,
       CAST(greatest(1, ceil(CAST(n_rows AS DOUBLE) / total / 0.02))
            AS INT) AS suggested_salt
FROM counts, tot
ORDER BY n_rows DESC, key ASC
LIMIT 10
"""


@pending_query("events_skew_report", _SKEW_ORACLE)
def events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type row share + the salt factor that would flatten
    each hot key to ≤2% of the shuffle — the measurement before
    salted aggregation / AQE skew hints."""
    from vectorsearchutil_spark.functions.skew import skew_report

    e = load_table(spark, sf_dir, "events")
    return skew_report(e, "event_type", top_n=10, target_share=0.02)


# --------------------------------------------------------------------------
# 7. Containment near-dup pairs (short-doc-inside-long-doc)
# --------------------------------------------------------------------------

_CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
),
sh0 AS (
  SELECT doc_id, t,
         unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         t[i] || '_' || t[i+1] || '_' || t[i+2] AS shingle
  FROM sh0
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       floor(CAST(i.inter AS DOUBLE)
             / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS containment
FROM inter i
JOIN sizes sa ON i.id_a = sa.doc_id
JOIN sizes sb ON i.id_b = sb.doc_id
WHERE i.inter >= ceil(CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) * 0.9)
"""


@pending_query("docs_containment_pairs", _CONTAINMENT_ORACLE)
def docs_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: pairs where ≥90% of the SMALLER doc's
    3-gram shingles appear in the larger one — quoting / boilerplate
    inclusion that Jaccard misses. Prefix-filtered inverted index
    (smaller side probes, larger side indexes in full)."""
    from vectorsearchutil_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, n=3, threshold=0.9)


# --------------------------------------------------------------------------
# 8. ANN hubness diagnostic (k-occurrence distribution)
# --------------------------------------------------------------------------

_HUBNESS_ORACLE = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
vv AS (
  -- the operator's participation contract: NULL / non-finite /
  -- zero-norm vectors neither query nor get counted
  SELECT vec_id, e FROM v
  WHERE e IS NOT NULL
    AND len(list_filter(e, x -> x IS NULL OR NOT isfinite(x))) = 0
    AND list_dot_product(e, e) > 0
),
nn AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(b.e, a.e) DESC, b.vec_id ASC
         ) AS rk
  FROM vv a JOIN vv b ON a.vec_id != b.vec_id
),
occ AS (SELECT nid, COUNT(*) AS n FROM nn WHERE rk <= 10 GROUP BY nid)
SELECT v.vec_id, CAST(COALESCE(occ.n, 0) AS INT) AS k_occurrence
FROM v LEFT JOIN occ ON v.vec_id = occ.nid
"""


@pending_query("embeddings_hubness", _HUBNESS_ORACLE)
def embeddings_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence (k=10, cosine) of every embedding: how many other
    points count it among their 10 nearest — the hubness skew check
    run before trusting ANN recall."""
    from vectorsearchutil_spark.operators.knn import knn_hubness

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_hubness(
        emb, k=10, vector_col="embedding", id_col="vec_id",
        metric="cosine", n_rows=emb.count(),
    )


# --------------------------------------------------------------------------
# 9. Referential-integrity audit over the declared FK edges
# --------------------------------------------------------------------------


def _fk_edge_sql(name: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
SELECT '{name}' AS edge,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_children,
       CAST((SELECT COUNT(DISTINCT {ckey}) FROM {child}
             WHERE {ckey} IS NOT NULL) AS BIGINT) AS n_distinct_keys,
       CAST(COALESCE((
         SELECT SUM(n) FROM (
           SELECT k.{ckey}, COUNT(*) AS n FROM {child} k
           WHERE k.{ckey} IS NOT NULL GROUP BY 1
         ) kk LEFT JOIN {parent} p ON kk.{ckey} = p.{pkey}
         WHERE p.{pkey} IS NULL), 0) AS BIGINT) AS n_orphan_rows,
       CAST(COALESCE((
         SELECT COUNT(*) FROM (
           SELECT DISTINCT {ckey} FROM {child} WHERE {ckey} IS NOT NULL
         ) kk LEFT JOIN {parent} p ON kk.{ckey} = p.{pkey}
         WHERE p.{pkey} IS NULL), 0) AS BIGINT) AS n_orphan_keys,
       floor(COALESCE(CAST((
         SELECT SUM(n) FROM (
           SELECT k.{ckey}, COUNT(*) AS n FROM {child} k
           WHERE k.{ckey} IS NOT NULL GROUP BY 1
         ) kk LEFT JOIN {parent} p ON kk.{ckey} = p.{pkey}
         WHERE p.{pkey} IS NULL) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM {child}) AS DOUBLE), 0.0)
         * 1000000.0 + 0.5) / 1000000.0 AS orphan_rate
"""


_FK_ORACLE = " UNION ALL ".join(
    _fk_edge_sql(*e)
    for e in [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders",
         "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
         "s_suppkey"),
        ("orders->customer", "orders", "o_custkey", "customer",
         "c_custkey"),
        ("events->customer", "events", "user_id", "customer",
         "c_custkey"),
    ]
)


@pending_query("tpch_fk_integrity", _FK_ORACLE)
def tpch_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit over the schema's five FK edges: per edge, child
    rows / distinct keys / orphan rows / orphan keys / orphan rate —
    the ingest-time integrity gate before any join-based pipeline."""
    from vectorsearchutil_spark.operators.integrity import (
        fk_orphan_audit,
        tpch_fk_edges,
    )

    return fk_orphan_audit(tpch_fk_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# 10. Retrieval ranking-quality eval: MRR / NDCG@10 by label match
# --------------------------------------------------------------------------


def _retrieval_metrics_oracle(k: int = 10) -> str:
    import math

    from vectorsearchutil_spark.operators.evaluation import ndcg_discounts

    disc_fp = [
        int(math.floor(d * 1e12 + 0.5)) for d in ndcg_discounts(k)
    ]
    idcg = [0]
    for d in disc_fp:
        idcg.append(idcg[-1] + d)
    disc_lit = "[" + ", ".join(str(d) for d in disc_fp) + "]"
    idcg_lit = "[" + ", ".join(str(v) for v in idcg) + "]"
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 50
),
c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv, label
  FROM embeddings WHERE NOT (vec_id < 50)
),
top AS (
  SELECT query_id, rk, rel FROM (
    SELECT q.query_id,
           CASE WHEN c.label = q.qlabel THEN 1 ELSE 0 END AS rel,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(c.cv, q.qv) DESC,
                      c.vec_id ASC
           ) AS rk
    FROM q, c
  ) WHERE rk <= {k}
),
per_q AS (
  SELECT query_id,
         COALESCE(MIN(CASE WHEN rel = 1 THEN rk END), 0) AS first_rel,
         CAST(SUM(rel * ({disc_lit})[rk]) AS BIGINT) AS dcg_fp,
         CAST(SUM(rel) AS INT) AS n_relevant
  FROM top GROUP BY query_id
)
SELECT query_id, n_relevant,
       floor((CASE WHEN first_rel > 0
                   THEN CAST(1 AS DOUBLE) / first_rel
                   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS mrr,
       floor((CASE WHEN n_relevant = 0 THEN 0.0
                   ELSE CAST(dcg_fp AS DOUBLE)
                        / CAST(({idcg_lit})[n_relevant + 1] AS DOUBLE)
              END) * 1000000.0 + 0.5) / 1000000.0 AS ndcg
FROM per_q
"""


@pending_query("embeddings_retrieval_metrics")
def embeddings_retrieval_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query MRR and NDCG@10 with label-match relevance over the
    vec_id < 50 eval slice vs the rest of the corpus — the
    ranking-quality metric pair next to ann_ivf_recall's candidate
    recall. Fixed-point literal log2 discounts keep both engines
    bit-identical (order-free long sums)."""
    from vectorsearchutil_spark.operators.evaluation import (
        retrieval_label_metrics,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return retrieval_label_metrics(
        emb,
        F.col("vec_id") < 50,
        k=10,
        vector_col="embedding",
        id_col="vec_id",
        label_col="label",
    )


PENDING_ORACLES["embeddings_retrieval_metrics"] = (
    _retrieval_metrics_oracle(10)
)


# --------------------------------------------------------------------------
# 11. Per-row percentile rank (two-level, value-domain-bounded state)
# --------------------------------------------------------------------------

_PCT_RANK_ORACLE = """
WITH base AS (
  SELECT event_id, event_type AS g,
         CASE WHEN value IS NOT NULL AND isfinite(value)
              THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END AS qv
  FROM events
),
counts AS (
  SELECT g, qv, COUNT(*) AS cnt FROM base
  WHERE qv IS NOT NULL GROUP BY g, qv
),
pre AS (
  SELECT g, qv,
         SUM(cnt) OVER (
           PARTITION BY g ORDER BY qv
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - cnt AS below,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM counts
)
SELECT b.event_id, b.g AS event_type,
       floor(CAST(p.below AS DOUBLE)
             / CAST(NULLIF(p.n - 1, 0) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS pct_rank
FROM base b LEFT JOIN pre p ON b.g = p.g AND b.qv = p.qv
"""


@pending_query("events_percentile_rank", _PCT_RANK_ORACLE)
def events_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event enriched with its within-type percentile rank at
    cent resolution — the per-row member of the quantile family,
    built on per-(type, cent) counts so the window state is bounded
    by the value domain, never by row count."""
    from vectorsearchutil_spark.operators.sketches import (
        percentile_rank_enrich,
    )

    e = load_table(spark, sf_dir, "events")
    return percentile_rank_enrich(
        e, "value", "event_type", "event_id", resolution=2
    )
