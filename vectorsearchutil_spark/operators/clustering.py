"""Iterative k-means (Lloyd's) over an embedding column.

The iterative-algorithm pattern on Spark: each iteration is a full
declarative plan (assign = corpus ⨯ broadcast(centroids) argmin;
recompute = posexplode + groupBy avg), driven by a Python loop.
Centroids are tiny so they broadcast; the corpus never shuffles
during assignment — per iteration the only shuffle is the centroid
recompute, which partial-aggregates down to k×dim values.

Determinism: init = the k lowest-id vectors; ties in assignment break
to the lowest centroid id; centroids round to 6dp each iteration so
independent engines (and the DuckDB oracle, which unrolls the same
iterations in SQL) converge bit-identically.

At 100 TB you would persist assignments per iteration (checkpoint to
break lineage) and sample for the centroid update; the operator keeps
the exact form since its contract is oracle-checkable determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorsearchutil_spark.functions.vector import l2_distance


def _recompute_centroids(
    assigned: DataFrame, vector_col: str, dim: int
) -> DataFrame:
    # posexplode + (cid,pos) groupBy beats a 64-column wide avg agg
    # here (measured ~1.5×): the narrow long-format aggregate stays in
    # one tight codegen loop while 64 separate element_at aggregates
    # bloat the generated code
    return (
        assigned.select(
            "cid",
            F.posexplode(F.col(vector_col).cast("array<double>")).alias(
                "pos", "v"
            ),
        )
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("v"), 6).alias("v"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("s"))
        .select("cid", F.transform("s", lambda x: x["v"]).alias("cv"))
    )


def _assign(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vector_col: str,
    id_col: str,
) -> DataFrame:
    """Assign each row to its nearest centroid.

    The k centroids travel as ONE broadcast row holding an
    array<struct(cid, cv)>; argmin is array_min over (distance, cid)
    structs (struct ordering is lexicographic, so ties break to the
    lowest cid). Fully narrow: no per-centroid row expansion, no
    window shuffle — the corpus is scanned once per iteration and
    never moves. Data-driven (not literal-inlined) centroids keep
    the generated code small and stable across iterations."""
    spark = df.sparkSession
    cents_row = spark.createDataFrame(
        [([(int(c), [float(x) for x in v]) for c, v in sorted(cents)],)],
        "cents array<struct<cid:int,cv:array<double>>>",
    )
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                l2_distance(F.col(vector_col), c["cv"]).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        df.crossJoin(F.broadcast(cents_row))
        .withColumn("_b", best)
        .select(df["*"], F.col("_b.cid").alias("cid"), F.col("_b.d").alias("_d"))
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iterations`` Lloyd's steps; returns (assignments,
    centroids). Assignments: (id, cid, distance to its centroid).
    Always returns exactly ``k`` centroids: a cluster that goes empty
    during an iteration retains its previous centroid (it can win
    rows back later; no silent shrink).

    Centroids are collected to the driver after every update (k×dim
    doubles — trivial) and re-inlined as literals: this truncates the
    iterative lineage, so iteration N is ONE pass over the corpus
    instead of re-executing every earlier iteration inside the
    broadcast subtree (the classic iterative-plan blowup). The 6dp
    centroid rounding round-trips exactly through Python floats, so
    results are bit-identical to the lineage-chained form."""
    # narrow working set, cached across the iteration jobs — each
    # Lloyd's round re-reads (id, vector) only, from memory (at
    # 100 TB: persist MEMORY_AND_DISK or checkpoint, same idea)
    work = df.select(id_col, vector_col).cache()
    init = (
        work.orderBy(id_col)
        .limit(k)
        .select(F.col(vector_col).cast("array<double>").alias("cv"))
        .collect()
    )
    cents = [(i, list(r["cv"])) for i, r in enumerate(init)]
    for _ in range(iterations):
        assigned = _assign(work, cents, vector_col, id_col)
        rows = _recompute_centroids(assigned, vector_col, dim).collect()
        # a cluster that lost every member keeps its previous centroid
        # (deterministic, k never shrinks); the recompute groupBy only
        # emits cids with members, so merge over the prior set
        new = {r["cid"]: list(r["cv"]) for r in rows}
        cents = sorted((c, new.get(c, v)) for c, v in cents)
    final = _assign(work, cents, vector_col, id_col)
    centroids = df.sparkSession.createDataFrame(
        [(int(c), list(v)) for c, v in cents], "cid int, cv array<double>"
    )
    return (
        final.select(
            F.col(id_col),
            F.col("cid").alias("cluster"),
            F.round(F.col("_d"), 4).alias("distance"),
        ),
        centroids,
    )
