"""2-D Pareto frontier (skyline) — multi-criteria selection without
the quadratic dominance join.

The training-data use: pick documents that are Pareto-optimal in
(quality ↑, length ↓) — no doc both shorter and better exists — the
principled shortlist when one scalar threshold over-fits a single
axis. The classic SQL formulation is a NOT EXISTS anti-join (O(n²));
the skyline literature's sort-based algorithms serialize the corpus.
Neither survives 100 TB.

This plan reduces first: for each distinct minimize-value x only the
best maximize-value M(x) can be on the frontier (anything else at x is
dominated by it), so dominance collapses to a running-max sweep over
the AGGREGATED (x, M(x)) table — bounded by the minimize column's
distinct-value count, not the row count (token lengths: thousands).
The sweep is one tiny window; survivors semi-join back to rows. Same
discipline as weighted_median_exact: the inherently-ordered step runs
over aggregated state, raw rows never sort.

Reference context: the reference has no multi-criteria selection
(25-row corpora); [ext] scale scope per SURVEY.md §2 Table B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    maximize_col: str,
    minimize_col: str,
) -> DataFrame:
    """Rows on the 2-D Pareto frontier: no other row has
    ``minimize_col`` ≤ AND ``maximize_col`` ≥ with at least one
    strict. Rows tying an optimal (x, M(x)) pair are mutually
    non-dominating and all kept — standard skyline tie semantics.

    Returns the input rows filtered to the frontier (all columns
    preserved). Nulls in either criterion are excluded up front —
    dominance is undefined for them.
    """
    mx, mn = maximize_col, minimize_col
    d = df.filter(F.col(mx).isNotNull() & F.col(mn).isNotNull())
    # best maximize per distinct minimize value — the only candidates
    best = d.groupBy(mn).agg(F.max(mx).alias("_best"))
    sweep = Window.orderBy(mn).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        best.withColumn("_prevmax", F.max("_best").over(sweep))
        .filter(
            F.col("_prevmax").isNull()
            | (F.col("_best") > F.col("_prevmax"))
        )
        .select(mn, F.col("_best").alias(mx))
    )
    return d.join(F.broadcast(frontier), [mn, mx], "left_semi")
