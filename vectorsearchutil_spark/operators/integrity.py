"""Referential-integrity audit: orphan detection over declared
foreign-key edges — the ingest-time data-quality gate a 100 TB
pipeline runs before joins silently drop (inner) or null-extend
(outer) unmatched rows. Complements ``documents_profile``'s
per-column null/distinct profile with cross-TABLE structure.

Scale shape per edge: the child side aggregates to per-key counts
FIRST (map-side combine collapses the fact table to its key
cardinality), then one left-anti join against the parent key set —
when the parent is a dimension its key set broadcasts, so the only
raw-row work is the child's one aggregate shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fk_orphan_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Audit a list of FK edges: each entry is
    ``(edge_name, child_df, child_key, parent_df, parent_key)``.

    Output, one row per edge: (edge, n_children, n_distinct_keys,
    n_orphan_rows, n_orphan_keys, orphan_rate) — orphans are child
    rows whose key is non-NULL and absent from the parent (NULL FKs
    are not orphans; they are visible in ``n_children`` minus the
    per-key sums).

    The per-edge results are tiny (1 row), so the audit unions them
    into one DataFrame — each edge's plan stays independent and
    Catalyst schedules them as separate subtrees.
    """
    from vectorsearchutil_spark.functions.vector import round_half_up

    if not edges:
        raise ValueError("fk_orphan_audit: empty edges list")
    outs = []
    for name, child, child_key, parent, parent_key in edges:
        keys = (
            child.filter(F.col(child_key).isNotNull())
            .groupBy(F.col(child_key).alias("_k"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        pk = parent.select(F.col(parent_key).alias("_k")).distinct()
        orphans = keys.join(pk, "_k", "left_anti")
        total = child.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_children")
        )
        agg = orphans.agg(
            F.coalesce(F.sum("_n"), F.lit(0))
            .cast("bigint")
            .alias("n_orphan_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"),
        )
        nkeys = keys.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_keys")
        )
        outs.append(
            total.crossJoin(nkeys)
            .crossJoin(agg)
            .select(
                F.lit(name).alias("edge"),
                "n_children",
                "n_distinct_keys",
                "n_orphan_rows",
                "n_orphan_keys",
                round_half_up(
                    F.coalesce(
                        F.try_divide(
                            F.col("n_orphan_rows").cast("double"),
                            F.col("n_children").cast("double"),
                        ),
                        F.lit(0.0),
                    ),
                    6,
                ).alias("orphan_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def tpch_fk_edges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, DataFrame, str, DataFrame, str]]:
    """The declared FK edges of the test schema (TPC-H subset plus
    the events→customer link used by the enrichment queries)."""
    from vectorsearchutil_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    events = load_table(spark, sf_dir, "events")
    return [
        ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        ("lineitem->part", li, "l_partkey", part, "p_partkey"),
        ("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"),
        ("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        ("events->customer", events, "user_id", cust, "c_custkey"),
    ]
