"""Duplicate-cluster resolution: near-dup pairs -> connected components.

The step after pair generation in a dedup pipeline: group transitively
connected near-duplicates into clusters and pick a canonical document
(min doc_id) per cluster, so exactly one survivor per cluster is kept.

Spark shape: iterative min-label propagation — each round every node
takes the min label among itself and its neighbors; converges in
O(component diameter) rounds (near-dup clusters are shallow). Each round
is one join + one aggregation, all JVM-side; the driver loop only checks
the convergence counter (the standard batch connected-components shape;
GraphFrames does the same under the hood). The DuckDB oracle replicates
it with a recursive transitive-closure CTE — so even this iterative
operator is fully hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair list.

    Returns (doc_id, cluster_id) for every doc appearing in >= 1 pair,
    where cluster_id is the minimum doc_id of the component. Deterministic
    (pure min-semilattice fixpoint — iteration order cannot change it).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).cache()
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .cache()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # falling through would silently split one component into several
        # clusters (labels past the propagation frontier never updated)
        raise RuntimeError(
            f"duplicate_clusters did not converge within {max_iterations} "
            f"iterations — a component's diameter exceeds it; raise "
            f"max_iterations (rounds needed ~= longest chain length)"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def duplicate_clusters_sql(pairs_sql: str) -> str:
    """DuckDB twin: transitive closure via recursive CTE over the SAME
    pair-producing query (pass the oracle SQL of the pair operator)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
r(n, m) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.n, e.b FROM r JOIN e ON r.m = e.a WHERE e.b <> r.n
)
SELECT n AS doc_id, LEAST(n, MIN(m)) AS cluster_id FROM r GROUP BY n
"""
