"""Duplicate-cluster resolution: near-dup pairs -> connected components.

The step after pair generation in a dedup pipeline: group transitively
connected near-duplicates into clusters and pick a canonical document
(min doc_id) per cluster, so exactly one survivor per cluster is kept.

Spark shape: iterative min-label propagation with PATH HALVING — each
round every node takes the min label among itself and its neighbors,
then follows the label chain one hop (label := min(label,
label(label))). Halving collapses chains geometrically, so convergence
is O(log diameter) rounds instead of O(diameter) (the Shiloach-Vishkin
shortcut; cf. the large-star/small-star formulation of Kiveris et al.,
"Connected Components in MapReduce and Beyond"): a 1,000-node chain
closes in ~12 rounds. Each round is one Spark job (join + agg + one
self-join), all JVM-side; the driver loop only checks the convergence
counter. The DuckDB oracle replicates the fixpoint with a recursive
transitive-closure CTE — so even this iterative operator is fully
hash-checked.

Correctness of the shortcut: labels are node ids, only ever decrease,
and every value a label takes is a node of the same component (a min
over component members), so label(label(u)) is also a same-component
node id — halving preserves the invariant and cannot jump components.
At the fixpoint adjacent nodes satisfy label(u) <= label(v) and
label(v) <= label(u), hence equal along every path, and the component
min m has label(m) = m: every node ends at m.
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
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
            )
            prop = labels.join(
                neighbor_min, labels.node == neighbor_min.src, "left"
            ).select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("_p"),
            )
            # path halving: label := min(label, label(label)) — one
            # self-join on the freshly-propagated mapping
            hop = prop.select(F.col("node").alias("_pn"), F.col("_p").alias("_pl"))
            updated = (
                prop.join(hop, prop["_p"] == hop["_pn"], "left")
                .select(
                    "node",
                    "_old",
                    F.least(
                        F.col("_p"), F.coalesce(F.col("_pl"), F.col("_p"))
                    ).alias("label"),
                )
                # The halving self-join references the round's plan TWICE,
                # so plain cache() doubles the logical plan every round
                # (2^rounds nodes — the driver OOMs just PRINTING it).
                # localCheckpoint truncates lineage at materialization;
                # lazy, so the convergence count below stays the round's
                # ONLY job. Storage: (node, label) rows — tiny vs the
                # input pairs; superseded rounds are GC'd by the
                # ContextCleaner once unreferenced.
                .localCheckpoint(eager=False)
            )
            # ONE job per round: the count materializes the checkpoint AND
            # answers the convergence probe — the previous label rides the
            # propagation row, so no second join against `labels`.
            changed = (
                updated.filter(F.col("label") != F.col("_old")).limit(1).count()
            )
            labels.unpersist()
            labels = updated
            if changed == 0:
                converged = True
                break
        if not converged:
            # falling through would silently split one component into
            # several clusters (labels past the propagation frontier never
            # updated)
            raise RuntimeError(
                f"duplicate_clusters did not converge within {max_iterations} "
                f"iterations — a component's diameter exceeds it; raise "
                f"max_iterations (rounds needed ~= longest chain length)"
            )
        # labels is always a localCheckpoint-materialized round result here
        # (converged is only set after >= 1 round), so the finally-block
        # unpersists cannot invalidate the returned DataFrame (r3 ADVICE
        # cache-leak fix).
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    finally:
        edges.unpersist()
        labels.unpersist()


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
