"""Accuracy metrics: recall@k and mean average precision.

Reference: ``jvector-examples/.../util/AccuracyMetrics.java:29-146``
(kGT-recall@kRetrieved, averagePrecisionAtK, meanAveragePrecisionAtK).
Computed as DataFrame joins against exact ground truth (SURVEY.md §2.5 A9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    results: DataFrame,
    ground_truth: DataFrame,
    k: int,
    query_col: str = "qid",
    id_col: str = "id",
) -> float:
    """Fraction of ground-truth top-k ids recovered in the retrieved top-k,
    averaged over queries (ref AccuracyMetrics.java:29-60).

    Both inputs: (qid, id, rank) with rank 1-based.
    """
    r = results.filter(F.col("rank") <= k).select(query_col, id_col)
    g = ground_truth.filter(F.col("rank") <= k).select(query_col, id_col)
    hits = r.join(g, [query_col, id_col]).groupBy(query_col).count()
    per_query = g.groupBy(query_col).count().withColumnRenamed("count", "gt_n")
    joined = per_query.join(hits, query_col, "left").fillna(0, subset=["count"])
    row = joined.select(F.avg(F.col("count") / F.col("gt_n")).alias("recall")).collect()[0]
    return float(row["recall"])


def mean_average_precision_at_k(
    results: DataFrame,
    ground_truth: DataFrame,
    k: int,
    query_col: str = "qid",
    id_col: str = "id",
) -> float:
    """MAP@k (ref AccuracyMetrics.java:100-146): mean over queries of
    average precision over ranks 1..k."""
    r = results.filter(F.col("rank") <= k).select(query_col, id_col, "rank")
    g = ground_truth.filter(F.col("rank") <= k).select(query_col, id_col)
    marked = r.join(
        g.withColumn("_hit", F.lit(1)), [query_col, id_col], "left"
    ).fillna(0, subset=["_hit"])
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    prec = marked.withColumn("cum_hits", F.sum("_hit").over(w)).withColumn(
        "prec_at_i", F.col("cum_hits") / F.col("rank")
    )
    ap = prec.filter(F.col("_hit") == 1).groupBy(query_col).agg(
        (F.sum("prec_at_i") / F.lit(float(k))).alias("ap")
    )
    all_q = g.select(query_col).distinct()
    joined = all_q.join(ap, query_col, "left").fillna(0.0, subset=["ap"])
    return float(joined.select(F.avg("ap")).collect()[0][0])
