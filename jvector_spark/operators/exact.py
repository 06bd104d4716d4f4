"""Exact (brute-force) similarity search operators.

These are the engine's ground-truth path AND a first-class operator family
(reference J1/J4/F1-F4/T1/T4 in SURVEY.md §2; ``GraphSearcher.java:145-152``
exact scoring, ``DefaultSearchScoreProvider.java:71``).

Scale notes (100 TB design):
- Point top-k compiles to scan → project(score) → TakeOrderedAndProject:
  Spark's distributed bounded heap — no full shuffle, no sort of the corpus.
  Filters passed as ``predicate`` sit below the limit and push into Parquet.
- k-NN join broadcasts the (small) query side under every strategy, so the
  corpus never shuffles for the join itself. The ``numpy`` strategy does a
  per-partition partial top-k (map-side combine) so only
  ``O(k × partitions × queries)`` rows reach the final per-query merge,
  instead of ``O(|corpus| × queries)`` — the difference between a working
  plan and an impossible shuffle at 1000 executors.
- Tie-break everywhere: score DESC, id ASC (ref SearchResult.java:101-106),
  which makes results deterministic and oracle-hashable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jvector_spark.functions import kernels
from jvector_spark.functions.similarity import similarity, vector_literal


def score_against(
    df: DataFrame,
    query_vec,
    metric: str,
    vec_col: str = "vec",
    score_col: str = "score",
) -> DataFrame:
    """Add a normalized similarity score column vs a constant query vector."""
    return df.withColumn(score_col, similarity(metric, F.col(vec_col), vector_literal(query_vec)))


def topk(
    df: DataFrame,
    query_vec,
    k: int,
    metric: str = "COSINE",
    id_col: str = "id",
    vec_col: str = "vec",
    predicate: Column | None = None,
    exclude_ids=None,
) -> DataFrame:
    """Exact top-k point query: J1 with accept-filter F1 and self-exclusion F4.

    Returns (id, score, rank) ordered best-first. The plan is
    scan → [pushed filter] → score → TakeOrderedAndProject(k).
    """
    out = df
    if predicate is not None:
        out = out.filter(predicate)  # F1: accept-list before top-k (always exact in batch)
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(list(exclude_ids)))  # F4
    out = score_against(out, query_vec, metric, vec_col)
    out = (
        out.select(F.col(id_col).alias("id"), "score")
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )
    return out.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id")))
    )


def search_page(
    df: DataFrame,
    query_vec,
    page_size: int,
    page: int,
    metric: str = "COSINE",
    id_col: str = "id",
    vec_col: str = "vec",
    predicate: Column | None = None,
    exclude_ids=None,
) -> DataFrame:
    """Paginated search (J5): page `page` (0-based) of the exact ranking.

    The reference's ``GraphSearcher.resume(additionalK, ...)``
    (GraphSearcher.java:509-547) continues a search from its evicted
    candidates; the batch analog re-runs with k = (page+1)*page_size and
    keeps ``rank BETWEEN page*page_size+1 AND (page+1)*page_size`` —
    deterministic given the score-desc/id-asc total order (T4), so pages
    never overlap or skip. TakeOrderedAndProject still bounds the heap at
    (page+1)*page_size per partition; no full sort.
    """
    lo, hi = page * page_size, (page + 1) * page_size
    full = topk(
        df, query_vec, hi, metric=metric, id_col=id_col, vec_col=vec_col,
        predicate=predicate, exclude_ids=exclude_ids,
    )
    return full.filter(F.col("rank") > lo)


def threshold_search(
    df: DataFrame,
    query_vec,
    threshold: float,
    metric: str = "COSINE",
    id_col: str = "id",
    vec_col: str = "vec",
    predicate: Column | None = None,
) -> DataFrame:
    """Exact threshold query (J4/F3): all rows with score >= threshold.

    Unlike the reference's probabilistic early-stop (ScoreTracker.java:80),
    the batch plan is exact: filter(score >= t) after a full scan. The
    approximate analog (partition-bound pruning) lives in the IVF searcher.
    """
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    out = score_against(out, query_vec, metric, vec_col)
    return (
        out.filter(F.col("score") >= float(threshold))
        .select(F.col(id_col).alias("id"), "score")
        .orderBy(F.desc("score"), F.asc("id"))
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "COSINE",
    id_col: str = "id",
    vec_col: str = "vec",
    query_id_col: str = "qid",
    query_vec_col: str = "vec",
    strategy: str = "auto",
) -> DataFrame:
    """Exact k-NN join: for every query row, its top-k corpus neighbors.

    strategy:
      - ``expr``: broadcast-crossJoin + JVM score expression + per-query
        window rank. Oracle-exact double math; shuffles |corpus|×|queries|
        scored rows — fine for small query sets / correctness checks.
      - ``numpy``: Arrow-batched BLAS scoring with per-partition partial
        top-k (map-side combine), then a final per-query merge over the
        reduced candidate set. The scale path.
      - ``auto``: numpy.

    Returns (qid, id, score, rank).
    """
    if strategy == "auto":
        strategy = "numpy"
    if strategy == "expr":
        q = queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("_qvec")
        )
        scored = corpus.crossJoin(F.broadcast(q)).select(
            "qid",
            F.col(id_col).alias("id"),
            similarity(metric, F.col(vec_col), F.col("_qvec")).alias("score"),
        )
        return _rank_topk(scored, k)
    if strategy == "numpy":
        return _knn_join_numpy(
            corpus, queries, k, metric, id_col, vec_col, query_id_col, query_vec_col
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )


def _knn_join_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
) -> DataFrame:
    """Map-side partial top-k k-NN join.

    The query set is collected to the driver (it is the small side by
    contract — same asymmetry the reference assumes: queries ≪ corpus) and
    broadcast as dense numpy matrices; each corpus partition emits at most
    k candidates per query.
    """
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, q_mat = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            x = kernels.as_matrix(pdf[vec_col])
            scores = kernels.similarity(metric, q_mat, x)  # (m, batch)
            idx, vals = kernels.topk_per_row(scores, k, ids=ids)
            m, kk = idx.shape
            yield pd.DataFrame(
                {
                    "qid": np.repeat(q_ids, kk),
                    "id": ids[idx.ravel()],
                    "score": vals.ravel(),
                }
            )

    candidates = corpus.select(id_col, vec_col).mapInPandas(
        part, schema="qid long, id long, score double"
    )
    return _rank_topk(candidates, k)
