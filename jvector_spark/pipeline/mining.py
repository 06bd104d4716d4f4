"""Hard-negative mining for contrastive training (SBERT / DPR loops).

Two routes, one contract — per query, the k most-similar corpus rows with
a DIFFERENT label:

- ``exact.hard_negative_join`` (operators/exact.py) — the exact route and
  ground-truth oracle: the same-label mask runs inside the scoring kernel
  before the partial top-k, so the answer never depends on an overfetch
  guess. Point-query-batch contract.
- ``hard_negatives_ivf`` (here) — the 100 TB route: ANN search with an
  overfetch factor, then a label anti-filter and a re-rank to k. This is
  exactly how production mining loops run (approximate by construction);
  the exact operator above is its recall oracle. Works with any query-side
  size the index search supports (broadcast or distributed strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hard_negatives_ivf(
    index,
    queries: DataFrame,
    labels: DataFrame,
    k: int = 10,
    overfetch: int = 8,
    id_col: str = "id",
    label_col: str = "label",
    query_label_col: str = "label",
    query_id_col: str = "qid",
    query_vec_col: str = "vec",
    **search_kwargs,
) -> DataFrame:
    """ANN hard-negative mining: fetch ``k * overfetch`` neighbors through
    the index, drop same-label rows, keep the top k that remain.

    Args:
        index: an ``IVFIndex``.
        queries: (qid, vec, ``query_label_col``) — each query's own label.
        labels: (``id_col``, ``label_col``) for the corpus — usually the
            source table itself. The id equi-join's small side is the
            fetched candidate set (k x overfetch x |queries| rows): while
            it fits a broadcast (AQE picks this at bench scale) the
            corpus side streams map-side with no exchange; past that it
            degrades to a shuffled join keyed on id.
        overfetch: how many same-label rows the fetch can absorb before a
            query comes back with fewer than k negatives. Raise it (or
            ``n_probe``/``overquery`` in ``search_kwargs``) for corpora
            where labels correlate with geometry.

    Returns (qid, id, score, rank) — ranks 1..k per query (fewer only if
    the fetched set held fewer than k foreign-label rows).

    ``query_id_col`` / ``query_vec_col`` name the query side's id/vector
    columns (mirroring ``exact.hard_negative_join``); the output always
    labels the query id ``qid``.
    """
    fetched = index.search(
        queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("vec")
        ),
        k * overfetch,
        **search_kwargs,
    )
    qlab = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_label_col).alias("_qlab")
    )
    clab = labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("_clab"))
    kept = (
        fetched.join(clab, "id")
        .join(qlab, "qid")
        .filter(F.col("_clab") != F.col("_qlab"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        kept.select("qid", "id", "score")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )
