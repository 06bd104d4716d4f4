"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every query here is a thin wrapper over operators in ``jvector_spark``;
each maps to a SURVEY.md §2 inventory row (cited in the registration).
Float columns are rounded to 6 decimals on BOTH sides so double-precision
summation-order differences between Spark and DuckDB cannot flip the hash.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from jvector_spark.functions.similarity import (  # noqa: E402
    similarity,
    sql_similarity,
)

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str):
    def deco(fn):
        _QUERIES[name] = fn
        return fn

    return deco


def _oracle(name: str, sql: str) -> None:
    _ORACLES[name] = sql


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Exact search family (SURVEY §2.4 J1/J4, §2.2 F1/F4, §2.6 T1/T4, §2.3 E1-E5)
# ---------------------------------------------------------------------------

_METRIC_QID = {"COSINE": 0, "EUCLIDEAN": 1, "DOT_PRODUCT": 2}


def _knn_topk(metric: str, k: int = 10):
    qid = _METRIC_QID[metric]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = _emb(spark, sf_dir)
        q = emb.filter(F.col("vec_id") == qid).select(F.col("embedding").alias("qvec"))
        scored = (
            emb.filter(F.col("vec_id") != qid)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                similarity(metric, F.col("embedding"), F.col("qvec")).alias("_s"),
            )
        )
        w = Window.orderBy(F.desc("_s"), F.asc("vec_id"))
        return (
            scored.orderBy(F.desc("_s"), F.asc("vec_id"))
            .limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select("vec_id", F.round("_s", 6).alias("score"), "rank")
        )

    return run


def _knn_topk_sql(metric: str, k: int = 10) -> str:
    qid = _METRIC_QID[metric]
    sim = sql_similarity(metric, "e.embedding", "q.qvec")
    return f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {qid}),
s AS (
  SELECT e.vec_id, {sim} AS _s
  FROM embeddings e, q WHERE e.vec_id <> {qid}
)
SELECT vec_id, ROUND(_s, 6) AS score,
       CAST(row_number() OVER (ORDER BY _s DESC, vec_id ASC) AS BIGINT) AS rank
FROM s ORDER BY _s DESC, vec_id ASC LIMIT {k}
"""


for _m in _METRIC_QID:
    _register(f"knn_topk_{_m.lower()}")(_knn_topk(_m))
    _oracle(f"knn_topk_{_m.lower()}", _knn_topk_sql(_m))


@_register("knn_filtered")
def _knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN (F1): predicate label=3 applied below top-k — exact in batch."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("qvec"))
    scored = (
        emb.filter((F.col("vec_id") != 7) & (F.col("label") == 3))
        .crossJoin(F.broadcast(q))
        .select("vec_id", similarity("COSINE", F.col("embedding"), F.col("qvec")).alias("_s"))
    )
    w = Window.orderBy(F.desc("_s"), F.asc("vec_id"))
    return (
        scored.orderBy(F.desc("_s"), F.asc("vec_id"))
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("vec_id", F.round("_s", 6).alias("score"), "rank")
    )


_oracle(
    "knn_filtered",
    f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
s AS (
  SELECT e.vec_id, {sql_similarity("COSINE", "e.embedding", "q.qvec")} AS _s
  FROM embeddings e, q WHERE e.vec_id <> 7 AND e.label = 3
)
SELECT vec_id, ROUND(_s, 6) AS score,
       CAST(row_number() OVER (ORDER BY _s DESC, vec_id ASC) AS BIGINT) AS rank
FROM s ORDER BY _s DESC, vec_id ASC LIMIT 10
""",
)


@_register("knn_join")
def _knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join (J1 over a query set): top-5 neighbors for 16 queries."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    corpus = emb.filter(F.col("vec_id") >= 16)
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "qid",
        "vec_id",
        similarity("COSINE", F.col("embedding"), F.col("qvec")).alias("_s"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_s"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", F.round("_s", 6).alias("score"), "rank")
    )


_oracle(
    "knn_join",
    f"""
WITH s AS (
  SELECT q.vec_id AS qid, e.vec_id,
         {sql_similarity("COSINE", "e.embedding", "q.embedding")} AS _s
  FROM embeddings e, embeddings q
  WHERE q.vec_id < 16 AND e.vec_id >= 16
),
r AS (
  SELECT qid, vec_id, _s,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY _s DESC, vec_id ASC) AS BIGINT) AS rank
  FROM s
)
SELECT qid, vec_id, ROUND(_s, 6) AS score, rank FROM r WHERE rank <= 5
""",
)


@_register("threshold_search")
def _threshold_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold query (J4/F3): all rows with normalized cosine score >= 0.6."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 4).select(F.col("embedding").alias("qvec"))
    scored = (
        emb.filter(F.col("vec_id") != 4)
        .crossJoin(F.broadcast(q))
        .select("vec_id", similarity("COSINE", F.col("embedding"), F.col("qvec")).alias("_s"))
    )
    return (
        scored.filter(F.col("_s") >= 0.6)
        .select("vec_id", F.round("_s", 6).alias("score"))
    )


_oracle(
    "threshold_search",
    f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 4)
SELECT e.vec_id, ROUND({sql_similarity("COSINE", "e.embedding", "q.qvec")}, 6) AS score
FROM embeddings e, q
WHERE e.vec_id <> 4
  AND {sql_similarity("COSINE", "e.embedding", "q.qvec")} >= 0.6
""",
)


@_register("vector_centroids")
def _centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (A1), exploded to (label, dim, value) for hashing."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("centroid_v"))
        .select(F.col("label").cast("long").alias("label"), F.col("dim").cast("long").alias("dim"), "centroid_v")
    )


_oracle(
    "vector_centroids",
    """
SELECT CAST(label AS BIGINT) AS label, CAST(r.i AS BIGINT) AS dim,
       ROUND(AVG(CAST(embedding[r.i + 1] AS DOUBLE)), 6) AS centroid_v
FROM embeddings, range(64) r(i)
GROUP BY label, r.i
""",
)


@_register("l2_normalize")
def _l2norm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 l2normalize + norms: (vec_id, norm, first component of unit vector).

    The norm is materialized in a prior projection so Catalyst computes the
    aggregate once, instead of inlining it per array element (64× blowup).
    """
    from jvector_spark.functions.similarity import l2_norm

    emb = _emb(spark, sf_dir)
    return (
        emb.select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("_n"))
        .select(
            "vec_id",
            F.round("_n", 6).alias("norm"),
            F.round(F.element_at(F.col("embedding").cast("array<double>"), 1) / F.col("_n"), 6).alias("u0"),
        )
    )


_oracle(
    "l2_normalize",
    """
SELECT vec_id,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm,
       ROUND(CAST(embedding[1] AS DOUBLE)
             / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS u0
FROM embeddings
""",
)


@_register("vector_arith")
def _vector_arith_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 elementwise reductions: sum/min/max over each vector's elements."""
    emb = _emb(spark, sf_dir)
    arr = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 6).alias("sum_elems"),
        F.round(F.array_min(arr), 6).alias("min_elem"),
        F.round(F.array_max(arr), 6).alias("max_elem"),
    )


_oracle(
    "vector_arith",
    """
SELECT vec_id,
       ROUND(list_sum(embedding::DOUBLE[]), 6) AS sum_elems,
       ROUND(list_min(embedding::DOUBLE[]), 6) AS min_elem,
       ROUND(list_max(embedding::DOUBLE[]), 6) AS max_elem
FROM embeddings
""",
)


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: exact top-10 cosine k-NN (J1)."""
    return _QUERIES["knn_topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
