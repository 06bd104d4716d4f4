"""Planner rule tests (SURVEY §4: strategy choice lives above Catalyst)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jvector_spark.operators import exact
from jvector_spark.operators.index import IVFIndexBuilder
from jvector_spark.plans import plan_knn


@pytest.fixture(scope="module")
def small_corpus(spark, rng):
    mat = rng.uniform(-1, 1, size=(600, 12)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(600)], "id long, vec array<float>"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(spark, small_corpus):
    return small_corpus.limit(6).select(F.col("id").alias("qid"), "vec").cache()


def test_planner_picks_exact_pivot_for_selective_accept(spark, small_corpus, queries, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plan_ivf") / "index")
    idx = IVFIndexBuilder(metric="COSINE", n_partitions=8, pq_m=4).fit(small_corpus, path)
    plan = plan_knn(queries, 5, index=idx, accept_ids=list(range(0, 600, 50)))
    assert plan.strategy == "exact_filter_first"
    assert "accepted=12" in plan.explain()
    assert plan.df.count() > 0

    plan2 = plan_knn(queries, 5, index=idx, n_probe=8, overquery=4.0)
    assert plan2.strategy == "ivf_fused"
    assert plan2.knobs["n_probe"] == 8
    assert plan2.df.count() > 0


def test_planner_routes_raw_corpus_by_query_size(spark, small_corpus, queries, monkeypatch):
    plan = plan_knn(queries, 5, corpus=small_corpus)
    assert plan.strategy == "broadcast_numpy"
    monkeypatch.setattr(exact, "BROADCAST_QUERY_CAP", 4)
    wide = small_corpus.select(F.col("id").alias("qid"), "vec")
    plan2 = plan_knn(wide, 3, corpus=small_corpus)
    assert plan2.strategy == "blocked"
    assert plan2.df.count() == 3 * 600
