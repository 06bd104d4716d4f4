"""Two-phase PQ search: recall contract vs exact ground truth.

Mirrors FIXTURES.md invariant 4 / the reference's recall-threshold property
tests (Test2DThreshold.java:36-49, TestLowCardinalityFiltering.java:53-55):
PQ two-phase recall@10 must clear a threshold at a given overquery, and the
returned scores must be exact fp32 scores.
"""

import numpy as np
import pytest

from jvector_spark.functions import kernels
from jvector_spark.metrics import recall_at_k
from jvector_spark.operators import exact
from jvector_spark.operators.quantize.pq import ProductQuantizer
from jvector_spark.operators.search import two_phase_knn_join

N, DIM, M_QUERIES, K = 4000, 64, 20, 10


@pytest.fixture(scope="module")
def pq_fixture(spark, rng):
    mat = rng.uniform(-1.0, 1.0, size=(N, DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(N)], "id long, vec array<float>"
    ).cache()
    pq = ProductQuantizer.fit_numpy(mat.astype(np.float64), m=16, clusters=256)
    codes_df = pq.encode(df).cache()
    queries = spark.createDataFrame(
        [(i, mat[i * 37 % N].tolist()) for i in range(M_QUERIES)],
        "qid long, vec array<float>",
    ).cache()
    return df, codes_df, pq, queries, mat


@pytest.mark.parametrize("metric", ["COSINE", "EUCLIDEAN"])
def test_two_phase_recall(pq_fixture, metric):
    df, codes_df, pq, queries, mat = pq_fixture
    got = two_phase_knn_join(codes_df, df, pq, queries, K, metric=metric, overquery=5.0)
    gt = exact.knn_join(df, queries, K, metric=metric, strategy="numpy")
    r = recall_at_k(got, gt, K)
    assert r >= 0.95, f"recall@{K}={r} below threshold for {metric}"


def test_two_phase_scores_are_exact(pq_fixture):
    """Returned scores come from the fp32 reranker, not the ADC approximation."""
    df, codes_df, pq, queries, mat = pq_fixture
    got = two_phase_knn_join(codes_df, df, pq, queries, K, metric="COSINE", overquery=5.0)
    rows = got.filter("qid = 0").collect()
    q = mat[0].astype(np.float64)
    for r in rows:
        want = kernels.similarity("COSINE", q[None, :], mat[r["id"]].astype(np.float64)[None, :])[0, 0]
        assert abs(r["score"] - want) < 1e-9


def test_overquery_improves_recall(pq_fixture):
    df, codes_df, pq, queries, mat = pq_fixture
    gt = exact.knn_join(df, queries, K, metric="COSINE", strategy="numpy").cache()
    r1 = recall_at_k(
        two_phase_knn_join(codes_df, df, pq, queries, K, "COSINE", overquery=1.0), gt, K
    )
    r5 = recall_at_k(
        two_phase_knn_join(codes_df, df, pq, queries, K, "COSINE", overquery=5.0), gt, K
    )
    assert r5 >= r1


# ---------------------------------------------------------------------------
# Random-hyperplane LSH k-NN join (SURVEY §2.4 J2 — bucketed ANN variant)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_fixture(spark, rng):
    """Clustered corpus (50 Gaussian clusters): the realistic embedding
    shape LSH bucketing exploits. Uniform random high-d vectors are
    near-orthogonal — a degenerate case where no sublinear ANN works."""
    n, dim, n_clusters = 4000, 64, 50
    centers = rng.normal(size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n)
    mat = (centers[assign] + 0.25 * rng.normal(size=(n, dim))).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)], "id long, vec array<float>"
    ).cache()
    queries = spark.createDataFrame(
        [(i, (mat[i * 37 % n] + 0.05 * rng.normal(size=dim).astype(np.float32)).tolist())
         for i in range(M_QUERIES)],
        "qid long, vec array<float>",
    ).cache()
    return df, queries, mat


def test_rp_lsh_recall(clustered_fixture):
    from jvector_spark.operators.lsh import rp_lsh_knn_join

    df, queries, mat = clustered_fixture
    got = rp_lsh_knn_join(df, queries, K, metric="COSINE", probe_bits=2)
    gt = exact.knn_join(df, queries, K, metric="COSINE", strategy="numpy")
    r = recall_at_k(got, gt, K)
    assert r >= 0.75, f"LSH recall@{K}={r} below floor"


def test_rp_lsh_scores_exact_and_ranked(clustered_fixture):
    """Returned rows carry exact fp32 scores, ranked desc with id tiebreak."""
    from jvector_spark.operators.lsh import rp_lsh_knn_join

    df, queries, mat = clustered_fixture
    qvec = np.asarray(queries.filter("qid = 0").first()["vec"], dtype=np.float64)
    rows = (
        rp_lsh_knn_join(df, queries, K, metric="COSINE", probe_bits=2)
        .filter("qid = 0")
        .orderBy("rank")
        .collect()
    )
    assert 0 < len(rows) <= K
    prev = None
    for r in rows:
        want = kernels.similarity(
            "COSINE", qvec[None, :], mat[r["id"]].astype(np.float64)[None, :]
        )[0, 0]
        assert abs(r["score"] - want) < 1e-9
        if prev is not None:
            assert r["score"] <= prev + 1e-12
        prev = r["score"]


def test_rp_lsh_more_probes_improve_recall(clustered_fixture):
    from jvector_spark.operators.lsh import rp_lsh_knn_join

    df, queries, mat = clustered_fixture
    gt = exact.knn_join(df, queries, K, metric="COSINE", strategy="numpy").cache()
    r0 = recall_at_k(rp_lsh_knn_join(df, queries, K, "COSINE", probe_bits=0), gt, K)
    r2 = recall_at_k(rp_lsh_knn_join(df, queries, K, "COSINE", probe_bits=2), gt, K)
    assert r2 >= r0


# ---------------------------------------------------------------------------
# NVQ rerank (E11 scoring + the reference's default rerank config)
# ---------------------------------------------------------------------------


def test_nvq_rerank_matches_fp32_recall(pq_fixture):
    from jvector_spark.operators.quantize.nvq import NVQuantizer

    df, codes_df, pq, queries, mat = pq_fixture
    nvq = NVQuantizer(dim=DIM)
    nvq_df = nvq.encode(df).cache()
    gt = exact.knn_join(df, queries, K, metric="COSINE", strategy="numpy").cache()

    r_fp32 = recall_at_k(
        two_phase_knn_join(codes_df, df, pq, queries, K, "COSINE", overquery=5.0), gt, K
    )
    r_nvq = recall_at_k(
        two_phase_knn_join(
            codes_df, df, pq, queries, K, "COSINE", overquery=5.0, nvq=(nvq_df, nvq)
        ),
        gt,
        K,
    )
    assert r_nvq >= r_fp32 - 0.02, (r_nvq, r_fp32)


def test_nvq_scores_close_to_exact(pq_fixture):
    """NVQ-rerank reported scores track exact fp32 scores within the codec's
    reconstruction tolerance (ref TestReconstructionError.java pattern)."""
    from jvector_spark.operators.quantize.nvq import NVQuantizer

    df, codes_df, pq, queries, mat = pq_fixture
    nvq = NVQuantizer(dim=DIM)
    nvq_df = nvq.encode(df)
    got = two_phase_knn_join(
        codes_df, df, pq, queries, K, "COSINE", overquery=5.0, nvq=(nvq_df, nvq)
    )
    rows = got.filter("qid = 0").collect()
    q = mat[0].astype(np.float64)
    for r in rows:
        want = kernels.similarity("COSINE", q[None, :], mat[r["id"]].astype(np.float64)[None, :])[0, 0]
        assert abs(r["score"] - want) < 5e-3, (r["id"], r["score"], want)
