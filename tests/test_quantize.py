"""Quantization codec tests mirroring the reference's tolerance contracts.

- Perfect reconstruction when clusters >= distinct points
  (TestProductQuantization.java:56).
- Reconstruction error within tolerance bands (TestReconstructionError.java:54-106).
- Saved/loaded equality (TestCompressedVectors.java).
- BQ sign-bit packing + hamming similarity (TestBinaryQuantization.java).
"""

import numpy as np
import pytest

from jvector_spark.functions import kernels
from jvector_spark.operators.quantize.bq import BinaryQuantizer
from jvector_spark.operators.quantize.nvq import NVQuantizer
from jvector_spark.operators.quantize.pq import ProductQuantizer


@pytest.fixture(scope="module")
def corpus(rng):
    return rng.uniform(-1.0, 1.0, size=(2000, 32)).astype(np.float64)


def test_pq_perfect_reconstruction_when_clusters_cover_points(rng):
    """clusterCount >= distinct points -> zero reconstruction error."""
    pts = rng.uniform(-1, 1, size=(50, 8))
    pq = ProductQuantizer.fit_numpy(pts, m=2, clusters=64)
    err = pq.reconstruction_error(pts)
    assert err < 1e-12


def test_pq_reconstruction_error_band(corpus):
    pq = ProductQuantizer.fit_numpy(corpus, m=8, clusters=256)
    err = pq.reconstruction_error(corpus)
    # 32 dims, uniform [-1,1): variance per dim = 1/3; 256 centroids per
    # 4-dim subspace should cut MSE well below the no-codec baseline (~10.7)
    assert 0 < err < 2.0


def test_pq_more_clusters_lower_error(corpus):
    e64 = ProductQuantizer.fit_numpy(corpus, m=4, clusters=64).reconstruction_error(corpus)
    e256 = ProductQuantizer.fit_numpy(corpus, m=4, clusters=256).reconstruction_error(corpus)
    assert e256 < e64


def test_pq_centered_roundtrip(corpus):
    shifted = corpus + 5.0
    pq = ProductQuantizer.fit_numpy(shifted, m=8, clusters=256, center=True)
    assert pq.global_centroid is not None
    np.testing.assert_allclose(pq.global_centroid, shifted.mean(axis=0))
    err = pq.reconstruction_error(shifted)
    assert err < 2.0


def test_pq_save_load_identical(tmp_path, corpus):
    pq = ProductQuantizer.fit_numpy(corpus, m=4, clusters=32)
    pq.save(str(tmp_path / "pq"))
    pq2 = ProductQuantizer.load(str(tmp_path / "pq"))
    np.testing.assert_array_equal(pq.codebooks, pq2.codebooks)
    codes = pq.encode_numpy(corpus[:100])
    np.testing.assert_array_equal(codes, pq2.encode_numpy(corpus[:100]))


def test_pq_encode_dataframe_matches_numpy(spark, corpus):
    pq = ProductQuantizer.fit_numpy(corpus, m=4, clusters=64)
    df = spark.createDataFrame(
        [(i, corpus[i].tolist()) for i in range(200)], "id long, vec array<float>"
    )
    got = {r["id"]: r["codes"] for r in pq.encode(df).collect()}
    want = pq.encode_numpy(np.stack([np.asarray(corpus[i], dtype=np.float64) for i in range(200)]).astype(np.float32).astype(np.float64))
    for i in range(200):
        assert got[i] == want[i].tobytes()


def test_pq_adc_approximates_exact(corpus):
    """ADC score vs exact similarity: correlated and close on average."""
    pq = ProductQuantizer.fit_numpy(corpus, m=8, clusters=256)
    codes = pq.encode_numpy(corpus)
    q = corpus[7]
    for metric in kernels.METRICS:
        approx = pq.adc_score(codes, q, metric)
        exact = kernels.similarity(metric, q[None, :], corpus)[0]
        # rank correlation proxy: top-50 by approx should contain most of top-10 exact
        top10 = set(np.argsort(-exact)[:10].tolist())
        top50 = set(np.argsort(-approx)[:50].tolist())
        assert len(top10 & top50) >= 8, metric


def test_pq_refine_reduces_error(corpus):
    pq = ProductQuantizer.fit_numpy(corpus[:500], m=4, clusters=64)
    before = pq.reconstruction_error(corpus)
    after = pq.refine(corpus, iterations=2).reconstruction_error(corpus)
    assert after <= before + 1e-9


def test_bq_roundtrip_bits(rng):
    bq = BinaryQuantizer(dim=70)  # not a multiple of 64: exercises padding
    mat = rng.uniform(-1, 1, size=(100, 70))
    words = bq.encode_numpy(mat)
    assert words.shape == (100, 2)
    # bit i of word w must equal sign of dim 64w+i
    for r in range(0, 100, 17):
        for d in range(70):
            bit = (int(words[r, d // 64]) >> (d % 64)) & 1
            assert bit == (1 if mat[r, d] > 0 else 0)


def test_bq_similarity_self_is_one(rng):
    bq = BinaryQuantizer(dim=64)
    mat = rng.uniform(-1, 1, size=(20, 64))
    w = bq.encode_numpy(mat).astype(np.int64)
    s = bq.similarity(w, w)
    np.testing.assert_allclose(np.diag(s), 1.0)
    assert (s >= 0).all() and (s <= 1).all()


def test_bq_dataframe_encode(spark, rng):
    bq = BinaryQuantizer(dim=32)
    mat = rng.uniform(-1, 1, size=(50, 32))
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(50)], "id long, vec array<float>"
    )
    got = {r["id"]: np.array(r["bq_words"], dtype=np.int64) for r in bq.encode(df).collect()}
    want = bq.encode_numpy(mat.astype(np.float32).astype(np.float64)).astype(np.int64)
    for i in range(50):
        np.testing.assert_array_equal(got[i], want[i])


def test_nvq_reconstruction_better_than_uniform(rng):
    """NVQ's learned nonlinearity must beat naive uniform 8-bit on skewed data."""
    nvq = NVQuantizer(dim=32)
    # skewed data: mostly small values, occasional large (where NVQ shines)
    mat = rng.standard_normal((50, 32)) ** 3
    err_nvq = nvq.reconstruction_error(mat)
    # uniform baseline = alpha ~ 0 path only
    uni = NVQuantizer(dim=32, alphas=(1e-6,))
    err_uni = uni.reconstruction_error(mat)
    assert err_nvq <= err_uni + 1e-12
    # and 8-bit should be tight in absolute terms
    scale = float(np.mean(np.max(np.abs(mat), axis=1)))
    assert err_nvq < (scale / 100.0) ** 2 * 32 * 10


def test_nvq_roundtrip_dataframe(spark, rng):
    nvq = NVQuantizer(dim=16)
    mat = rng.uniform(-2, 2, size=(40, 16))
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(40)], "id long, vec array<float>"
    )
    rows = nvq.encode(df).collect()
    assert len(rows) == 40
    for r in rows[:5]:
        codes = np.frombuffer(r["nvq_bytes"], dtype=np.uint8)[None, :]
        params = np.array(r["nvq_params"], dtype=np.float64)[None, :]
        rec = nvq.decode_numpy(codes, params)[0]
        orig = mat[r["id"]].astype(np.float32).astype(np.float64)
        assert np.max(np.abs(rec - orig)) < 0.1


# ---------------------------------------------------------------------------
# Reconstruction-error tolerance bands — a direct port of the reference's
# TestReconstructionError.java:54-106 ``compareErrors``: train a codec,
# compute per-row reconstruction errors on the TRAIN sample and on an
# INDEPENDENT held-out sample, and pin that the error distribution
# generalizes — avg2/avg1 within toleranceAvg of 1, var2/var1 within
# toleranceSTD of 1.  Reference bands (dim=32, random vectors):
#   PQ  (m=8, 256 clusters, centered):  n=1000 -> (1.15, 2.5);  n=10000 -> (0.14, 0.29)
#   BQ:                                 n=1000 -> (0.05, 0.25); n=10000 -> (0.008, 0.09)
#   NVQ (2 subvectors):                 n=1000 -> (4e-2, 0.25); n=10000 -> (1e-2, 0.08)
# (The reference's NVQ case at :88-90 delegates to the BQ runner — a
# reference-side slip — so the NVQ bands above are the ones its test
# declares for NVQ; we run them against the actual NVQ codec, which is
# the stricter reading.)
# ---------------------------------------------------------------------------


def _reconstruction_errors_pq(pq, mat):
    rec = pq.decode_numpy(pq.encode_numpy(mat))
    d = mat - rec
    return np.einsum("ij,ij->i", d, d)


def _band_check(err1, err2, tol_avg, tol_var):
    avg1, avg2 = float(np.mean(err1)), float(np.mean(err2))
    var1 = float(np.mean((err1 - avg1) ** 2))
    var2 = float(np.mean((err2 - avg2) ** 2))
    assert abs(avg2 / avg1 - 1.0) <= tol_avg, (avg1, avg2, tol_avg)
    assert abs(var2 / var1 - 1.0) <= tol_var, (var1, var2, tol_var)


@pytest.mark.parametrize("n,tol_avg,tol_var", [(1000, 1.15, 2.5), (10000, 0.14, 0.29)])
def test_reconstruction_band_pq(n, tol_avg, tol_var):
    rng = np.random.default_rng(77)  # private: keep the shared stream untouched
    dim = 32
    s1 = rng.uniform(-1, 1, size=(n, dim))
    s2 = rng.uniform(-1, 1, size=(n, dim))
    pq = ProductQuantizer.fit_numpy(s1, m=8, clusters=256, center=True)
    _band_check(_reconstruction_errors_pq(pq, s1), _reconstruction_errors_pq(pq, s2), tol_avg, tol_var)


@pytest.mark.parametrize("n,tol_avg,tol_var", [(1000, 0.05, 0.25), (10000, 0.008, 0.09)])
def test_reconstruction_band_bq(n, tol_avg, tol_var):
    rng = np.random.default_rng(78)  # private: keep the shared stream untouched
    """BQ has no reconstruction in our codec (sign bits only), matching the
    reference's BinaryQuantization whose 'reconstruction' is the sign
    vector; its error for a row is the distance to the +-1 pattern."""
    dim = 32
    s1 = rng.uniform(-1, 1, size=(n, dim))
    s2 = rng.uniform(-1, 1, size=(n, dim))
    bq = BinaryQuantizer(dim=dim)
    w1 = bq.encode_numpy(s1)
    w2 = bq.encode_numpy(s2)

    def errs(words, mat):
        bits = np.unpackbits(
            words.view(np.uint8).reshape(len(mat), -1), axis=1, bitorder="little"
        )[:, :dim].astype(np.float64)
        rec = bits * 2.0 - 1.0
        d = mat - rec
        return np.einsum("ij,ij->i", d, d)

    _band_check(errs(w1, s1), errs(w2, s2), tol_avg, tol_var)


@pytest.mark.parametrize("n,tol_avg,tol_var", [(1000, 4e-2, 0.25), (10000, 1e-2, 0.08)])
def test_reconstruction_band_nvq(n, tol_avg, tol_var):
    rng = np.random.default_rng(79)  # private: keep the shared stream untouched
    dim = 32
    s1 = rng.uniform(-1, 1, size=(n, dim))
    s2 = rng.uniform(-1, 1, size=(n, dim))
    nvq = NVQuantizer(dim=dim, subvectors=2)

    def errs(mat):
        codes, params = nvq.encode_numpy(mat)
        d = mat - nvq.decode_numpy(codes, params)
        return np.einsum("ij,ij->i", d, d)

    _band_check(errs(s1), errs(s2), tol_avg, tol_var)


# ---------------------------------------------------------------------------
# Anisotropic k-means (SURVEY §2.5 A3; KMeansPlusPlusClusterer.java:140-147)
# ---------------------------------------------------------------------------


def test_anisotropic_reduces_anisotropic_loss(rng):
    from jvector_spark.operators.quantize.kmeans import (
        anisotropic_loss,
        kmeans_anisotropic,
        kmeans_pp,
        parallel_cost_multiplier,
    )

    n, d, k = 3000, 8, 16
    mat = rng.normal(size=(n, d))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)  # unit-norm contract
    pcm = parallel_cost_multiplier(0.2, d)

    def loss(cents):
        # assign under the weighted distance, like the trainer does
        x_sq = np.einsum("ij,ij->i", mat, mat)
        cdx = mat @ cents.T
        c_sq = np.einsum("ij,ij->i", cents, cents)[None, :]
        par = (cdx - x_sq[:, None]) ** 2 / x_sq[:, None]
        res = np.maximum(c_sq - 2 * cdx + x_sq[:, None], 0.0)
        dist = pcm * par + np.maximum(res - par, 0.0)
        return anisotropic_loss(mat, cents, np.argmin(dist, axis=1), pcm)

    uni = kmeans_pp(mat, k, iterations=6, seed=7)
    ani = kmeans_anisotropic(mat, k, threshold=0.2, seed=7)
    assert loss(ani) <= loss(uni) * 1.001, (loss(ani), loss(uni))


def test_anisotropic_pq_improves_dot_fidelity(rng):
    """On unit-norm data scored by dot product, anisotropic codebooks should
    approximate TRUE dot scores at least as well (lower MSE of the ADC
    estimate on high-scoring pairs) as unweighted PQ — the whole point of
    the ScaNN objective."""
    from jvector_spark.operators.quantize.pq import ProductQuantizer

    n, d = 4000, 32
    mat = rng.normal(size=(n, d))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    queries = mat[:50]

    def score_mse(pq):
        codes = pq.encode_numpy(mat)
        errs = []
        for q in queries:
            approx = pq.adc_score(codes, q, "DOT_PRODUCT")
            true = (1.0 + mat @ q) / 2.0
            top = np.argsort(-true)[:20]  # fidelity where it matters: near neighbors
            errs.append(np.mean((approx[top] - true[top]) ** 2))
        return float(np.mean(errs))

    uni = ProductQuantizer.fit_numpy(mat, m=8, clusters=64, seed=3)
    ani = ProductQuantizer.fit_numpy(mat, m=8, clusters=64, seed=3, anisotropic_threshold=0.2)
    assert score_mse(ani) <= score_mse(uni) * 1.05, (score_mse(ani), score_mse(uni))


def test_nvq_vectorized_encode_matches_scalar_reference():
    """The batched-per-alpha encoder must reproduce the per-row grid search
    exactly (same codes, same chosen alpha) — the vectorization is a pure
    hot-path rewrite, not a semantics change."""
    from jvector_spark.operators.quantize.nvq import _EPS, _logistic, _logit

    r = np.random.default_rng(7)
    mat = np.vstack([r.normal(size=(40, 24)), np.full((2, 24), 0.37)])  # incl. flat rows
    codec = NVQuantizer(dim=24, refine=())  # coarse stage only, like the replay
    codes, params = codec.encode_numpy(mat)
    for i in range(len(mat)):
        x = mat[i]
        lo, hi = float(x.min()), float(x.max())
        if hi - lo < _EPS:
            assert not codes[i].any()
            np.testing.assert_allclose(params[i], (1.0, lo, lo, hi))
            continue
        x0 = float(x.mean())
        best = None
        for alpha in codec.alphas:
            a = alpha / max(hi - lo, _EPS)
            ulo = _logistic(np.array([lo]), a, x0)[0]
            uhi = _logistic(np.array([hi]), a, x0)[0]
            u = (_logistic(x, a, x0) - ulo) / max(uhi - ulo, _EPS)
            q = np.clip(np.round(u * 255.0), 0, 255)
            ur = q / 255.0 * (uhi - ulo) + ulo
            xr = _logit(ur, a, x0)
            err = float(np.sum((x - xr) ** 2))
            if best is None or err < best[0]:
                best = (err, a, q)
        np.testing.assert_array_equal(codes[i], best[2].astype(np.uint8))
        assert params[i, 0] == pytest.approx(best[1], rel=1e-12)
    # the fine stage (per-row geometric refinement around the coarse
    # winner, ref NVQuantization.java:548-556) may only IMPROVE error
    refined = NVQuantizer(dim=24)
    assert refined.reconstruction_error(mat) <= codec.reconstruction_error(mat) + 1e-15


def test_nvq_encode_is_fast(corpus):
    """Regression guard for the vectorized encoder: 2k x 32 in well under a
    second (the per-row loop took multiple seconds here)."""
    import time

    codec = NVQuantizer(dim=32)
    t0 = time.perf_counter()
    codec.encode_numpy(corpus)
    assert time.perf_counter() - t0 < 1.0


def test_nvq_subvector_split_strictly_improves(rng):
    """Per-subvector (α, x0, lo, hi) — the reference's layout
    (NVQuantization.java:48-112) — must strictly beat one whole-row
    parameter set on vectors whose chunks have different ranges (the
    64-d fixtures' shape: per-dim scales vary)."""
    from jvector_spark.operators.quantize.nvq import NVQuantizer, _auto_subvectors

    n, d = 300, 64
    # chunks with deliberately different scales/offsets
    mat = np.concatenate(
        [
            rng.normal(0.0, 1.0, size=(n, 16)),
            rng.normal(5.0, 0.2, size=(n, 16)),
            rng.normal(-2.0, 3.0, size=(n, 16)),
            rng.uniform(0.0, 0.05, size=(n, 16)),
        ],
        axis=1,
    )
    assert _auto_subvectors(64) == 4
    err_split = NVQuantizer(dim=d).reconstruction_error(mat)  # auto -> 4 subs
    err_whole = NVQuantizer(dim=d, subvectors=1).reconstruction_error(mat)
    assert err_split < err_whole


def test_nvq_subvector_params_self_describing(rng):
    """A decoder instance configured with a DIFFERENT subvector count must
    still decode correctly: the split is inferred from the stored params
    length, never from the decoding instance."""
    from jvector_spark.operators.quantize.nvq import NVQuantizer

    mat = rng.normal(size=(50, 64))
    enc = NVQuantizer(dim=64, subvectors=4)
    codes, params = enc.encode_numpy(mat)
    assert params.shape == (50, 16)
    dec = NVQuantizer(dim=64, subvectors=1)  # mismatched config on purpose
    np.testing.assert_allclose(
        dec.decode_numpy(codes, params), enc.decode_numpy(codes, params)
    )
    # and on the 64-d embedding-like data the decode error stays tight
    err = np.mean(np.sum((mat - enc.decode_numpy(codes, params)) ** 2, axis=1))
    assert err < 0.01 * np.mean(np.sum(mat**2, axis=1))


# ---------------------------------------------------------------------------
# Clustering-quality gates (r6 verdict item 3): the fast trainer and the
# hierarchical fine assignment may trade numerics for speed, but never
# silently erode quantization quality.
# ---------------------------------------------------------------------------


def _lloyds_reference(points, k, iterations, seed):
    """Naive full-Lloyd's k-means++ (the pre-r5 trainer's algorithm, written
    independently here as the quality yardstick): ++ seeding over ALL
    points, exact argmin assignment, mean updates."""
    rng = np.random.default_rng(seed)
    n, d = points.shape
    cent = np.empty((k, d))
    cent[0] = points[rng.integers(n)]
    d2 = np.full(n, np.inf)
    for j in range(1, k):
        diff = points - cent[j - 1]
        d2 = np.minimum(d2, np.einsum("ij,ij->i", diff, diff))
        probs = d2 / d2.sum()
        cent[j] = points[rng.choice(n, p=probs)]
    for _ in range(iterations):
        dist = (
            np.einsum("ij,ij->i", points, points)[:, None]
            - 2.0 * points @ cent.T
            + np.einsum("ij,ij->i", cent, cent)[None, :]
        )
        assign = np.argmin(dist, axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cent[j] = points[mask].mean(axis=0)
    return cent


def _quantization_mse(points, cent):
    dist = (
        np.einsum("ij,ij->i", points, points)[:, None]
        - 2.0 * points @ cent.T
        + np.einsum("ij,ij->i", cent, cent)[None, :]
    )
    return float(np.maximum(dist.min(axis=1), 0.0).mean())


def test_kmeans_fast_mse_within_tolerance_of_full_lloyds(rng):
    """The r5 fast trainer (subsampled ++ seeding, gemv distances) must
    stay within 15% of full Lloyd's quantization MSE on a clustered
    fixture — the gate that keeps future trainer speedups from silently
    costing recall (r5 regression: recall at fixed low-oq configs dropped
    ~8% without any gate firing)."""
    from jvector_spark.operators.quantize.kmeans import kmeans_pp

    centers = rng.normal(size=(40, 24))
    asg = rng.integers(0, 40, size=6000)
    pts = centers[asg] + 0.3 * rng.normal(size=(6000, 24))
    fast = kmeans_pp(pts, 40, iterations=6, seed=7)
    ref = _lloyds_reference(pts, 40, iterations=6, seed=7)
    mse_fast = _quantization_mse(pts, fast)
    mse_ref = _quantization_mse(pts, ref)
    assert mse_fast <= 1.15 * mse_ref, (mse_fast, mse_ref)


def test_fine_hierarchical_assignment_near_global(rng):
    """Hierarchical fine assignment (score only the fine centroids of the
    row's spill coarse cells) must match the global argmin almost
    everywhere and must not measurably raise fine-level quantization MSE."""
    from jvector_spark.operators.index import _assign_fine_hierarchical
    from jvector_spark.operators.quantize.kmeans import fine_level, kmeans_pp

    centers = rng.normal(size=(30, 16))
    asg = rng.integers(0, 30, size=8000)
    pts = centers[asg] + 0.25 * rng.normal(size=(8000, 16))
    coarse = kmeans_pp(pts[:4000], 30, iterations=4, seed=3)
    fine, owners = fine_level(pts[:4000], coarse, 240, iterations=3, seed=4)
    assert len(owners) == len(fine)
    fine_of = [np.flatnonzero(owners == c) for c in range(len(coarse))]
    # rows' spill=2 nearest coarse cells
    cc = np.einsum("ij,ij->i", coarse, coarse)
    d = -2.0 * pts @ coarse.T + cc[None, :]
    pm = np.argpartition(d, 1, axis=1)[:, :2]
    sub_h = _assign_fine_hierarchical(pts, pm, fine, fine_of)
    fcc = np.einsum("ij,ij->i", fine, fine)
    fd = -2.0 * pts @ fine.T + fcc[None, :]
    sub_g = np.argmin(fd, axis=1)
    agree = float((sub_h == sub_g).mean())
    assert agree >= 0.95, agree
    # MSE of the hierarchical assignment vs the global-optimal assignment
    pp = np.einsum("ij,ij->i", pts, pts)
    mse_h = float(np.maximum(fd[np.arange(len(pts)), sub_h] + pp, 0).mean())
    mse_g = float(np.maximum(fd[np.arange(len(pts)), sub_g] + pp, 0).mean())
    assert mse_h <= 1.02 * mse_g, (mse_h, mse_g)
