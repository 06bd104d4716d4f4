"""Property-based tests (hypothesis) mirroring the reference's randomized
test style (SURVEY §5: carrotsearch randomizedtesting — random inputs per
run, invariants asserted).

Pure-numpy invariants — no SparkSession, so these run in milliseconds:

- partial top-k == full-sort selection, including score ties (the
  SearchResult.java:101-106 score-desc/id-asc contract);
- the per-partition score bounds used for threshold pruning are SOUND
  (never below an achievable score) for every metric, including the
  negative-cosine DOT_PRODUCT corner;
- ADC scoring == exact scoring of the decoded vector (the algebraic
  identity that makes two-phase search correct);
- BQ hamming similarity == naive popcount.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jvector_spark.functions import kernels

METRICS = list(kernels.METRICS)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), k=st.integers(1, 12))
def test_topk_per_row_matches_full_sort_with_ties(seed, k):
    rng = np.random.default_rng(seed)
    m, n = rng.integers(1, 8), rng.integers(1, 40)
    # quantized scores force ties; shuffled ids force the id tie-break
    scores = np.round(rng.random((m, n)), 1)
    ids = rng.permutation(n * 3)[:n].astype(np.int64)
    idx, vals = kernels.topk_per_row(scores, k, ids=ids)
    for r in range(m):
        order = np.lexsort((ids, -scores[r]))[: min(k, n)]
        np.testing.assert_array_equal(ids[idx[r]], ids[order])
        np.testing.assert_array_equal(vals[r], scores[r][order])


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), metric=st.sampled_from(METRICS))
def test_partition_score_bound_is_sound(seed, metric):
    """Threshold pruning is only exact if the bound NEVER undercuts an
    achievable score — including the cmax<0 DOT_PRODUCT branch that uses
    min_norm (the round-1 advisory bug)."""
    from jvector_spark.operators.index import _partition_score_bounds

    rng = np.random.default_rng(seed)
    d = int(rng.integers(2, 16))
    n = int(rng.integers(2, 60))
    x = rng.normal(scale=rng.uniform(0.1, 3.0), size=(n, d))
    c = x.mean(axis=0)
    # stats exactly as the build computes them
    dif = x - c
    xn = np.linalg.norm(x, axis=1)
    cn = max(float(np.linalg.norm(c)), 1e-30)
    cosang = (x @ c) / (np.maximum(xn, 1e-30) * cn)
    info = {
        "centroids": c[None, :],
        "radius": np.array([float(np.sqrt((dif * dif).sum(axis=1).max()))]),
        "ang_radius": np.array([float(np.arccos(np.clip(cosang, -1, 1)).max())]),
        "max_norm": np.array([float(xn.max())]),
        "min_norm": np.array([float(xn.min())]),
        "has_rows": np.array([True]),
    }
    q = rng.normal(scale=rng.uniform(0.1, 3.0), size=(4, d))
    bound, _ = _partition_score_bounds(info, q, metric)
    actual = kernels.similarity(metric, q, x).max(axis=1)
    assert (bound[:, 0] + 1e-9 >= actual).all(), (
        f"bound {bound[:, 0]} < achievable {actual}"
    )


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_adc_score_equals_decoded_similarity(seed):
    """ADC gather-sum must equal exact similarity against the DECODED
    vector (E7/E8 identity; what makes stage-1 candidate ranking mean
    something)."""
    from jvector_spark.operators.quantize.pq import ProductQuantizer

    rng = np.random.default_rng(seed)
    n, d, m = 80, 8, 4
    mat = rng.normal(size=(n, d))
    pq = ProductQuantizer.fit_numpy(mat, m=m, clusters=16, iterations=3, seed=7)
    codes = pq.encode_numpy(mat)
    decoded = pq.decode_numpy(codes)
    q = rng.normal(size=d)
    got = pq.adc_score(codes, q, "EUCLIDEAN")
    want = kernels.similarity("EUCLIDEAN", q[None, :], decoded)[0]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    got_dot = pq.adc_score(codes, q, "DOT_PRODUCT")
    want_dot = kernels.similarity("DOT_PRODUCT", q[None, :], decoded)[0]
    np.testing.assert_allclose(got_dot, want_dot, rtol=1e-9, atol=1e-12)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_bq_hamming_matches_naive_popcount(seed):
    from jvector_spark.operators.quantize.bq import BinaryQuantizer

    rng = np.random.default_rng(seed)
    d = int(rng.integers(3, 130))
    a = rng.normal(size=(5, d))
    b = rng.normal(size=(7, d))
    bq = BinaryQuantizer(dim=d)
    wa, wb = bq.encode_numpy(a), bq.encode_numpy(b)
    got = kernels.hamming_similarity(wa, wb, d)
    bits_a = (a > 0)
    bits_b = (b > 0)
    naive = 1.0 - (bits_a[:, None, :] != bits_b[None, :, :]).sum(axis=-1) / float(d)
    np.testing.assert_allclose(got, naive, rtol=1e-12)


# ---------------------------------------------------------------------------
# Round-4 additions: structured-array strategies over the same kernel layer
# (score-range bounds, normalization idempotence, codec monotonicity).
# ---------------------------------------------------------------------------

from hypothesis.extra.numpy import arrays  # noqa: E402

_finite = st.floats(-100.0, 100.0, allow_nan=False, width=32)


def _mats(max_rows=6, dim=8):
    n = st.integers(1, max_rows)
    return n.flatmap(lambda k: arrays(np.float64, (k, dim), elements=_finite))


@settings(max_examples=200, deadline=None)
@given(_mats(), _mats())
def test_similarity_scores_bounded(a, b):
    """All three metric normalizations land in the documented ranges:
    EUCLIDEAN/COSINE in (0, 1]; DOT_PRODUCT is (1+dot)/2, unbounded in
    general but antisymmetric around 1/2."""
    e = kernels.similarity(kernels.EUCLIDEAN, a, b)
    assert np.all(e > 0.0) and np.all(e <= 1.0)
    c = kernels.similarity(kernels.COSINE, a, b)
    assert np.all(c >= -1e-12) and np.all(c <= 1.0 + 1e-12)
    d = kernels.similarity(kernels.DOT_PRODUCT, a, b)
    assert np.allclose(d + kernels.similarity(kernels.DOT_PRODUCT, -a, b), 1.0)


@settings(max_examples=200, deadline=None)
@given(_mats())
def test_self_similarity_is_max(a):
    """Every vector scores 1 against itself under EUCLIDEAN/COSINE
    (within float tolerance; zero vectors excluded for COSINE)."""
    e = kernels.similarity(kernels.EUCLIDEAN, a, a)
    assert np.allclose(np.diag(e), 1.0)
    nz = np.linalg.norm(a, axis=1) > 1e-6
    c = kernels.similarity(kernels.COSINE, a[nz], a[nz])
    assert np.allclose(np.diag(c), 1.0, atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(_mats(max_rows=8, dim=16))
def test_l2_normalize_idempotent(a):
    x = kernels.l2_normalize(a)
    assert np.allclose(kernels.l2_normalize(x), x, atol=1e-12)
    nz = np.linalg.norm(a, axis=1) > 1e-6
    assert np.allclose(np.linalg.norm(x[nz], axis=1), 1.0)


@settings(max_examples=50, deadline=None)
@given(arrays(np.float64, (16, 16), elements=_finite))
def test_pq_roundtrip_reduces_with_clusters(mat):
    """More PQ clusters never increase total reconstruction error on the
    training set itself (monotone codebook refinement property; ref
    ProductQuantization encode/decode contract)."""
    from jvector_spark.operators.quantize.pq import ProductQuantizer

    errs = []
    for clusters in (2, 8, 16):
        pq = ProductQuantizer.fit_numpy(mat, m=4, clusters=clusters, iterations=4, seed=7)
        rec = pq.decode_numpy(pq.encode_numpy(mat))
        errs.append(float(((mat - rec) ** 2).sum()))
    assert errs[0] >= errs[-1] - 1e-9


@settings(max_examples=100, deadline=None)
@given(arrays(np.float64, (5, 8), elements=_finite))
def test_bq_sign_bits_roundtrip(mat):
    """BQ encodes exactly the sign pattern: hamming similarity of a matrix
    against itself is 1 on the diagonal, and each packed word reproduces
    (v > 0) bit for bit."""
    from jvector_spark.operators.quantize.bq import BinaryQuantizer

    bq = BinaryQuantizer(dim=8)
    words = bq.encode_numpy(mat)
    sim = bq.similarity(words.astype(np.int64), words.astype(np.int64))
    assert np.allclose(np.diag(sim), 1.0)
    for i in range(len(mat)):
        bits = [(int(words[i, 0]) >> j) & 1 for j in range(8)]
        assert bits == [(1 if v > 0 else 0) for v in mat[i]]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(65, 140))
def test_bq_hamming_block_multiword_matches_naive(seed, dim):
    """_bq_hamming_block (the BQ first-pass stage-1 kernel, uint8 popcount
    LUT over packed uint64 words) == naive bit-count, on multi-word dims
    (> 64) where packing boundaries matter."""
    from jvector_spark.operators.index import _bq_hamming_block
    from jvector_spark.operators.quantize.bq import BinaryQuantizer

    rng = np.random.default_rng(seed)
    bq = BinaryQuantizer(dim=dim)
    a = rng.normal(size=(3, dim))
    b = rng.normal(size=(4, dim))
    wa, wb = bq.encode_numpy(a), bq.encode_numpy(b)
    got = _bq_hamming_block(wa, wb, dim)
    bits_a = (a > 0).astype(int)
    bits_b = (b > 0).astype(int)
    naive = 1.0 - np.abs(bits_a[:, None, :] - bits_b[None, :, :]).sum(axis=2) / dim
    assert np.allclose(got, naive)
