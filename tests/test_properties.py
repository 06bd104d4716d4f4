"""Property-based tests (hypothesis) for the numeric kernel layer.

The reference's test strategy leans on randomized property tests
(``TestVectorSimilarityFunction``-style tolerance checks, Test2DThreshold
random corpora — SURVEY §5); these mirror that at the kernel level, pure
numpy (no SparkSession) so they are fast and deterministic under
hypothesis's shrinking.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from jvector_spark.functions import kernels

_finite = st.floats(-100.0, 100.0, allow_nan=False, width=32)


def _mats(max_rows=6, dim=8):
    n = st.integers(1, max_rows)
    return n.flatmap(lambda k: arrays(np.float64, (k, dim), elements=_finite))


@settings(max_examples=200, deadline=None)
@given(_mats(), _mats())
def test_similarity_scores_bounded(a, b):
    """All three metric normalizations land in the documented ranges:
    EUCLIDEAN/COSINE in (0, 1]; DOT_PRODUCT is (1+dot)/2, unbounded in
    general but symmetric around 1/2."""
    e = kernels.similarity(kernels.EUCLIDEAN, a, b)
    assert np.all(e > 0.0) and np.all(e <= 1.0)
    c = kernels.similarity(kernels.COSINE, a, b)
    assert np.all(c >= -1e-12) and np.all(c <= 1.0 + 1e-12)
    d = kernels.similarity(kernels.DOT_PRODUCT, a, b)
    assert np.allclose(d + kernels.similarity(kernels.DOT_PRODUCT, -a, b), 1.0)


@settings(max_examples=200, deadline=None)
@given(_mats())
def test_self_similarity_is_max(a):
    """Every vector's nearest neighbor under EUCLIDEAN/COSINE is itself
    (score 1 on the diagonal, within float tolerance)."""
    e = kernels.similarity(kernels.EUCLIDEAN, a, a)
    assert np.allclose(np.diag(e), 1.0)
    nz = np.linalg.norm(a, axis=1) > 1e-6
    c = kernels.similarity(kernels.COSINE, a[nz], a[nz])
    assert np.allclose(np.diag(c), 1.0, atol=1e-9)


@settings(max_examples=200, deadline=None)
@given(_mats(max_rows=5), st.integers(1, 8))
def test_topk_per_row_is_sorted_and_tiebroken(scores_src, k):
    """topk_per_row returns per-row results sorted by (score desc, id asc)
    and equals a full deterministic sort's first k — including duplicate
    scores, where argpartition alone would break ties arbitrarily."""
    scores = np.round(scores_src, 1)  # force ties
    m, n = scores.shape
    ids = np.arange(n, dtype=np.int64)[::-1].copy()  # non-ascending ids
    idx, vals = kernels.topk_per_row(scores, k, ids=ids)
    kk = min(k, n)
    for r in range(m):
        want = np.lexsort((ids, -scores[r]))[:kk]
        assert list(idx[r]) == list(want)
        assert np.allclose(vals[r], scores[r][want])


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
