"""Driver-side k-means++ for codebook training.

Mirrors the reference's ``quantization/KMeansPlusPlusClusterer.java``
(k-means++ seeding + Lloyd's iterations, k=256, 6 rounds by default).
Runs on the driver over a bounded sample — the reference caps PQ training at
128k vectors (``ProductQuantization.java:64 MAX_PQ_TRAINING_SET_SIZE``), so
a distributed trainer would add shuffles for no accuracy gain. At 100 TB the
*sampling* is distributed (``df.sample``); only the ≤128k×d matrix lands on
the driver.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def kmeans_pp(
    points: np.ndarray,
    k: int,
    iterations: int = 6,
    seed: int = 42,
) -> np.ndarray:
    """k-means++ init + Lloyd's rounds; returns (k, d) float64 centroids.

    Empty clusters are re-seeded from the farthest points, matching the
    reference's behavior of keeping exactly k centroids.
    """
    rng = np.random.default_rng(seed)
    n, d = points.shape
    if n == 0:
        raise ValueError("cannot train k-means on an empty sample")
    if k >= n:
        # degenerate: every point its own centroid, pad by repeating points
        reps = -(-k // n)
        return np.tile(points, (reps, 1))[:k].astype(np.float64)
    # One fast trainer for every k (r5 rewrite; the original O(k·n·d)
    # diff-based seeding + O(k·n) Python update loop cost 166 s for
    # k=2528 / 52 s for an m=8 PQ fit over 100k×64): k-means++ seeding on
    # a uniform subsample of >= max(8k, 20k) points (FAISS-style IVF
    # training), gemv distances, per-dimension bincount updates, chunked
    # assignment, batched empty-cluster reseeding. Same algorithm and
    # contract (k centroids, ++ seeding, Lloyd's rounds, no empties) —
    # only summation order / RNG consumption differ, which every
    # downstream gate tolerates by design (recall gates are margin-based;
    # exact-search rows never depend on centroid positions).
    return _kmeans_fast(points, k, iterations, rng)


def _kmeans_fast(
    points: np.ndarray, k: int, iterations: int, rng: np.random.Generator
) -> np.ndarray:
    n, d = points.shape

    # Cap the LLOYD'S training set too, not just the seeding (r7: at
    # d=1024 the full-128k-sample rounds were ~16 s of the build wall):
    # >= 128 points per centroid is comfortably past the estimation
    # noise floor for cluster means, and the bottom-k-by-hash sample the
    # builder passes is uniform, so a random subset of it is uniform.
    # Quality is regression-gated (test_kmeans_fast_mse_within_tolerance
    # _of_full_lloyds; the r6 1M A/B showed recall is insensitive to
    # trainer-detail changes of this kind).
    n_fit = int(min(n, max(128 * k, 20_000)))
    if n_fit < n:
        points = points[rng.choice(n, size=n_fit, replace=False)]
        n = n_fit
    n_sub = int(min(n, max(8 * k, 20_000)))
    sub = points if n_sub >= n else points[rng.choice(n, size=n_sub, replace=False)]
    # distance BLAS runs in the INPUT dtype (f32 training samples halve
    # the moved bytes; see sample_and_count) — centroid means still
    # accumulate in f64, and the returned centroids are f64 as before
    cent = _init_pp_fast(sub, k, rng)
    pp = np.einsum("ij,ij->i", points, points)
    for _ in range(iterations):
        assign = _nearest_chunked(points, cent, pp)
        counts = np.bincount(assign, minlength=k)
        # segment-sum via sort + reduceat (ONE pass over the matrix)
        # instead of d separate bincount passes — the d-iteration Python
        # loop was ~1 s/round at d=1024. The sums accumulate in the INPUT
        # dtype (f32 for training samples): profiling the d=1024 build
        # showed the per-round f64 convert-copy (points[order].astype) was
        # 18.8 s of a 26 s kmeans_pp wall for no quality effect — segment
        # means average <= a few thousand unit-scale values, ~1e-4 relative
        # f32 error, far inside the cluster-assignment noise floor
        # (regression-gated: test_kmeans_fast_mse_within_tolerance).
        # (A threaded chunk-split of this gather + reduceat was tried and
        # measured SLOWER — numpy advanced indexing holds the GIL, so the
        # chunks serialize and only pay thread overhead; the BLAS-backed
        # assignment passes above are where threading wins.)
        order = np.argsort(assign, kind="stable")
        sorted_pts = points[order]
        a_sorted = assign[order]
        starts = np.flatnonzero(np.r_[True, a_sorted[1:] != a_sorted[:-1]])
        seg_sums = np.add.reduceat(sorted_pts, starts, axis=0)
        sums = np.zeros((k, d), dtype=np.float64)
        sums[a_sorted[starts]] = seg_sums
        nonempty = counts > 0
        cent[nonempty] = (sums[nonempty] / counts[nonempty, None]).astype(cent.dtype)
        n_empty = int(k - nonempty.sum())
        if n_empty:
            md = _min_dist_chunked(points, cent, pp)
            far = np.argpartition(md, n - n_empty)[n - n_empty:]
            cent[~nonempty] = points[far]
    return cent.astype(np.float64)


def _init_pp_fast(points: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding with gemv distances (one BLAS matvec per step,
    no n×d temporaries) and inverse-CDF sampling."""
    n, d = points.shape
    pp = np.einsum("ij,ij->i", points, points)
    cent = np.empty((k, d), dtype=points.dtype)
    cent[0] = points[rng.integers(n)]
    d2 = np.full(n, np.inf)
    for j in range(1, k):
        c = cent[j - 1]
        dc = pp + float(c @ c) - 2.0 * (points @ c)
        np.minimum(d2, np.maximum(dc, 0.0), out=d2)
        total = d2.sum()
        if total <= 0:
            cent[j:] = points[rng.integers(n, size=k - j)]
            break
        cum = np.cumsum(d2)
        cent[j] = points[min(np.searchsorted(cum, rng.uniform() * total), n - 1)]
    return cent


_ASSIGN_CHUNK = 16_384  # bounds the (chunk, k) distance block to ~hundreds MB

# r9 (guide §5: the driver should do almost no serial data work): this
# numpy build's BLAS is compiled with MAX_THREADS=2, so every driver-side
# training GEMM ran on <= 2 of the host's cores while the executors sat
# idle between jobs. The chunk loops below were ALREADY independent
# per-chunk writes into disjoint output slices — running the existing
# chunks on a thread pool keeps each chunk's arithmetic byte-identical
# (same shapes, same kernels; only the wall-clock interleaving changes)
# and scales the assignment passes to the driver's cores. Only ever used
# driver-side (kmeans_pp / fine_level / codec fit); executor kernels keep
# their 32-way task parallelism instead.
_DRIVER_THREADS = max(
    1, int(os.environ.get("JVS_DRIVER_THREADS", min(16, os.cpu_count() or 1)))
)
_chunk_pool: ThreadPoolExecutor | None = None


def _pool() -> ThreadPoolExecutor:
    global _chunk_pool
    if _chunk_pool is None:
        _chunk_pool = ThreadPoolExecutor(max_workers=_DRIVER_THREADS)
    return _chunk_pool


def _run_chunked(work, n: int) -> None:
    """Run ``work(lo, hi)`` over row chunks, threaded when it pays."""
    chunks = [(lo, min(lo + _ASSIGN_CHUNK, n)) for lo in range(0, n, _ASSIGN_CHUNK)]
    if len(chunks) <= 1 or _DRIVER_THREADS == 1:
        for lo, hi in chunks:
            work(lo, hi)
        return
    list(_pool().map(lambda c: work(c[0], c[1]), chunks))


def _nearest_chunked(
    points: np.ndarray, cent: np.ndarray, pp: np.ndarray
) -> np.ndarray:
    cc = np.einsum("ij,ij->i", cent, cent)
    out = np.empty(len(points), dtype=np.int64)

    def work(lo: int, hi: int) -> None:
        d = points[lo:hi] @ cent.T
        d *= -2.0
        d += cc[None, :]
        out[lo:hi] = np.argmin(d, axis=1)  # pp term is row-constant

    _run_chunked(work, len(points))
    return out


def _min_dist_chunked(
    points: np.ndarray, cent: np.ndarray, pp: np.ndarray
) -> np.ndarray:
    cc = np.einsum("ij,ij->i", cent, cent)
    out = np.empty(len(points), dtype=np.float64)

    def work(lo: int, hi: int) -> None:
        d = points[lo:hi] @ cent.T
        d *= -2.0
        d += cc[None, :]
        out[lo:hi] = d.min(axis=1) + pp[lo:hi]

    _run_chunked(work, len(points))
    return np.maximum(out, 0.0)


def fine_level(
    points: np.ndarray,
    coarse: np.ndarray,
    n_fine: int,
    iterations: int = 4,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Fine (second-level) centroids seeded HIERARCHICALLY: assign the
    sample to its coarse cells, apportion ``n_fine`` centroids across
    cells by population (largest remainder, >= 1 per nonempty cell), and
    run an independent small k-means inside each cell. This is the
    standard two-level IVF construction (per-cell refinement) and turns
    one O(n_fine)-step sequential ++ seeding (96 s at k=8000 over a 128k
    sample) into ~n_coarse independent tiny problems (~seconds), while
    producing centroids at least as well-adapted to local structure.

    Returns ``(centroids, owners)``: ``owners[j]`` is the coarse cell
    whose sample trained fine centroid ``j``. The level itself is GLOBAL
    (sub_ids index one flat fine table; search probes it globally), but
    the owner map lets the BUILDER assign rows hierarchically — score
    only the fine centroids owned by a row's assigned coarse cells
    instead of all ``n_fine`` (r6: the global assignment matmul dominated
    the 1M build at n_rows x n_fine; hierarchical is n_rows x
    fine-per-cell x spill, ~1000x less at fine_factor=8, k=8000)."""
    rng = np.random.default_rng(seed)
    n = len(points)
    n_fine = int(min(n_fine, n))
    pp = np.einsum("ij,ij->i", points, points)
    # match the sample's dtype so the chunked BLAS never upcasts
    assign = _nearest_chunked(points, coarse.astype(points.dtype), pp)
    counts = np.bincount(assign, minlength=len(coarse))
    nonempty = np.flatnonzero(counts)
    # largest-remainder apportionment, >= 1 per nonempty cell
    raw = counts[nonempty] * (n_fine / max(counts.sum(), 1))
    quota = np.maximum(np.floor(raw).astype(int), 1)
    short = n_fine - int(quota.sum())
    if short > 0:
        order = np.argsort(-(raw - np.floor(raw)))
        quota[order[: short]] += 1
    elif short < 0:
        order = np.argsort(raw - np.floor(raw))
        for i in order:
            if quota[i] > 1 and short < 0:
                quota[i] -= 1
                short += 1
    out = []
    owners = []
    # r9: one stable argsort groups the sample by cell; per-cell rows come
    # from a contiguous slice instead of a full boolean scan + gather per
    # cell (n_coarse passes over the sample — ~1 s at the 1M shape).
    # Stable sort preserves within-cell row order, so each ``sub`` is
    # bit-identical to the points[assign == cell] it replaces (same rows,
    # same order, same RNG consumption downstream).
    order_by_cell = np.argsort(assign, kind="stable")
    a_sorted = assign[order_by_cell]
    cell_starts = np.searchsorted(a_sorted, nonempty, side="left")
    cell_ends = np.searchsorted(a_sorted, nonempty, side="right")
    for cell, k_c, s_, e_ in zip(nonempty, quota, cell_starts, cell_ends):
        sub = points[order_by_cell[s_:e_]]
        k_c = int(min(k_c, len(sub)))
        if k_c >= len(sub):
            out.append(sub.astype(np.float64))
        elif k_c == 1:
            out.append(sub.mean(axis=0, keepdims=True))
        else:
            out.append(
                kmeans_pp(sub, k_c, iterations, int(rng.integers(2**31)))
            )
        owners.append(np.full(len(out[-1]), cell, dtype=np.int64))
    # f64 regardless of training dtype (manifest tables + kernels expect it)
    fine_cents = np.concatenate(out, axis=0).astype(np.float64)
    return fine_cents, np.concatenate(owners)


# ---------------------------------------------------------------------------
# Anisotropic k-means (SURVEY §2.5 A3; ScaNN-style anisotropic PQ)
# ---------------------------------------------------------------------------


def parallel_cost_multiplier(threshold: float, dim: int) -> float:
    """Weight of parallel vs orthogonal residual error derived from a dot
    threshold T: parallelCost = T^2, perpendicularCost = (1-T^2)/(dim-1),
    pcm = max(1, parallel/perpendicular)
    (ref KMeansPlusPlusClusterer.java:116-124). Assumes unit-norm data."""
    parallel = threshold * threshold
    perpendicular = (1.0 - parallel) / max(dim - 1, 1)
    return max(1.0, parallel / max(perpendicular, 1e-30))


def anisotropic_loss(
    points: np.ndarray, centroids: np.ndarray, assign: np.ndarray, pcm: float
) -> float:
    """Mean anisotropic quantization loss: pcm * parallel + orthogonal,
    where the parallel residual is the component of (x - c) along x
    (ref KMeansPlusPlusClusterer.weightedDistance, :317-327)."""
    c = centroids[assign]
    x_sq = np.einsum("ij,ij->i", points, points)
    c_dot_x = np.einsum("ij,ij->i", c, points)
    c_sq = np.einsum("ij,ij->i", c, c)
    parallel = (c_dot_x - x_sq) ** 2 / np.maximum(x_sq, 1e-30)
    residual = np.maximum(c_sq - 2.0 * c_dot_x + x_sq, 0.0)
    orthogonal = np.maximum(residual - parallel, 0.0)
    return float(np.mean(pcm * parallel + orthogonal))


def kmeans_anisotropic(
    points: np.ndarray,
    k: int,
    threshold: float = 0.2,
    unweighted_iterations: int = 6,
    anisotropic_iterations: int = 6,
    seed: int = 42,
) -> np.ndarray:
    """k-means weighting parallel residual error over orthogonal
    (anisotropic PQ, "Accelerating Large-Scale Inference with Anisotropic
    Vector Quantization" §7.5; ref KMeansPlusPlusClusterer.java:140-147,
    277-327, 377-431). Unweighted Lloyd rounds first (much faster), then
    anisotropic refinement; both early-stop when <1% of points move.

    Assignment: argmin_c  pcm * ((c·x - x·x)^2 / x·x) + orthogonal residual.
    Update:     c = M^-1 mean(x),  M = (1-1/pcm)/|L| * Σ x̂x̂ᵀ + (1/pcm) I
                (x̂ = x/‖x‖; the reference divides outer(x,x) by xᵀx).
    """
    rng = np.random.default_rng(seed)
    n, d = points.shape
    if k >= n:
        reps = -(-k // n)
        return np.tile(points, (reps, 1))[:k].astype(np.float64)
    pcm = parallel_cost_multiplier(threshold, d)
    ocm = 1.0 / pcm

    centroids = _init_pp(points, k, rng)
    assign = _nearest(points, centroids)
    for _ in range(unweighted_iterations):
        for j in range(k):
            mask = assign == j
            if mask.any():
                centroids[j] = points[mask].mean(axis=0)
            else:
                centroids[j] = points[rng.integers(n)]
        new_assign = _nearest(points, centroids)
        changed = int((new_assign != assign).sum())
        assign = new_assign
        if changed <= 0.01 * n:
            break

    x_sq = np.maximum(np.einsum("ij,ij->i", points, points), 1e-30)
    xn = points / np.sqrt(x_sq)[:, None]  # outer(x,x)/xᵀx == outer(x̂,x̂)
    eye = np.eye(d)
    for _ in range(anisotropic_iterations):
        # update: per-cluster matrix solve (appendix 7.5)
        for j in range(k):
            mask = assign == j
            cnt = int(mask.sum())
            if cnt == 0:
                centroids[j] = points[rng.integers(n)]
                continue
            m = ((1.0 - ocm) / cnt) * (xn[mask].T @ xn[mask]) + ocm * eye
            mean = points[mask].mean(axis=0)
            try:
                centroids[j] = np.linalg.solve(m, mean)
            except np.linalg.LinAlgError:
                centroids[j] = mean
        # assignment under the weighted distance
        c_dot_x = points @ centroids.T  # (n, k)
        c_sq = np.einsum("ij,ij->i", centroids, centroids)[None, :]
        parallel = (c_dot_x - x_sq[:, None]) ** 2 / x_sq[:, None]
        residual = np.maximum(c_sq - 2.0 * c_dot_x + x_sq[:, None], 0.0)
        dist = pcm * parallel + np.maximum(residual - parallel, 0.0)
        new_assign = np.argmin(dist, axis=1)
        changed = int((new_assign != assign).sum())
        assign = new_assign
        if changed <= 0.01 * n:
            break
    return centroids


def _init_pp(points: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    n = len(points)
    centroids = np.empty((k, points.shape[1]), dtype=np.float64)
    centroids[0] = points[rng.integers(n)]
    d2 = np.full(n, np.inf)
    for j in range(1, k):
        d2 = np.minimum(d2, _dist_sq_to(points, centroids[j - 1]))
        total = d2.sum()
        if total <= 0:
            centroids[j:] = points[rng.integers(n, size=k - j)]
            break
        probs = d2 / total
        centroids[j] = points[rng.choice(n, p=probs)]
    return centroids


def _dist_sq_to(points: np.ndarray, c: np.ndarray) -> np.ndarray:
    diff = points - c
    return np.einsum("ij,ij->i", diff, diff)


def _min_dist_sq(points: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    pp = np.einsum("ij,ij->i", points, points)[:, None]
    cc = np.einsum("ij,ij->i", centroids, centroids)[None, :]
    d = pp + cc - 2.0 * points @ centroids.T
    return np.maximum(d, 0.0).min(axis=1)


def _nearest(points: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    pp = np.einsum("ij,ij->i", points, points)[:, None]
    cc = np.einsum("ij,ij->i", centroids, centroids)[None, :]
    d = pp + cc - 2.0 * points @ centroids.T
    return np.argmin(d, axis=1)
