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

    centroids = _init_pp(points, k, rng)
    for _ in range(iterations):
        assign = _nearest(points, centroids)
        for j in range(k):
            mask = assign == j
            if mask.any():
                centroids[j] = points[mask].mean(axis=0)
            else:
                # re-seed empty cluster at the point farthest from its centroid
                far = np.argmax(_min_dist_sq(points, centroids))
                centroids[j] = points[far]
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
