"""Mini-batch k-means for HuBERT pseudo-label generation (host-side numpy).

Reference analogue: the ssl1 recipe's k-means stage producing frame-level
cluster labels for `espnet2/hubert/espnet_model.py` targets (the reference
delegates to sklearn / fairseq dump_km_label scripts).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def kmeans_fit(
    x: np.ndarray, k: int, n_iter: int = 20, seed: int = 0,
) -> np.ndarray:
    """x (N, D) -> centroids (k, D), Lloyd's algorithm with k-means++ init."""
    rng = np.random.RandomState(seed)
    n = x.shape[0]
    # k-means++ seeding
    centroids = [x[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(
            ((x[:, None] - np.asarray(centroids)[None]) ** 2).sum(-1), axis=1
        )
        probs = d2 / max(d2.sum(), 1e-12)
        centroids.append(x[rng.choice(n, p=probs)])
    c = np.asarray(centroids)
    for _ in range(n_iter):
        labels = kmeans_assign(x, c)
        for j in range(k):
            pts = x[labels == j]
            if len(pts):
                c[j] = pts.mean(0)
    return c


def kmeans_assign(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """x (N, D), centroids (k, D) -> (N,) nearest-centroid ids."""
    # |x-c|^2 = |x|^2 - 2 x.c + |c|^2 ; argmin over c
    d = (
        -2.0 * x @ centroids.T
        + (centroids ** 2).sum(-1)[None, :]
    )
    return np.argmin(d, axis=1).astype(np.int32)
