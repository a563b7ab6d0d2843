"""Host-side DBSCAN for the legacy in-SLAM uncertainty targeting.

Reference: sklearn.cluster.DBSCAN(eps=0.1, min_samples=5) over
high-uncertainty Gaussian centers (models/SLAM/gaussian.py:1238-1241).
sklearn is not in this environment; this is the classic core-point BFS
over a cKDTree neighbor graph — identical labels up to cluster-id
permutation, same -1 noise convention.  Host-side on purpose: the input
is the thresholded top-20% point set (a few thousand rows) and the
output feeds host-side candidate sampling.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def dbscan(points: np.ndarray, eps: float = 0.1,
           min_samples: int = 5) -> np.ndarray:
    """Cluster labels (N,), noise = -1."""
    n = len(points)
    labels = np.full(n, -1, np.int64)
    if n == 0:
        return labels
    tree = cKDTree(np.asarray(points, np.float64))
    neighbors = tree.query_ball_point(points, eps)      # includes self
    core = np.fromiter((len(nb) >= min_samples for nb in neighbors),
                       bool, n)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        labels[i] = cluster
        stack = [i]
        while stack:
            j = stack.pop()
            for q in neighbors[j]:
                if labels[q] == -1:
                    labels[q] = cluster
                    if core[q]:
                        stack.append(q)
        cluster += 1
    return labels
