"""Minimal numpy `faiss` shim for the head-to-head IBMIL protocol.

Covers exactly what the reference's `IBMIL_clustering.py` touches:

- ``PCAMatrix(d_in, d_out, eigen_power)`` + ``train``/``apply_py``
  (`IBMIL_clustering.py:40-43`) — eigendecomposition of the covariance
  with eigenvalue^eigen_power whitening (faiss's PCAMatrix semantics).
  Note the script calls ``Kmeans(k, pca_dim=-1)`` (`:127`), which skips
  PCA entirely (`:38`), so this path is provided for completeness.
- The GPU k-means plumbing of ``run_kmeans`` (`:60-92`):
  ``Clustering(d, k)`` with ``seed``/``niter``/``max_points_per_centroid``
  attributes, ``StandardGpuResources``, ``GpuIndexFlatConfig``,
  ``GpuIndexFlatL2`` with ``search``. ``Clustering.train`` runs seeded
  Lloyd iterations (random-row init, empty clusters respawned on the
  farthest points — the spirit of faiss's split policy) and deposits the
  centroids in the index, which ``search(x, 1)`` then answers from.

This is a test shim for driving the reference script on this box, not a
faiss reimplementation: bit-exact faiss centroids are neither possible
nor needed — the protocol only requires a reasonable k=8 dictionary of
bag features (the downstream phase-2 model treats it as a frozen buffer).
"""

from __future__ import annotations

import numpy as np


class PCAMatrix:
    def __init__(self, d_in: int, d_out: int, eigen_power: float = 0.0):
        self.d_in, self.d_out, self.eigen_power = d_in, d_out, eigen_power
        self.is_trained = False

    def train(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float64)
        self.mean = x.mean(axis=0)
        cov = np.cov(x - self.mean, rowvar=False)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][: self.d_out]
        w, v = np.maximum(w[order], 1e-12), v[:, order]
        self.proj = v * (w ** self.eigen_power)[None, :]
        self.is_trained = True

    def apply_py(self, x: np.ndarray) -> np.ndarray:
        return ((np.asarray(x, np.float64) - self.mean) @ self.proj).astype(
            np.float32)


class Clustering:
    def __init__(self, d: int, k: int):
        self.d, self.k = d, k
        self.seed = 1234
        self.niter = 25
        self.max_points_per_centroid = 256

    def train(self, x: np.ndarray, index: "GpuIndexFlatL2") -> None:
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        rs = np.random.RandomState(self.seed)
        cent = x[rs.choice(n, self.k, replace=False)].copy()
        for _ in range(self.niter):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for j in range(self.k):
                sel = assign == j
                if sel.any():
                    cent[j] = x[sel].mean(axis=0)
                else:  # respawn empty cluster on the farthest point
                    cent[j] = x[d2.min(axis=1).argmax()]
        index._centroids = cent


class StandardGpuResources:
    pass


class GpuIndexFlatConfig:
    def __init__(self):
        self.useFloat16 = False
        self.device = 0


class GpuIndexFlatL2:
    def __init__(self, res, d: int, config=None):
        self.d = d
        self._centroids = None

    def search(self, x: np.ndarray, k: int):
        x = np.asarray(x, np.float32)
        d2 = ((x[:, None, :] - self._centroids[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, :k]
        return np.take_along_axis(d2, idx, axis=1), idx
