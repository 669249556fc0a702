"""On-device k-means + PCA whitening — the faiss replacement for IBMIL
confounder construction.

Reference: `IBMIL_clustering.py:25-57` (faiss PCAMatrix with
``eigen_power=-0.5`` whitening + L2 normalisation), `run_kmeans:60`
(faiss GPU k-means, 20 Lloyd iterations), `reduce:118` (per-cluster
centroids of the *raw* features).

TPU-native: PCA via ``jnp.linalg.eigh`` of the covariance, Lloyd
iterations as a ``lax.fori_loop`` of one big distance matmul per step —
the assignment step is a single ``[N, K]`` argmin over
``|x|^2 - 2 x·c + |c|^2``, MXU-friendly at any N. k-means++-style init by
choosing the first centroid at random and subsequent ones proportional to
squared distance (done with a fixed number of passes, all static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pca_whiten(x: jnp.ndarray, dim: int = -1, eigen_power: float = -0.5,
               eps: float = 1e-10) -> jnp.ndarray:
    """PCA-reduce + whiten + L2-normalise (`preprocess_features`,
    `IBMIL_clustering.py:25-57`). ``dim=-1`` keeps the input dim (no
    reduction), matching ``Kmeans(pca_dim=-1)`` at `IBMIL_clustering.py:127`."""
    x = jnp.asarray(x, jnp.float32)
    if dim is not None and dim > 0 and dim < x.shape[1]:
        mean = x.mean(axis=0, keepdims=True)
        xc = x - mean
        cov = xc.T @ xc / x.shape[0]
        evals, evecs = jnp.linalg.eigh(cov)                     # ascending
        top = evecs[:, -dim:][:, ::-1]
        lam = jnp.maximum(evals[-dim:][::-1], eps)
        x = (xc @ top) * (lam ** eigen_power)
    norms = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / (norms + eps)


@partial(jax.jit, static_argnames=("k", "n_iter"))
def _lloyd(x: jnp.ndarray, init_centroids: jnp.ndarray, k: int,
           n_iter: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x2 = jnp.sum(x * x, axis=1, keepdims=True)                  # [N, 1]

    def assign(c):
        d = x2 - 2.0 * (x @ c.T) + jnp.sum(c * c, axis=1)[None, :]
        return jnp.argmin(d, axis=1)                            # [N]

    def body(_, c):
        a = assign(c)
        onehot = jax.nn.one_hot(a, k, dtype=x.dtype)            # [N, K]
        sums = onehot.T @ x                                     # [K, D]
        counts = onehot.sum(axis=0)[:, None]                    # [K, 1]
        new_c = sums / jnp.maximum(counts, 1.0)
        # keep empty clusters where they were
        return jnp.where(counts > 0, new_c, c)

    c = jax.lax.fori_loop(0, n_iter, body, init_centroids)
    return c, assign(c)


def kmeans(x, k: int, n_iter: int = 20, seed: int = 66,
           pca_dim: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster (optionally PCA-whitened) features; returns
    (assignments [N], centroids-of-RAW-features [k, D]) exactly like
    `reduce` (`IBMIL_clustering.py:118-136`): clustering runs in the
    preprocessed space, centroids are means of the raw features."""
    raw = jnp.asarray(x, jnp.float32)
    xb = pca_whiten(raw, pca_dim)
    rng = jax.random.PRNGKey(seed)
    n = xb.shape[0]
    # k-means++ style init: carry a running [N] min-distance and update it
    # with only the NEWEST centroid each draw — O(N*k*D) total and O(N)
    # state, vs rebuilding the full [N, i, D] pairwise tensor per draw
    idx0 = jax.random.randint(rng, (), 0, n)
    centroids = [xb[idx0]]
    d_min = jnp.sum((xb - xb[idx0]) ** 2, axis=-1)            # [N]
    for i in range(1, k):
        p = d_min / jnp.maximum(d_min.sum(), 1e-12)
        idx = jax.random.choice(jax.random.fold_in(rng, i), n, p=p)
        centroids.append(xb[idx])
        d_min = jnp.minimum(d_min, jnp.sum((xb - xb[idx]) ** 2, axis=-1))
    init = jnp.stack(centroids)

    _, assign = _lloyd(xb, init, k, n_iter)
    onehot = jax.nn.one_hot(assign, k, dtype=raw.dtype)
    sums = onehot.T @ raw
    counts = onehot.sum(axis=0)[:, None]
    raw_centroids = sums / jnp.maximum(counts, 1.0)
    return np.asarray(assign), np.asarray(raw_centroids)


def build_confounder_prototypes(bag_feats, k: int = 8, seed: int = 66,
                                pca_dim: int = -1) -> np.ndarray:
    """The IBMIL confounder dictionary: k-means centroids over training bag
    features (`IBMIL_clustering.py:118-145`)."""
    _, centroids = kmeans(np.asarray(bag_feats, np.float32), k,
                          seed=seed, pca_dim=pca_dim)
    return centroids
