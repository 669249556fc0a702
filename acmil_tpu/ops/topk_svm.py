"""Smooth top-1 SVM loss.

Reference: `modules/topk/` — a vendored (and incomplete: ``svm.py`` is
missing, SURVEY.md §2.3) smooth-topk library computing SVM losses in
log-space polynomial algebra. CLAM's instance loss optionally uses
``SmoothTop1SVM`` (`modules/clam.py:5`).

For top-1 the polynomial machinery collapses to a closed form: the smooth
hinge is a temperature-τ log-sum-exp over the margin-augmented scores,

    L(s, y) = τ · logsumexp_j((s_j + α·[j != y]) / τ) − s_y

which is exactly SmoothTop1SVM(k=1) and is what we implement — in jnp,
fully differentiable, no polynomial divide-and-conquer needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_top1_svm_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                         alpha: float = 1.0, tau: float = 1.0,
                         valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean smooth top-1 SVM loss. scores [..., C], labels [...] int."""
    onehot = jax.nn.one_hot(labels, scores.shape[-1], dtype=scores.dtype)
    aug = scores + alpha * (1.0 - onehot)
    lse = tau * jax.nn.logsumexp(aug / tau, axis=-1)
    s_y = jnp.sum(scores * onehot, axis=-1)
    loss = lse - s_y
    if valid is None:
        return loss.mean()
    w = valid.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)
