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


# ---------------------------------------------------------------------------
# Smooth top-k SVM, k >= 1 (`modules/topk/functional.py:46-72` semantics)
# ---------------------------------------------------------------------------

def log_elementary_symmetric(logx: jnp.ndarray, k: int) -> jnp.ndarray:
    """log sigma_j(exp(logx)) for j = 0..k over the last axis.

    The reference computes these with log-space polynomial
    divide-and-conquer plus a hand-derived stable backward
    (`modules/topk/polynomial/{sp,divide_conquer,grad}.py`). On TPU the
    Newton-style DP recurrence

        sigma_j^{(i)} = sigma_j^{(i-1)} + x_i * sigma_{j-1}^{(i-1)}

    as a ``lax.scan`` over classes (carry: the [k+1] log-coefficient row)
    is compiler-friendly — static shapes, O(C*k) work — and autodiff
    through ``logaddexp`` is stable at the tau regimes the loss uses.
    Entries equal to -inf contribute factor 0 (used to drop the
    ground-truth class).
    """
    shape = logx.shape[:-1]
    n = logx.shape[-1]
    neg = jnp.asarray(-jnp.inf, logx.dtype)
    init = jnp.full(shape + (k + 1,), -jnp.inf, logx.dtype)
    init = init.at[..., 0].set(0.0)

    def safe_logaddexp(a, b):
        # jnp.logaddexp's JVP is NaN when both args are -inf: the result
        # is log(S) with S = 0 and d log(S)/dS = 1/S. Double-where keeps
        # the exact -inf forward while routing zero gradient through it.
        m = jnp.where(jnp.isfinite(jnp.maximum(a, b)),
                      jnp.maximum(a, b), 0.0)
        s = jnp.exp(a - m) + jnp.exp(b - m)
        safe = jnp.where(s > 0, s, 1.0)
        return jnp.where(s > 0, m + jnp.log(safe), -jnp.inf)

    def step(le, xi):
        # shift right: log sigma_{j-1}
        prev = jnp.concatenate(
            [jnp.full(shape + (1,), neg, logx.dtype), le[..., :-1]], axis=-1)
        return safe_logaddexp(le, xi[..., None] + prev), None

    le, _ = jax.lax.scan(step, init, jnp.moveaxis(logx, -1, 0))
    return le


def smooth_topk_svm_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                         k: int, alpha: float = 1.0, tau: float = 1.0,
                         valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean smooth top-k SVM loss (Berrada et al.; `Topk_Smooth_SVM`,
    `modules/topk/functional.py:46-72`). scores [..., C], labels [...].

    With s~ = s/(k*tau), y's entry dropped from the symmetric sums:

        L = tau * log( (sigma_k * e^{alpha/tau} + sigma_{k-1} e^{s~_y})
                       / (sigma_{k-1} e^{s~_y}) )
          = tau * softplus(log sigma_k + alpha/tau - log sigma_{k-1} - s~_y)

    which reduces to the top-1 closed form at k=1
    (sigma_0 = 1, sigma_1 = sum of exps).
    """
    if k == 1:
        return smooth_top1_svm_loss(scores, labels, alpha, tau, valid)
    onehot = jax.nn.one_hot(labels, scores.shape[-1], dtype=bool)
    x = scores / (k * tau)
    s_y = jnp.sum(jnp.where(onehot, x, 0.0), axis=-1)
    x_others = jnp.where(onehot, -jnp.inf, x)
    le = log_elementary_symmetric(x_others, k)
    log_sk, log_skm1 = le[..., k], le[..., k - 1]
    loss = tau * jax.nn.softplus(log_sk + alpha / tau - log_skm1 - s_y)
    if valid is None:
        return loss.mean()
    w = valid.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def topk_hard_svm_loss(scores: jnp.ndarray, labels: jnp.ndarray, k: int,
                       alpha: float = 1.0) -> jnp.ndarray:
    """Hard top-k SVM (`Topk_Hard_SVM`, `modules/topk/functional.py:19-32`):
    clamp(mean(top-k of non-y scores + alpha) -
          (sum(top-(k-1) of non-y) + s_y)/k, 0)."""
    onehot = jax.nn.one_hot(labels, scores.shape[-1], dtype=bool)
    s_y = jnp.sum(jnp.where(onehot, scores, 0.0), axis=-1)
    x1 = jnp.where(onehot, -jnp.inf, scores)
    top = jax.lax.top_k(x1, k)[0]
    max_1 = top.mean(axis=-1) + alpha
    max_2 = (top[..., : k - 1].sum(axis=-1) + s_y) / k
    return jnp.maximum(max_1 - max_2, 0.0).mean()
