"""Masked numerics over padded bags — the shared substrate for every MIL head.

The reference never batches (B=1 everywhere) so it has no notion of padding;
on TPU every bag is padded to a static bucket length and carries a validity
mask. These helpers implement the reference's softmax / top-k / scatter
patterns (`architecture/transformer.py:311-327`, `utils/utils.py:54`) as
fixed-shape, mask-aware jnp formulations — no dynamic shapes, no scatters
with data-dependent extents, everything fusible by XLA.

Shapes use ``...`` for leading batch/branch axes; the masked axis is last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference's masked_fill value (transformer.py:320). Large but
# finite so bf16/f32 softmax stays NaN-free even when a row is fully masked.
NEG_INF = -1e9


def masked_fill(x: jnp.ndarray, mask: jnp.ndarray, value: float = NEG_INF) -> jnp.ndarray:
    """Where ``mask`` is False, replace with ``value``. mask broadcasts to x."""
    return jnp.where(mask, x, jnp.asarray(value, dtype=x.dtype))


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -1) -> jnp.ndarray:
    """Softmax that assigns exactly 0 probability to masked positions.

    Stable for fully-masked rows (returns all zeros rather than NaN) — padded
    batch rows produce harmless zero attention.
    """
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    neg = jnp.asarray(NEG_INF, dtype=logits.dtype)
    x = jnp.where(mask, logits, neg)
    x = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    ex = jnp.exp(x) * mask.astype(logits.dtype)
    denom = jnp.sum(ex, axis=axis, keepdims=True)
    return ex / jnp.maximum(denom, jnp.asarray(1e-12, dtype=logits.dtype))


def softmax_one(logits: jnp.ndarray, mask: jnp.ndarray | None = None, axis: int = -1) -> jnp.ndarray:
    """'softmax_one' / quiet-softmax: adds a virtual zero logit to the
    denominator so attention may attend to nothing (reference
    `utils/utils.py:54`, used by CLAM_MB at `architecture/clam.py:248`)."""
    x = logits if mask is None else masked_fill(logits, mask)
    # softmax_one(x)_i = exp(x_i) / (1 + sum_j exp(x_j)); stabilise around
    # m = max(max(x), 0) so the virtual zero logit is included in the max.
    m = jax.lax.stop_gradient(jnp.maximum(jnp.max(x, axis=axis, keepdims=True), 0.0))
    ex = jnp.exp(x - m)
    if mask is not None:
        ex = ex * mask.astype(x.dtype)
    denom = jnp.sum(ex, axis=axis, keepdims=True) + jnp.exp(-m)
    return ex / denom


def masked_topk_mask(scores: jnp.ndarray, k: int, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Boolean mask selecting the top-k valid entries along the last axis.

    Fixed-shape replacement for ``torch.topk`` + ``scatter_``
    (transformer.py:314-319). ``k`` must be static. Masked entries never
    make the top-k (they are pushed to -inf first).
    """
    if mask is not None:
        scores = masked_fill(scores, mask)
    _, idx = jax.lax.top_k(scores, k)
    sel = jax.nn.one_hot(idx, scores.shape[-1], dtype=jnp.bool_)
    out = jnp.any(sel, axis=-2)
    if mask is not None:
        out = jnp.logical_and(out, mask)
    return out


def stkim_mask(
    rng: jax.Array,
    attn_logits: jnp.ndarray,
    n_masked_patch: int,
    mask_drop: float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stochastic Top-K Instance Masking (ACMIL, transformer.py:311-320).

    Per branch: find the top-``n_masked_patch`` attention logits, choose a
    random ``floor(n_masked_patch * mask_drop)``-subset of them, and return
    logits with those positions filled with -1e9.

    The reference's scatter formulation (argsort of uniform noise → fancy
    index → scatter) becomes a fixed-shape rank trick: add uniform noise
    ranks to the top-k set and keep the lowest ``n_drop`` ranks.

    Args:
      rng: PRNG key.
      attn_logits: ``[..., K, N]`` raw attention logits.
      mask: ``[..., 1, N]`` or ``[..., K, N]`` validity (optional).

    Returns logits of the same shape with dropped positions = NEG_INF.
    """
    drop, _ = stkim_drop(rng, attn_logits, n_masked_patch, mask_drop, mask)
    if drop is None:
        return attn_logits
    return masked_fill(attn_logits, jnp.logical_not(drop))


def stkim_drop(
    rng: jax.Array,
    attn_logits: jnp.ndarray,
    n_masked_patch: int,
    mask_drop: float,
    mask: jnp.ndarray | None = None,
):
    """The STKIM selection itself: ``(drop, topk_idx)``.

    ``drop`` is a ``[..., K, N]`` bool mask of positions to fill with
    NEG_INF (or None when STKIM is a no-op), ``topk_idx`` the
    ``[..., K, k]`` indices of the per-branch top-k candidates. Exposed
    separately so the fused train path (models/fast.py) can apply the
    drop as an O(K·k) correction on the pooled output instead of
    re-running the softmax over N.
    """
    n = attn_logits.shape[-1]
    k = min(n_masked_patch, n)
    n_drop_max = int(k * mask_drop)
    if k <= 0 or n_drop_max <= 0:
        return None, None
    scores = attn_logits if mask is None else masked_fill(attn_logits, mask)
    _, topk_idx = jax.lax.top_k(jax.lax.stop_gradient(scores), k)
    topk = jnp.any(jax.nn.one_hot(topk_idx, n, dtype=jnp.bool_), axis=-2)
    if mask is not None:
        topk = jnp.logical_and(topk, mask)
    # The reference clamps k by the REAL bag length (`transformer.py:313`:
    # n_masked_patch = min(conf, n)); with padded bags the clamp must use
    # the per-bag valid count, or a bag with n_valid < k drops
    # floor(k*mask_drop) of its n_valid patches — up to all of them.
    if mask is not None:
        n_valid = jnp.sum(mask, axis=-1)                     # [..., 1|K]
        k_eff = jnp.minimum(k, n_valid)
    else:
        k_eff = jnp.full(attn_logits.shape[:-1], k)
    n_drop = jnp.floor(k_eff * mask_drop).astype(jnp.int32)  # [..., 1|K]
    n_drop = jnp.broadcast_to(n_drop, attn_logits.shape[:-1])
    # Random ranks: positions in the top-k set compete on iid uniforms; the
    # n_drop smallest get dropped — exactly a uniform random n_drop-subset.
    u = jax.random.uniform(rng, attn_logits.shape, dtype=jnp.float32)
    u = jnp.where(topk, u, jnp.inf)
    # n_drop varies per bag but is bounded by the static n_drop_max: take
    # the n_drop_max smallest once, then pick each row's n_drop-th as its
    # threshold
    smallest = jax.lax.top_k(-u, n_drop_max)[0]              # [..., n_drop_max]
    idx = jnp.clip(n_drop - 1, 0, n_drop_max - 1)[..., None]
    threshold = jnp.take_along_axis(smallest, idx, axis=-1)  # [..., 1]
    drop = topk & (-u >= threshold) & (n_drop[..., None] > 0)
    return drop, topk_idx


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -2) -> jnp.ndarray:
    """Mean over the patch axis counting only valid entries."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = jnp.expand_dims(mask, -1).astype(x.dtype)
    s = jnp.sum(x * m, axis=axis)
    n = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return s / n


def masked_max(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -2) -> jnp.ndarray:
    """Max over the patch axis ignoring padded entries."""
    if mask is None:
        return jnp.max(x, axis=axis)
    m = jnp.expand_dims(mask, -1)
    return jnp.max(jnp.where(m, x, jnp.asarray(NEG_INF, x.dtype)), axis=axis)
