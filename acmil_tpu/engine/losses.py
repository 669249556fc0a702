"""Loss functions for every MIL family.

Mirrors the per-arch loss dispatch in the reference
(`engine.py:16-116,143-154`; ACMIL losses at
`Step3_WSI_classification_ACMIL.py:199-216`), expressed as pure jnp
functions over batched outputs. Padded batch rows are excluded via a
``valid`` weight vector (rows whose bag mask is all False).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmil_tpu.ops.masked import masked_softmax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean softmax cross-entropy. ``logits [B, C]``, ``labels [B]``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    w = valid.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def binary_cross_entropy_with_logits(logits, targets, valid=None):
    z = jax.nn.log_sigmoid(logits)
    zn = jax.nn.log_sigmoid(-logits)
    loss = -(targets * z + (1.0 - targets) * zn)
    if valid is None:
        return jnp.mean(loss)
    w = jnp.broadcast_to(valid.reshape(valid.shape + (1,) * (loss.ndim - valid.ndim)),
                         loss.shape).astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def attention_diversity_loss(attn_logits: jnp.ndarray, mask: jnp.ndarray | None,
                             n_token: int, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean pairwise cosine similarity between branch attention maps
    (`Step3_WSI_classification_ACMIL.py:205-213`).

    ``attn_logits``: ``[B, K, N]`` (GA) or ``[B, H, K, N]`` (MHA — averaged
    over heads H, matching the reference's ``.mean()`` over the leading
    axis). Masked positions contribute 0 probability so pads don't inflate
    similarity.
    """
    if n_token <= 1:
        return jnp.asarray(0.0, dtype=attn_logits.dtype)
    if attn_logits.ndim == 3:
        attn_logits = attn_logits[:, None]                    # [B, 1, K, N]
    m = None if mask is None else mask[:, None, None, :]
    p = masked_softmax(attn_logits, m)                        # [B, H, K, N]
    pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("bhkn,bhjn->bhkj", pn, pn)               # [B, H, K, K]
    iu = jnp.triu(jnp.ones((n_token, n_token), dtype=bool), k=1)
    n_pairs = n_token * (n_token - 1) / 2
    per_bag = jnp.sum(jnp.where(iu, sim, 0.0), axis=(-1, -2)) / n_pairs  # [B, H]
    per_bag = per_bag.mean(axis=1)                            # mean over heads
    if valid is None:
        return per_bag.mean()
    w = valid.astype(per_bag.dtype)
    return jnp.sum(per_bag * w) / jnp.maximum(jnp.sum(w), 1.0)


def acmil_loss(sub_preds, slide_preds, attn_logits, labels, mask, n_token,
               valid=None):
    """loss = branch CE + slide CE + diversity (`Step3_ACMIL:199-216`)."""
    if n_token > 1:
        B, K, C = sub_preds.shape
        sub_flat = sub_preds.reshape(B * K, C)
        lab_flat = jnp.repeat(labels, K)
        v_flat = None if valid is None else jnp.repeat(valid, K)
        loss0 = cross_entropy(sub_flat, lab_flat, v_flat)
    else:
        loss0 = jnp.asarray(0.0, dtype=slide_preds.dtype)
    loss1 = cross_entropy(slide_preds, labels, valid)
    div = attention_diversity_loss(attn_logits, mask, n_token, valid)
    total = loss0 + loss1 + div
    return total, {"sub_loss": loss0, "slide_loss": loss1, "diff_loss": div}
