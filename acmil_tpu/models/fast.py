"""Fast inference paths backed by the fused Pallas kernels.

These consume the same flax parameter trees as the training models, so a
trained checkpoint can be served through the fused path with zero
conversion. Used by Step4 heatmaps and `bench.py`.
"""

from __future__ import annotations

import jax.numpy as jnp

from acmil_tpu.ops.attn_pool import fused_gated_attn_pool


def _ga_weights(params):
    dr = params["DimReduction_0"]["Dense_0"]["kernel"]
    ag = params["AttentionGated_0"]
    v, bv = ag["Dense_0"]["kernel"], ag["Dense_0"]["bias"]
    u, bu = ag["Dense_1"]["kernel"], ag["Dense_1"]["bias"]
    w, bw = ag["Dense_2"]["kernel"], ag["Dense_2"]["bias"]
    return dr, v, bv, u, bu, w, bw


def acmil_ga_infer(params, feats, mask, chunk: int = 1024,
                   interpret: bool = False):
    """Fused ACMIL_GA deterministic forward for one bag.

    Args:
      params: the ACMIL_GA param tree (`acmil_tpu.models.acmil.ACMIL_GA`).
      feats: ``[N, D_feat]``; mask: ``[N]`` bool.

    Returns (sub_preds [K, C], slide_preds [C], attn_logits [K, N]) —
    matching `ACMIL_GA.__call__` on a batch of one.
    """
    dr, v, bv, u, bu, w, bw = _ga_weights(params)
    bag, logits = fused_gated_attn_pool(
        feats, mask, dr, v, bv, u, bu, w, bw, chunk=chunk, interpret=interpret)
    # branch classifiers (stacked)
    sub = jnp.einsum("kl,klc->kc", bag, params["branch_w"]) + params["branch_b"]
    # slide classifier on the branch-mean bag feature: mean-of-softmax
    # attention pooling == mean of per-branch pooled features
    bag_mean = bag.mean(axis=0)
    cls = params["Classifier1fc_0"]["Dense_0"]
    slide = bag_mean @ cls["kernel"] + cls["bias"]
    return sub, slide, logits


def abmil_infer(params, feats, mask, chunk: int = 1024,
                interpret: bool = False):
    """Fused ABMIL deterministic forward (K=1)."""
    dr, v, bv, u, bu, w, bw = _ga_weights(params)
    bag, logits = fused_gated_attn_pool(
        feats, mask, dr, v, bv, u, bu, w, bw, chunk=chunk, interpret=interpret)
    cls = params["Classifier1fc_0"]["Dense_0"]
    return bag[0] @ cls["kernel"] + cls["bias"], logits


def acmil_ga_apply_batched(params, feats, mask, chunk: int = 1024):
    """Differentiable fused ACMIL_GA forward (batched, no STKIM).

    Matches ``ACMIL_GA.__call__`` with ``deterministic=True`` on the same
    param tree: the pooling runs the Pallas kernel (one HBM pass over
    ``feats``), the backward rematerialises through the jnp graph
    (ops/attn_pool.py::gated_attn_pool_grad). Used by the ACMIL family's
    fused train/eval step when STKIM and dropout are off (the reference's
    ABMIL configuration, `README.md:51-54`).
    """
    from acmil_tpu.ops.attn_pool import gated_attn_pool_grad

    dr, v, bv, u, bu, w, bw = _ga_weights(params)
    feats = feats.astype(dr.dtype)
    bag, logits = gated_attn_pool_grad(feats, mask, dr, v, bv, u, bu, w, bw,
                                       chunk)
    sub = jnp.einsum("bkl,klc->bkc", bag, params["branch_w"]) + params["branch_b"]
    bag_mean = bag.mean(axis=1)   # == pooling with branch-mean attention
    cls = params["Classifier1fc_0"]["Dense_0"]
    slide = bag_mean @ cls["kernel"] + cls["bias"]
    return sub, slide, logits
