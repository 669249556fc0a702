"""Fast inference paths backed by the fused Pallas kernels.

These consume the same flax parameter trees as the training models, so a
trained checkpoint can be served through the fused path with zero
conversion. Used by Step4 heatmaps and `bench.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from acmil_tpu.ops.attn_pool import fused_gated_attn_pool

# CLAM/DSMIL fused-vs-XLA crossover measured on v5e (BENCH_NOTES r4,
# scripts/bench_clam_pool.py): at ≤32k patches the plain XLA pooling
# graph still wins (fused 0.67-0.93x, absolute gaps ≈20µs/slide); at 64k
# the streaming kernel wins 1.1-3.0x and scales linearly while the XLA
# graph degrades superlinearly. Families route these heads fused only at
# N ≥ this threshold (tests pin it to 0 to force the kernel). The GA
# heads are NOT gated by this — their fused path wins at every bucket.
FUSE_MIN_N = 49152

# DTFD's fused route measured NEGATIVE at every size (BENCH_NOTES r4:
# 0.89-0.94x at N=16k/64k/262k, i.e. per-group S up to 65k): unlike
# CLAM/DSMIL, DTFD pools the NARROW dim-reduced array, so the plain XLA
# graph never hits the wide-activation cliff the kernels win on — both
# paths are dominated by the shared reduction GEMM + permutation gather
# + CAM. None = never route (tests/bench pin to 0); the minimum
# per-group length to engage at if a future geometry changes the call.
DTFD_FUSE_MIN_S = None

# Smallest kept softmax mass (1 − Σ dropped probabilities) the O(K·k)
# STKIM subtract-renormalise identity stays accurate for in f32:
# relative error ≈ ε / kept_mass ≈ 6e-8 / 1e-5 ≈ 6e-3. Below it the
# correction switches to an exact kept-softmax recompute.
_STKIM_KEPT_MIN = 1e-5
# Equivalent logit-gap bound (kept_mass ≥ e^-gap): kept for tests that
# construct adversarial fixtures in the logit domain.
_STKIM_GAP_MAX = 11.5


class _StkimRngProbe(nn.Module):
    """Replays flax's rng derivation for `ACMIL_GA`'s `make_rng("stkim")`:
    a root-scope compact module drawing the stream once derives the same
    key for a given apply-level stream key. Used so the fused train path
    makes bit-identical STKIM drop decisions to `model.apply`."""

    @nn.compact
    def __call__(self):
        return self.make_rng("stkim")


def derive_stkim_rng(rng):
    return _StkimRngProbe().apply({}, rngs={"stkim": rng})


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
    zb1 = jnp.zeros((dr.shape[1],), jnp.float32)
    bag, logits = fused_gated_attn_pool(
        feats, mask, dr, zb1, v, bv, u, bu, w, bw, chunk=chunk,
        interpret=interpret)
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
    zb1 = jnp.zeros((dr.shape[1],), jnp.float32)
    bag, logits = fused_gated_attn_pool(
        feats, mask, dr, zb1, v, bv, u, bu, w, bw, chunk=chunk,
        interpret=interpret)
    cls = params["Classifier1fc_0"]["Dense_0"]
    return bag[0] @ cls["kernel"] + cls["bias"], logits


def _stkim_correct(bag, logits, feats, mask, w1, rng, n_masked_patch,
                   mask_drop):
    """Apply STKIM to an already-pooled bag as an O(K·k) correction.

    The fused kernel pools with the FULL softmax and emits the raw logit
    matrix ``[B, K, N]``. STKIM (`transformer.py:311-320`) drops a random
    subset of each branch's top-k logits — at most ``k = n_masked_patch``
    positions per branch — so the post-drop pooled feature is the full
    one minus the dropped terms, renormalised:

        bag' = (bag − Σ_dropped p_t h_t) / (1 − Σ_dropped p_t)

    where ``p_t = exp(a_t − lse_full)`` are the FULL-softmax
    probabilities of the dropped entries — ``bag`` from the kernel is
    already the full-softmax pooled sum, so everything past one
    logsumexp over the emitted logits is O(K·k): gather ≤k rows per
    branch, recompute their ``h``, one tiny matmul (code-review r3
    removed the previous formulation's four extra [B,K,N] passes —
    kept-max, exp, mask, reduce).

    The subtraction's relative error grows like ε / kept_mass — when
    the dropped entries carry almost all the softmax mass
    (kept < ``_STKIM_KEPT_MIN``) it cancels catastrophically in f32, so
    the whole batch switches (``lax.cond``) to an exact kept-softmax
    recompute (the unfused formulation, one extra pooling pass). In the
    reference recipe the kept mass stays large: STKIM drops at most
    ⌈mask_drop·k⌉ of the top-k, so the kept set retains the (k+1)-th
    logit and gated-attention logits are bounded (|a| ≤ ‖w‖₁ via
    tanh·σ).

    Returns (bag' [B,K,L], post-drop logits [B,K,N] — the model's
    ``A_out`` with NEG_INF at dropped positions).
    """
    from acmil_tpu.ops.masked import NEG_INF, stkim_drop

    drop, topk_idx = stkim_drop(rng, logits, n_masked_patch, mask_drop,
                                mask[:, None, :])
    if drop is None:
        return bag, logits
    a_drop = jnp.where(drop, jnp.asarray(NEG_INF, logits.dtype), logits)
    # one [B,K,N] pass; the kernels' online-softmax stats are not
    # plumbed through their custom_vjp (a stat output would need its own
    # backward rule for ~300 KB/bag of savings)
    lse_full = jax.nn.logsumexp(
        jnp.where(mask[:, None, :], logits, NEG_INF), axis=-1, keepdims=True)
    dflag = jnp.take_along_axis(drop, topk_idx, axis=-1)      # [B, K, k]
    a_top = jnp.take_along_axis(logits, topk_idx, axis=-1)
    p_top = jnp.exp(a_top - lse_full) * dflag.astype(logits.dtype)
    kept_mass = 1.0 - jnp.sum(p_top, axis=-1)                 # [B, K]

    def _fused_correct(_):
        # subtract the dropped terms: gather ≤k rows/branch, recompute h
        x_top = jax.vmap(lambda f, i: f[i])(feats, topk_idx)  # [B,K,k,Df]
        h_top = jnp.maximum(x_top.astype(w1.dtype) @ w1, 0.0)  # [B,K,k,L]
        num = bag - jnp.einsum("bkt,bktl->bkl", p_top, h_top)
        return num / jnp.maximum(kept_mass[..., None], _STKIM_KEPT_MIN / 4)

    def _exact(_):
        # kept-softmax pooling from scratch — numerically exact at the
        # cost of re-running the dim-reduction GEMM over every patch
        h = jnp.maximum(feats.astype(w1.dtype) @ w1, 0.0)    # [B, N, L]
        keep = mask[:, None, :] & jnp.logical_not(drop)
        attn = jax.nn.softmax(
            jnp.where(keep, a_drop, jnp.asarray(NEG_INF, logits.dtype)),
            axis=-1)
        return jnp.einsum("bkn,bnl->bkl", attn, h)

    bag2 = jax.lax.cond(jnp.min(kept_mass) >= _STKIM_KEPT_MIN,
                        _fused_correct, _exact, None)
    return bag2, a_drop


def acmil_ga_apply_batched(params, feats, mask, chunk: int = 1024,
                           stkim_rng=None, n_masked_patch: int = 0,
                           mask_drop: float = 0.0, mesh=None):
    """Differentiable fused ACMIL_GA forward (batched).

    Matches ``ACMIL_GA.__call__`` on the same param tree: the pooling
    runs the Pallas kernel (one HBM pass over ``feats``) with a fused
    one-pass backward (ops/attn_pool.py::gated_attn_pool_grad). With
    ``stkim_rng`` set (training, `n_token/n_masked_patch/mask_drop` per
    `README.md:55-58`), STKIM applies as an O(K·k) correction on the
    pooled output (:func:`_stkim_correct`) — the flagship recipe keeps
    the full fused-kernel speedup. With ``mesh`` set the pooling runs
    the (data, seq)-sharded kernel with the flash merge
    (ops/attn_pool.py::sharded_gated_attn_pool_grad).

    ``stkim_rng`` must be the flax-derived key (:func:`derive_stkim_rng`)
    so drop decisions match ``model.apply`` bit-for-bit.
    """
    from acmil_tpu.ops.attn_pool import (gated_attn_pool_grad,
                                         sharded_gated_attn_pool_grad)

    dr, v, bv, u, bu, w, bw = _ga_weights(params)
    feats = feats.astype(dr.dtype)
    zb1 = jnp.zeros((dr.shape[1],), jnp.float32)  # bias-free DimReduction
    if mesh is not None:
        bag, logits = sharded_gated_attn_pool_grad(
            feats, mask, dr, zb1, v, bv, u, bu, w, bw, mesh, chunk)
    else:
        bag, logits = gated_attn_pool_grad(feats, mask, dr, zb1, v, bv, u,
                                           bu, w, bw, chunk)
    if stkim_rng is not None and n_masked_patch > 0 and mask_drop > 0:
        bag, logits = _stkim_correct(bag, logits, feats, mask, dr,
                                     stkim_rng, n_masked_patch, mask_drop)
    sub = jnp.einsum("bkl,klc->bkc", bag, params["branch_w"]) + params["branch_b"]
    bag_mean = bag.mean(axis=1)   # == pooling with branch-mean attention
    cls = params["Classifier1fc_0"]["Dense_0"]
    slide = bag_mean @ cls["kernel"] + cls["bias"]
    return sub, slide, logits


# ---------------------------------------------------------------------------
# CLAM through the fused kernel (VERDICT r3 item 2)
# ---------------------------------------------------------------------------

def _clam_weights(params):
    """CLAM_SB/MB param tree → fused-kernel operands. CLAM's first fc has
    a bias (`architecture/clam.py:91` stock ``nn.Linear``) — the kernel's
    ``b1`` — and its ``Attn_Net_Gated`` is the same gated-attention
    computation the kernel implements (`clam.py:46-67`)."""
    d0 = params["Dense_0"]
    ag = params["AttnNetGated_0"]
    return (d0["kernel"], d0["bias"],
            ag["Dense_0"]["kernel"], ag["Dense_0"]["bias"],
            ag["Dense_1"]["kernel"], ag["Dense_1"]["bias"],
            ag["Dense_2"]["kernel"], ag["Dense_2"]["bias"])


def clam_is_fusable(params) -> bool:
    return "AttnNetGated_0" in params and "Dense_0" in params


def _clam_instance_loss(params, feats, mask, label, A, w1, b1h, *,
                        n_class, k_sample, subtyping):
    """`_CLAMBase._instance_loss` on kernel outputs: top/bottom-k over the
    attention rows, h recomputed only for the ≤2k gathered rows per class
    (the STKIM-correction trick) instead of materialising [B, N, L].

    CE instance loss only — the optional SmoothTop1SVM path keeps
    model.apply (`inst_loss: svm` is not routed fused)."""
    from acmil_tpu.models.clam import _binary_ce
    from acmil_tpu.ops.masked import masked_fill

    wc, bc = params["inst_w"], params["inst_b"]
    onehot = jax.nn.one_hot(label, n_class)
    k = k_sample

    def gather_h(idx):                                   # [B, k] -> [B,k,L]
        x = jax.vmap(lambda f, i: f[i])(feats, idx)
        return jnp.maximum(x.astype(w1.dtype) @ w1 + b1h, 0.0)

    losses_in, losses_out = [], []
    for c in range(n_class):
        Ac = A[:, c] if A.shape[1] > 1 else A[:, 0]      # [B, N]
        s_p = masked_fill(Ac, mask) if mask is not None else Ac
        s_n = masked_fill(-Ac, mask) if mask is not None else -Ac
        _, idx_p = jax.lax.top_k(s_p, k)
        _, idx_n = jax.lax.top_k(s_n, k)
        v_p = (jnp.ones(idx_p.shape, bool) if mask is None
               else jnp.take_along_axis(mask, idx_p, axis=1))
        v_n = (jnp.ones(idx_n.shape, bool) if mask is None
               else jnp.take_along_axis(mask, idx_n, axis=1))
        logit_p = jnp.einsum("bkd,dt->bkt", gather_h(idx_p), wc[c]) + bc[c]
        logit_n = jnp.einsum("bkd,dt->bkt", gather_h(idx_n), wc[c]) + bc[c]
        losses_in.append(0.5 * (_binary_ce(logit_p, 1, v_p)
                                + _binary_ce(logit_n, 0, v_n)))
        losses_out.append(_binary_ce(logit_p, 0, v_p))
    in_l = jnp.stack(losses_in, axis=-1)                 # [B, C]
    out_l = jnp.stack(losses_out, axis=-1)
    total = jnp.sum(onehot * in_l, axis=-1)
    if subtyping:
        total = (total + jnp.sum((1 - onehot) * out_l, axis=-1)) / n_class
    if mask is not None:
        valid = mask.any(axis=1).astype(total.dtype)
        return jnp.sum(total * valid) / jnp.maximum(valid.sum(), 1.0)
    return jnp.mean(total)


def dsmil_is_fusable(params) -> bool:
    """True for the generic trainer's DSMIL build (nonlinear=False,
    passing_v=False — `Step3_WSI_classification.py:129-131`); the
    nonlinear/passing_v variants keep model.apply."""
    return set(params) == {"Dense_0", "Dense_1", "fcc_w", "fcc_b"}


def dsmil_eval_fused(params, feats, mask, chunk: int = 1024):
    """Fused DSMIL deterministic forward → the family's eval pair
    (masked-max instance logits, bag logits). Matches ``DSMIL.__call__``
    (`architecture/dsmil.py:62-98` semantics): instance GEMM + critical
    argmax in XLA, then the bag stream in one streaming kernel pass
    (ops/dsmil_pool.py)."""
    from acmil_tpu.ops.dsmil_pool import fused_dsmil_pool
    from acmil_tpu.ops.masked import masked_fill, masked_max

    if mask is None:
        mask = jnp.ones(feats.shape[:2], bool)
    d0, d1 = params["Dense_0"], params["Dense_1"]
    feats = feats.astype(d0["kernel"].dtype)
    inst = feats @ d0["kernel"] + d0["bias"]                 # [B, N, C]
    crit = jnp.argmax(masked_fill(inst, mask[:, :, None]), axis=1)
    x_crit = jax.vmap(lambda f, i: f[i])(feats, crit)        # [B, C, D]
    q_max = x_crit @ d1["kernel"] + d1["bias"]               # [B, C, Q]
    bag_feat, _ = fused_dsmil_pool(
        feats, mask, d1["kernel"], d1["bias"], q_max, chunk=chunk,
        interpret=jax.default_backend() != "tpu")
    b = feats.shape[0]
    bag_logits = bag_feat.reshape(b, -1) @ params["fcc_w"].T + params["fcc_b"]
    return masked_max(inst, mask, axis=1), bag_logits


def dtfd_is_fusable(params) -> bool:
    """True for the stock DTFD build (`models/dtfd.py::_dtfd`): plain
    bias-free DimReduction (n_res=0) + K=1 gated attention + exposed
    tier-1 classifier. Residual-block reductions keep model.apply."""
    dr = params.get("DimReduction_0", {})
    return ("AttentionGated_0" in params and "tier1_w" in params
            and set(dr) == {"Dense_0"})


def dtfd_apply_fused(params, feats, mask, *, num_group: int,
                     instance_per_group: int, distill: str = "MaxMinS",
                     rng=None, chunk: int = 1024):
    """Fused DTFD forward. Matches ``DTFD.__call__`` on the same param
    tree (reference two-tier protocol
    `Step3_WSI_classification_DTFD.py:61-160`, CAM trick
    `utils/utils.py:48`). NOT routed by default: measured 0.89-0.94x vs
    the plain XLA graph at every size up to N=262k (BENCH_NOTES r4) —
    see ``DTFD_FUSE_MIN_S``.

    The per-pseudo-bag gated-attention pooling runs the streaming Pallas
    kernel with an **identity first layer**: the dim-reduced features
    ``mid = relu(x @ W1)`` are computed once (they are needed anyway for
    the CAM per-patch logits and the distilled gathers), gathered per
    group, and fed to the kernel with ``w1 = I`` — ReLU is idempotent on
    the already-rectified ``mid``, so the kernel's internal
    ``h = relu(mid @ I)`` IS ``mid`` and the heavy ``[N,D]·[D,L]`` GEMM
    is not duplicated. This replaces the unfused graph's materialised
    ``att_feats`` + multi-pass masked softmax with one kernel pass per
    group (forward and backward each one pass over the gathered ``mid``).

    ``rng`` must be the flax-derived stkim key (:func:`derive_stkim_rng`)
    in training so pseudo-bag assignments match ``model.apply``
    bit-for-bit; ``None`` reproduces the model's deterministic eval
    grouping (fold of PRNGKey(0)).
    """
    from acmil_tpu.models.dtfd import _group_permutation
    from acmil_tpu.ops.attn_pool import gated_attn_pool_grad
    from acmil_tpu.ops.masked import masked_fill, masked_softmax

    b, n, _ = feats.shape
    g = num_group
    if mask is None:
        mask = jnp.ones((b, n), bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)   # deterministic eval grouping

    w1 = params["DimReduction_0"]["Dense_0"]["kernel"]
    ldim = w1.shape[1]
    mid = jnp.maximum(feats.astype(w1.dtype) @ w1, 0.0)      # [B, N, L]

    groups, gmask = _group_permutation(rng, mask, g)         # [B,G,S]
    s = groups.shape[-1]
    gfeat = jnp.take_along_axis(mid[:, None].repeat(g, 1),
                                groups[..., None], axis=2)   # [B,G,S,L]

    ag = params["AttentionGated_0"]
    eye = jnp.eye(ldim, dtype=w1.dtype)
    zb = jnp.zeros((ldim,), jnp.float32)
    bag, logits = gated_attn_pool_grad(
        gfeat.reshape(b * g, s, ldim), gmask.reshape(b * g, s), eye, zb,
        ag["Dense_0"]["kernel"], ag["Dense_0"]["bias"],
        ag["Dense_1"]["kernel"], ag["Dense_1"]["bias"],
        ag["Dense_2"]["kernel"], ag["Dense_2"]["bias"], chunk)
    pooled = bag.reshape(b, g, ldim)                         # [B,G,L]
    a = logits.reshape(b, g, s)                              # raw logits
    attn = masked_softmax(a, gmask)

    t_w, t_b = params["tier1_w"], params["tier1_b"]
    sub_preds = pooled @ t_w + t_b                           # [B,G,C]

    # CAM per-patch logits (no bias) → positive-class prob for ranking
    cam = (gfeat * attn[..., None]) @ t_w                    # [B,G,S,C]
    patch_prob = jax.nn.softmax(cam, axis=-1)[..., -1]       # [B,G,S]

    k = min(instance_per_group, s)
    _, top_idx = jax.lax.top_k(masked_fill(patch_prob, gmask), k)
    _, bot_idx = jax.lax.top_k(masked_fill(-patch_prob, gmask), k)

    def gather_feats(idx):
        return jnp.take_along_axis(gfeat, idx[..., None], axis=2)

    def gather_mask(idx):
        return jnp.take_along_axis(gmask, idx, axis=2)

    if distill == "MaxMinS":
        d_idx = jnp.concatenate([top_idx, bot_idx], axis=-1)
        d_feat = gather_feats(d_idx).reshape(b, g * 2 * k, -1)
        d_mask = gather_mask(d_idx).reshape(b, g * 2 * k)
    elif distill == "MaxS":
        d_feat = gather_feats(top_idx).reshape(b, g * k, -1)
        d_mask = gather_mask(top_idx).reshape(b, g * k)
    else:  # AFS
        d_feat = pooled
        d_mask = gmask.any(axis=-1)

    # tier-2 over stop-gradient distilled features (M ≈ G·2k — tiny)
    d_feat = jax.lax.stop_gradient(d_feat)
    ag2 = params["AttentionGated_1"]
    av = jnp.tanh(d_feat @ ag2["Dense_0"]["kernel"]
                  + ag2["Dense_0"]["bias"])
    au = jax.nn.sigmoid(d_feat @ ag2["Dense_1"]["kernel"]
                        + ag2["Dense_1"]["bias"])
    a2 = jnp.swapaxes((av * au) @ ag2["Dense_2"]["kernel"]
                      + ag2["Dense_2"]["bias"], -1, -2)      # [B,1,M]
    attn2 = masked_softmax(a2, d_mask[:, None, :])
    slide_feat = jnp.einsum("bkm,bml->bkl", attn2, d_feat)[:, 0]
    cls = params["Classifier1fc_0"]["Dense_0"]
    slide_preds = slide_feat @ cls["kernel"] + cls["bias"]

    return {
        "logits": slide_preds,
        "sub_preds": sub_preds,
        "group_valid": gmask.any(axis=-1),
        "attn": masked_fill(a, gmask),
    }


def clam_apply_fused(params, feats, mask, label=None,
                     instance_eval: bool = False, *, n_class: int,
                     k_sample: int = 8, subtyping: bool = False,
                     chunk: int = 1024):
    """Fused CLAM_SB/MB forward (eval always; train when dropout is off).

    Matches ``CLAM_SB/CLAM_MB.__call__`` on the same param tree
    (`architecture/clam.py:85,211`): pooling runs the one-pass kernel
    with CLAM's fc bias as ``b1``; MB's ``softmax_one`` normalisation
    (`clam.py:248`) runs :func:`gated_attn_pool_grad_one` (phantom-logit
    online softmax). The returned ``attn`` equals the model's raw
    attention logits at valid slots (padded slots carry the kernel's
    mask fill instead of garbage).

    The instance loss gathers ≤2·k_sample rows per class and recomputes
    their ``h`` — O(K·k), no [B, N, L] materialisation.
    """
    from acmil_tpu.ops.attn_pool import (gated_attn_pool_grad,
                                         gated_attn_pool_grad_one)
    from acmil_tpu.ops.masked import masked_softmax, softmax_one

    w1, b1h, v, bv, u, bu, w, bw = _clam_weights(params)
    feats = feats.astype(w1.dtype)
    multi_branch = "bag_w" in params
    pool = gated_attn_pool_grad_one if multi_branch else gated_attn_pool_grad
    M, logits_a = pool(feats, mask, w1, b1h, v, bv, u, bu, w, bw, chunk)
    if multi_branch:
        logits = jnp.einsum("bcd,cd->bc", M, params["bag_w"]) + params["bag_b"]
    else:
        cls = params["Dense_1"]
        logits = M[:, 0] @ cls["kernel"] + cls["bias"]

    out = {"logits": logits, "attn": logits_a, "bag_feat": M}
    if instance_eval:
        norm = softmax_one if multi_branch else masked_softmax
        A = norm(logits_a, None if mask is None else mask[:, None, :])
        out["instance_loss"] = _clam_instance_loss(
            params, feats, mask, label, A, w1, b1h, n_class=n_class,
            k_sample=k_sample, subtyping=subtyping)
    return out
