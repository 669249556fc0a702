"""ABMIL, MHA and ACMIL (GA + MHA variants) — the flagship heads.

Reference: `architecture/transformer.py` — `ABMIL:270`, `MHA:86`,
`ACMIL_GA:291`, `ACMIL_MHA:50`, `MutiHeadAttention:107`,
`MutiHeadAttention_modify:187`, STKIM at `:311-320`/`:164-174`.

TPU-first differences:
- fully batched over ``[B, N_pad, D]`` bags with validity masks (the
  reference unbatches with ``x[0]``);
- STKIM's topk→argsort→scatter becomes the fixed-shape rank formulation in
  :func:`acmil_tpu.ops.masked.stkim_mask`;
- the K per-token sub-attention modules of ACMIL_MHA (each with its own
  q/k/v projections) are a single vmapped module with a stacked-K parameter
  axis — one einsum instead of a Python loop, so the MXU sees one big
  matmul.

Call convention (all heads in this package):
``model(feats [B,N,D], mask [B,N] | None, deterministic=True)``.
RNG streams: ``stkim`` (instance masking), ``dropout``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acmil_tpu.models.common import (AttentionGated, Classifier1fc,
                                     DimReduction,
                                     torch_linear_uniform_init)
from acmil_tpu.ops.masked import masked_softmax, stkim_mask


class ABMIL(nn.Module):
    """Gated-attention pooling baseline (`transformer.py:270-287`)."""

    n_class: int
    d_inner: int = 128
    d_attn: int = 128
    droprate: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        x = DimReduction(self.d_inner)(feats)                 # [B, N, L]
        a = AttentionGated(self.d_attn, 1)(x)                 # [B, 1, N]
        attn = masked_softmax(a, None if mask is None else mask[:, None, :])
        afeat = jnp.einsum("bkn,bnd->bkd", attn, x)[:, 0]     # [B, L]
        logits = Classifier1fc(self.n_class, self.droprate)(afeat, deterministic)
        if return_attn:
            return logits, a
        return logits


class ACMIL_GA(nn.Module):
    """Multi-branch gated attention with STKIM (`transformer.py:291-354`).

    Returns ``(sub_preds [B,K,C], slide_preds [B,C], attn_logits [B,K,N])``
    where ``attn_logits`` are post-STKIM raw logits (the reference's
    ``A_out``) used by the diversity loss and heatmaps.
    """

    n_class: int
    d_inner: int = 128
    d_attn: int = 128
    n_token: int = 1
    n_masked_patch: int = 0
    mask_drop: float = 0.0
    droprate: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 use_attention_mask: Optional[bool] = None,
                 return_bag_feat: bool = False):
        x = DimReduction(self.d_inner)(feats)                 # [B, N, L]
        a = AttentionGated(self.d_attn, self.n_token)(x)      # [B, K, N]

        apply_stkim = (not deterministic) if use_attention_mask is None else use_attention_mask
        if self.n_masked_patch > 0 and apply_stkim:
            rng = self.make_rng("stkim")
            a = stkim_mask(rng, a, self.n_masked_patch, self.mask_drop,
                           None if mask is None else mask[:, None, :])

        m = None if mask is None else mask[:, None, :]
        attn = masked_softmax(a, m)                           # [B, K, N]
        branch_feat = jnp.einsum("bkn,bnd->bkd", attn, x)     # [B, K, L]

        # Per-branch classifiers: stacked params, one einsum.
        t_init = torch_linear_uniform_init(self.d_inner ** -0.5)
        w = self.param("branch_w", t_init,
                       (self.n_token, self.d_inner, self.n_class))
        b = self.param("branch_b", t_init, (self.n_token, self.n_class))
        sub_preds = jnp.einsum("bkl,klc->bkc", branch_feat, w) + b

        # slide pooling reuses the SAME branch softmax, mean over branches
        # (`transformer.py:328`: bag_A = softmax(A_out).mean(0))
        bag_attn = attn.mean(axis=1, keepdims=True)           # [B, 1, N]
        bag_feat = jnp.einsum("bkn,bnd->bkd", bag_attn, x)[:, 0]
        if return_bag_feat:
            return bag_feat
        slide_preds = Classifier1fc(self.n_class, self.droprate)(bag_feat, deterministic)
        return sub_preds, slide_preds, a

    def forward_feature(self, feats, mask=None, use_attention_mask: bool = False):
        """Pooled bag feature ``[B, L]`` for IBMIL-style downstream use
        (`transformer.py:332-354`: bag_A = softmax(A_out).mean(0), bag_feat
        = bag_A @ x).

        Fixes the reference's Step4 kwarg mismatch (SURVEY §2.1: Step4 calls
        ``net(feat, use_attention_mask=False)`` which `forward` doesn't
        accept) — here both paths accept the flag.
        """
        return self(feats, mask, deterministic=not use_attention_mask,
                    use_attention_mask=use_attention_mask,
                    return_bag_feat=True)


class MultiHeadAttention(nn.Module):
    """Q/K/V multi-head cross-attention with optional STKIM inside the
    logits (`transformer.py:107-236`). Queries are few (1..K tokens); keys
    and values are the bag."""

    dim: int
    num_heads: int = 8
    downsample_rate: int = 1
    droprate: float = 0.1
    n_masked_patch: int = 0
    mask_drop: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True,
                 use_attention_mask: bool = False):
        d_int = self.dim // self.downsample_rate
        h = self.num_heads
        dh = d_int // h
        B = k.shape[0]

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, dh).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(d_int)(q))                        # [B, H, Q, dh]
        kh = split(nn.Dense(d_int)(k))                        # [B, H, N, dh]
        vh = split(nn.Dense(d_int)(v))
        logits = jnp.einsum("bhqd,bhnd->bhqn", qh, kh) / jnp.sqrt(dh).astype(q.dtype)

        m = None if mask is None else mask[:, None, None, :]
        if self.n_masked_patch > 0 and use_attention_mask:
            rng = self.make_rng("stkim")
            logits = stkim_mask(rng, logits, self.n_masked_patch, self.mask_drop, m)

        attn = masked_softmax(logits, m)                      # [B, H, Q, N]
        out = jnp.einsum("bhqn,bhnd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, q.shape[1], d_int)
        out = nn.Dense(self.dim)(out)
        out = nn.Dropout(self.droprate)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-6)(out)
        return out, logits


class BagAttention(nn.Module):
    """Value-only head that pools the bag with externally supplied attention
    (`MutiHeadAttention_modify`, `transformer.py:187-236`)."""

    dim: int
    num_heads: int = 8
    droprate: float = 0.1

    @nn.compact
    def __call__(self, v, attn, deterministic: bool = True):
        h = self.num_heads
        dh = self.dim // h
        B, N, _ = v.shape
        vh = nn.Dense(self.dim)(v).reshape(B, N, h, dh).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhqn,bhnd->bhqd", attn, vh)         # [B, H, 1, dh]
        out = out.transpose(0, 2, 1, 3).reshape(B, attn.shape[2], self.dim)
        out = nn.Dense(self.dim)(out)
        out = nn.Dropout(self.droprate)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-6)(out)
        return out[:, 0]


class MHA(nn.Module):
    """Single learned-query multi-head attention baseline
    (`transformer.py:86-105`)."""

    n_class: int
    d_inner: int = 128
    num_heads: int = 8

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True):
        x = DimReduction(self.d_inner)(feats)
        q = self.param("q", nn.initializers.normal(1e-6), (1, 1, self.d_inner))
        q = jnp.broadcast_to(q, (x.shape[0], 1, self.d_inner))
        out, _ = MultiHeadAttention(self.d_inner, self.num_heads)(
            q, x, x, mask, deterministic)
        return Classifier1fc(self.n_class)(out[:, 0], deterministic)


class ACMIL_MHA(nn.Module):
    """ACMIL with K learned-query cross-attention branches
    (`transformer.py:50-84`).

    Each reference branch is an independent `MutiHeadAttention` module; here
    the K modules are one ``nn.vmap``-stacked module (params get a leading K
    axis) evaluated in a single pass.

    Returns ``(sub_preds [B,K,C], slide_preds [B,C], attn [B,H,K,N])`` —
    attention logits per head, matching the reference's ``attns`` layout
    (heads kept for the diversity loss, which averages over them).
    """

    n_class: int
    d_inner: int = 128
    n_token: int = 1
    num_heads: int = 8
    n_masked_patch: int = 0
    mask_drop: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 use_attention_mask: Optional[bool] = None):
        x = DimReduction(self.d_inner)(feats)                 # [B, N, L]
        B = x.shape[0]
        K = self.n_token
        q = self.param("q", nn.initializers.normal(1e-6), (1, K, self.d_inner))

        apply_stkim = (not deterministic) if use_attention_mask is None else use_attention_mask

        VmappedMHA = nn.vmap(
            MultiHeadAttention,
            in_axes=(1, None, None, None, None, None),
            out_axes=(1, 1),
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "stkim": True},
        )
        qk = jnp.broadcast_to(q, (B, K, self.d_inner))[:, :, None, :]  # [B, K, 1, L]
        feat_k, attn_k = VmappedMHA(
            self.d_inner, self.num_heads,
            n_masked_patch=self.n_masked_patch, mask_drop=self.mask_drop,
        )(qk, x, x, mask, deterministic, apply_stkim and self.n_masked_patch > 0)
        # feat_k: [B, K, 1, L]; attn_k: [B, K, H, 1, N]
        feat_k = feat_k[:, :, 0, :]
        attn = attn_k[:, :, :, 0, :].transpose(0, 2, 1, 3)     # [B, H, K, N]

        t_init = torch_linear_uniform_init(self.d_inner ** -0.5)
        w = self.param("branch_w", t_init, (K, self.d_inner, self.n_class))
        b = self.param("branch_b", t_init, (K, self.n_class))
        sub_preds = jnp.einsum("bkl,klc->bkc", feat_k, w) + b

        m = None if mask is None else mask[:, None, None, :]
        bag_attn = masked_softmax(attn, m).mean(axis=2, keepdims=True)  # [B, H, 1, N]
        bag_feat = BagAttention(self.d_inner, self.num_heads)(x, bag_attn, deterministic)
        slide_preds = Classifier1fc(self.n_class)(bag_feat, deterministic)
        return sub_preds, slide_preds, attn
