"""LBMIL — closed-form attention derived from the classifier weights.

Reference: `architecture/lbmil.py:8-40` (`AttentionLayer:8`, `LBMIL:25`):
per-patch class logits through the bag classifier's own weights; patch
attention α_i ∝ Σ_c exp(logit_ic − max); the ``N·α``-scaled context mean
collapses to the α-weighted feature sum, classified by the same weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from acmil_tpu.models import register_model
from acmil_tpu.models.common import torch_linear_uniform_init
from acmil_tpu.models.common import DimReduction


class LBMIL(nn.Module):
    n_class: int
    d_inner: int = 128

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        x = DimReduction(self.d_inner)(feats)                    # [B,N,L]
        t_init = torch_linear_uniform_init(self.d_inner ** -0.5)
        w = self.param("cls_w", t_init, (self.d_inner, self.n_class))
        b = self.param("cls_b", t_init, (self.n_class,))

        out_c = x @ w + b                                        # [B,N,C]
        m = mask[..., None] if mask is not None else None
        # finite fill (not -inf): a fully-masked batch row (mesh loaders
        # pad ragged batches with all-False-mask rows) would give
        # gmax=-inf and -inf - -inf = NaN, poisoning the whole batch loss
        # even at loss weight 0
        out_m = jnp.where(m, out_c, -1e30) if m is not None else out_c
        gmax = jnp.max(out_m, axis=(1, 2), keepdims=True)
        score = jnp.exp(out_m - gmax).sum(axis=-1)               # [B,N]; pads → 0
        alpha = score / jnp.maximum(score.sum(axis=1, keepdims=True), 1e-12)
        bag = jnp.einsum("bn,bnl->bl", alpha, x)                 # [B,L]
        logits = bag @ w + b
        if return_attn:
            return logits, alpha[:, None, :]
        return logits


@register_model("lbmil")
def _lbmil(conf):
    return LBMIL(n_class=conf.n_class, d_inner=conf.D_inner)
