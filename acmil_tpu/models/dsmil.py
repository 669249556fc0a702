"""DSMIL — dual-stream MIL (reference `architecture/dsmil.py`).

Instance stream: per-patch linear classifier (`IClassifier`, dsmil.py:25).
Bag stream (`BClassifier`, dsmil.py:38): for each class, the critical
(max-score) instance's query attends over all instance queries; attention-
weighted values form per-class bag features, fused by a Conv1d(C→C,
kernel=D) — which is just a dense map from [C, D] to [C], implemented here
as one einsum.

Masking: critical-instance argmax and the attention softmax over patches
respect the bag validity mask; padded rows carry NEG_INF scores so they
are never critical (reference softmax at dsmil.py:80 is over N after the
[N,C]→[C,N] transpose).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from acmil_tpu.models import register_model
from acmil_tpu.models.common import Dense as TDense
from acmil_tpu.models.common import torch_linear_uniform_init
from acmil_tpu.ops.masked import masked_fill, masked_softmax


class DSMIL(nn.Module):
    n_class: int
    d_feat: int
    d_inner: int = 128
    d_query: int = 128
    nonlinear: bool = True
    passing_v: bool = False
    dropout_v: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True):
        B, N, D = feats.shape
        # instance stream (FCLayer/IClassifier)
        inst_logits = TDense(self.n_class)(feats)             # [B, N, C]

        # bag stream
        if self.nonlinear:
            q = jnp.tanh(TDense(self.d_query)(
                nn.relu(TDense(self.d_inner)(feats))))        # [B, N, Q]
        else:
            q = TDense(self.d_inner)(feats)
        if self.passing_v:
            v = nn.relu(TDense(D)(
                nn.Dropout(self.dropout_v)(feats, deterministic=deterministic)))
        else:
            v = feats

        # critical instances: argmax over valid patches per class
        scores = inst_logits
        if mask is not None:
            scores = masked_fill(scores, mask[:, :, None])
        crit_idx = jnp.argmax(scores, axis=1)                   # [B, C]
        q_max = jnp.take_along_axis(q, crit_idx[..., None], axis=1)  # [B, C, Q]

        a = jnp.einsum("bnq,bcq->bcn", q, q_max) / jnp.sqrt(
            jnp.asarray(q.shape[-1], feats.dtype))              # [B, C, N]
        A = masked_softmax(a, None if mask is None else mask[:, None, :])
        bag_feat = jnp.einsum("bcn,bnd->bcd", A, v)             # [B, C, D]

        # Conv1d(C, C, kernel_size=D) == dense [C*D] -> [C]
        fan_in = self.n_class * v.shape[-1]
        t_init = torch_linear_uniform_init(fan_in ** -0.5)  # Conv1d default
        w = self.param("fcc_w", t_init, (self.n_class, fan_in))
        b = self.param("fcc_b", t_init, (self.n_class,))
        bag_logits = bag_feat.reshape(B, -1) @ w.T + b          # [B, C]

        return inst_logits, bag_logits, a


@register_model("dsmil", family="dsmil")
def _dsmil(conf):
    # generic trainer builds BClassifier(nonlinear=False)
    # (Step3_WSI_classification.py:129-131)
    return DSMIL(n_class=conf.n_class, d_feat=conf.D_feat,
                 d_inner=conf.D_inner, nonlinear=False)
