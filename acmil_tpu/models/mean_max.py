"""Mean / Max pooling MIL baselines.

Reference: `modules/mean_max.py:14,39` (conf-driven, used by the generic
Step3 trainer) and `architecture/mean_max.py` (hardcoded-dim variants).
Masked: mean counts only valid patches; max ignores pads.
"""

from __future__ import annotations

import flax.linen as nn
from functools import partial as _partial

# reference `initialize_weights`: xavier_normal weights + zero biases
# (training dynamics are init-sensitive — see
# common.torch_linear_uniform_init and PARITY.md r3)
from acmil_tpu.models.common import torch_xavier_normal as _txn
XDense = _partial(nn.Dense, kernel_init=_txn)

from acmil_tpu.models import register_model
from acmil_tpu.ops.masked import masked_max, masked_mean


class _PoolMIL(nn.Module):
    n_class: int
    d_inner: int = 128
    droprate: float = 0.25
    act: str = "relu"
    pool: str = "mean"

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True):
        h = XDense(self.d_inner)(feats)
        h = nn.gelu(h) if self.act == "gelu" else nn.relu(h)
        if self.droprate > 0:
            h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        h = XDense(self.n_class)(h)                           # [B, N, C]
        if self.pool == "mean":
            return masked_mean(h, mask, axis=1)
        return masked_max(h, mask, axis=1)


class MeanMIL(_PoolMIL):
    pool: str = "mean"


class MaxMIL(_PoolMIL):
    pool: str = "max"


@register_model("meanmil")
def _mean(conf):
    return MeanMIL(n_class=conf.n_class, d_inner=conf.D_inner)


@register_model("maxmil")
def _max(conf):
    return MaxMIL(n_class=conf.n_class, d_inner=conf.D_inner)
