"""attmil — attention-MIL variants with a 1024→512 feature stem.

Reference: `architecture/attmil.py` (`AttentionGated:45`, `DAttention:100`;
the `Resnet:17` end-to-end variant lives with the encoders, see
`acmil_tpu.models.encoders`). These are the heads used for end-to-end
patch pipelines; the stem dims follow the config instead of the
reference's hardcoded 1024→512.
"""

from __future__ import annotations

import flax.linen as nn
from functools import partial as _partial

# reference `initialize_weights`: xavier_normal weights + zero biases
# (training dynamics are init-sensitive — see
# common.torch_linear_uniform_init and PARITY.md r3)
from acmil_tpu.models.common import torch_xavier_normal as _txn
XDense = _partial(nn.Dense, kernel_init=_txn)
import jax.numpy as jnp

from acmil_tpu.models import register_model
from acmil_tpu.ops.masked import masked_softmax


class DAttentionMIL(nn.Module):
    """Feature stem + (optionally gated) attention pooling + classifier
    (`attmil.py:100-143`)."""

    n_class: int
    d_stem: int = 512
    d_attn: int = 128
    gated: bool = False
    act: str = "relu"
    droprate: float = 0.25

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        h = XDense(self.d_stem)(feats)
        h = nn.gelu(h) if self.act == "gelu" else nn.relu(h)
        if self.droprate > 0:
            h = nn.Dropout(self.droprate)(h, deterministic=deterministic)

        if self.gated:
            a_t = jnp.tanh(XDense(self.d_attn, use_bias=False)(h)) \
                if self.act == "tanh" else nn.relu(XDense(self.d_attn, use_bias=False)(h))
            b_s = nn.sigmoid(XDense(self.d_attn, use_bias=False)(h))
            a = XDense(1, use_bias=False)(a_t * b_s)
        else:
            a = XDense(1)(jnp.tanh(XDense(self.d_attn)(h)))
        a = jnp.swapaxes(a, -1, -2)                              # [B,1,N]
        attn = masked_softmax(a, None if mask is None else mask[:, None, :])
        m = jnp.einsum("bkn,bnd->bkd", attn, h)[:, 0]
        logits = XDense(self.n_class)(m)
        if return_attn:
            return logits, a
        return logits


class ResnetE2EMIL(nn.Module):
    """End-to-end patch-pixel MIL: ResNet50 trunk → MLP stem → per-patch
    logits with masked-max pooling (`architecture/attmil.py:17-44`,
    ``Resnet``; dead code in the reference — only its __main__ smoke block
    constructs it). Consumes raw patch pixels ``[B, N, H, W, 3]``.

    Deliberate deltas: the 1-logit binary max head generalises to
    ``n_class``; BatchNorm runs with FROZEN statistics (trainable affine) —
    the standard frozen-BN finetuning mode — since the per-bag "batch" of
    patches is not i.i.d. and the engine keeps params-only state."""

    n_class: int
    droprate: float = 0.25

    @nn.compact
    def __call__(self, patches, mask=None, deterministic: bool = True):
        from acmil_tpu.models.encoders.resnet import resnet50
        from acmil_tpu.ops.masked import masked_max

        b, n = patches.shape[:2]
        feats = resnet50()(patches.reshape((b * n,) + patches.shape[2:]))
        feats = feats.reshape(b, n, -1)
        h = nn.relu(XDense(4096)(feats))
        h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        h = nn.relu(XDense(512)(h))
        h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        logits = XDense(self.n_class)(h)                      # [B, N, C]
        return masked_max(logits, mask, axis=1)


@register_model("attmil")
def _attmil(conf):
    return DAttentionMIL(n_class=conf.n_class)


@register_model("attmil_gated")
def _attmil_gated(conf):
    return DAttentionMIL(n_class=conf.n_class, gated=True)
