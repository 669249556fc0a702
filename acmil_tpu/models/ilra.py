"""ILRA — low-rank attention MIL (ICLR'23).

Reference: `architecture/ilra.py` (`MultiHeadAttention:25`, `GAB:67`,
`NLP:94`, `ILRA:112`). GAB blocks route the bag through a tiny learned
latent (num_inds tokens): forward-project bag → latent, backward-project
latent → bag — O(N·r) instead of O(N²). NLP pools with learned seed
queries.

The reference leans on ``nn.MultiheadAttention``; here attention is an
explicit masked einsum (bag-side keys respect the validity mask; latent
tokens are always valid). Gating (SiLU of the query input) matches
``gated=True`` (`ilra.py:43-45,62`).
"""

from __future__ import annotations

import flax.linen as nn
from functools import partial as _partial

# reference `initialize_weights`: xavier_normal weights + zero biases
# (training dynamics are init-sensitive — see
# common.torch_linear_uniform_init and PARITY.md r3)
from acmil_tpu.models.common import torch_xavier_normal as _txn
XDense = _partial(nn.Dense, kernel_init=_txn)
import jax
import jax.numpy as jnp

from acmil_tpu.models import register_model
from acmil_tpu.ops.masked import masked_softmax


def _torch_xavier_uniform_nd(shape):
    """torch `xavier_uniform_` fans for an n-D tensor: fan_in =
    shape[1]*prod(shape[2:]), fan_out = shape[0]*prod(shape[2:]) — the
    reference applies it directly to the 3-D latent/seed tensors
    (`ilra.py:76,103`); flax's default in/out axes would compute fans
    ~num_inds*dim too small (r3 init audit)."""
    import numpy as _np

    rf = int(_np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in, fan_out = shape[1] * rf, shape[0] * rf
    bound = float(_np.sqrt(6.0 / (fan_in + fan_out)))

    def init(key, s, dtype=jnp.float32):
        return jax.random.uniform(key, s, dtype, -bound, bound)

    return init


class _MHA(nn.Module):
    """Pre-projection MHA with residual, LN, relu-FFN residual, optional
    gate — `ilra.py:25-64`. The reference composes TWO projections on each
    stream: its own fc_q/fc_k/fc_v followed by ``nn.MultiheadAttention``'s
    fused in-projection; the residual adds the fc_q output (NOT the
    in-projected query), so both projection stages are kept."""

    dim_v: int
    num_heads: int
    ln: bool = True
    gated: bool = False

    @nn.compact
    def __call__(self, q_in, k_in, key_mask=None):
        h = self.num_heads
        dh = self.dim_v // h
        B, Nq, _ = q_in.shape
        Nk = k_in.shape[1]

        q0 = XDense(self.dim_v)(q_in)                 # fc_q (residual src)
        k0 = XDense(self.dim_v)(k_in)                 # fc_k
        v0 = XDense(self.dim_v)(k_in)                 # fc_v
        # nn.MultiheadAttention's own in-projections
        q = XDense(self.dim_v)(q0)
        k = XDense(self.dim_v)(k0)
        v = XDense(self.dim_v)(v0)

        def split(t, n):
            return t.reshape(B, n, h, dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q, Nq), split(k, Nk))
        logits = logits / jnp.sqrt(jnp.asarray(dh, q.dtype))
        m = None if key_mask is None else key_mask[:, None, None, :]
        attn = masked_softmax(logits, m)
        a = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v, Nk))
        a = a.transpose(0, 2, 1, 3).reshape(B, Nq, self.dim_v)
        a = XDense(self.dim_v)(a)                     # out_proj

        o = q0 + a
        if self.ln:
            o = nn.LayerNorm()(o)
        o = o + nn.relu(XDense(self.dim_v)(o))        # fc_o
        if self.ln:
            o = nn.LayerNorm()(o)
        if self.gated:
            o = o * nn.silu(XDense(self.dim_v)(q_in))
        return o


class GAB(nn.Module):
    """Low-rank global attention block (`ilra.py:67-92`)."""

    dim_out: int
    num_heads: int
    num_inds: int
    ln: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        B = x.shape[0]
        latent = self.param(
            "latent",
            _torch_xavier_uniform_nd((1, self.num_inds, self.dim_out)),
            (1, self.num_inds, self.dim_out))
        latent = jnp.broadcast_to(latent, (B, self.num_inds, self.dim_out))
        h = _MHA(self.dim_out, self.num_heads, self.ln, gated=True)(
            latent, x, mask)                     # bag -> latent
        x_hat = _MHA(self.dim_out, self.num_heads, self.ln, gated=True)(
            x, h, None)                          # latent -> bag
        return x_hat


class NLP(nn.Module):
    """Non-local pooling with learned seeds (`ilra.py:94-107`)."""

    dim: int
    num_heads: int
    num_seeds: int
    ln: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        B = x.shape[0]
        s = self.param(
            "seeds", _torch_xavier_uniform_nd((1, self.num_seeds, self.dim)),
            (1, self.num_seeds, self.dim))
        s = jnp.broadcast_to(s, (B, self.num_seeds, self.dim))
        return _MHA(self.dim, self.num_heads, self.ln)(s, x, mask)


class ILRA(nn.Module):
    n_class: int
    num_layers: int = 2
    hidden_feat: int = 256
    num_heads: int = 8
    topk: int = 1
    ln: bool = True

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True):
        x = feats
        for i in range(self.num_layers):
            # after the first block the bag lives in hidden_feat dims; the
            # mask still marks which rows are real
            x = GAB(self.hidden_feat, self.num_heads, self.topk, self.ln)(
                x, mask)
        pooled = NLP(self.hidden_feat, self.num_heads, self.topk, self.ln)(
            x, mask)                              # [B, topk, H]
        logits = XDense(self.n_class)(pooled[:, 0])
        return logits


@register_model("ilra")
def _ilra(conf):
    return ILRA(n_class=conf.n_class)
