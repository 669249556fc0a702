"""Shared MIL building blocks (reference: `architecture/network.py`,
`architecture/transformer.py:239-266`).

All blocks are batched: bags are ``[B, N, D]`` with validity masks, unlike
the reference's ``x[0]`` unbatching (`transformer.py:307`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_uniform_init(bound: float):
    """``U(±bound)`` — with ``bound = 1/sqrt(fan_in)`` this is torch
    ``nn.Linear``'s DEFAULT init for both weight (kaiming_uniform with
    a=√5) and bias. Reference training dynamics are init-sensitive:
    under flax's default (lecun-normal kernel, zero bias) DTFD's
    two-tier recipe converges ~4x slower and plateaus lower (r3
    head-to-head, torch-init probe) — matching init matches
    convergence."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """``nn.Dense`` with torch ``nn.Linear``'s default init (see
    :func:`torch_linear_uniform_init`). Named ``Dense`` so flax
    auto-naming keeps the exact ``Dense_N`` scope paths of the stock
    module — converters, checkpoints, and the fused-kernel weight
    extractors are unaffected."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        init = torch_linear_uniform_init(1.0 / np.sqrt(fan_in))
        kernel = self.param("kernel", init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            y = y + self.param("bias", init, (self.features,))
        return y


class Classifier1fc(nn.Module):
    """One-linear-layer classifier with optional dropout
    (`architecture/network.py:6`)."""

    n_classes: int
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.droprate > 0.0:
            x = nn.Dropout(self.droprate)(x, deterministic=deterministic)
        return Dense(self.n_classes)(x)


class ResidualBlock(nn.Module):
    """Two bias-free linear+ReLU layers with a skip (`network.py:22`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(Dense(self.dim, use_bias=False)(x))
        h = nn.relu(Dense(self.dim, use_bias=False)(h))
        return x + h


class DimReduction(nn.Module):
    """Bias-free linear + ReLU (+optional residual blocks)
    (`network.py:37`). Maps encoder features D_feat → D_inner."""

    dim: int
    n_res: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(Dense(self.dim, use_bias=False)(x))
        for _ in range(self.n_res):
            x = ResidualBlock(self.dim)(x)
        return x


class DimReduction1(nn.Module):
    """Residual-input variant: relu(x + fc(x)) (`network.py:61-83`)."""

    dim: int
    n_res: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x + Dense(self.dim)(x))
        for _ in range(self.n_res):
            h = ResidualBlock(self.dim)(h)
        return h


class AttentionGated(nn.Module):
    """Ilse-style gated attention scorer (`transformer.py:239-266`).

    Input ``[B, N, L]`` → attention logits ``[B, K, N]``. The tanh/sigmoid
    gate is elementwise (VPU) between two D-dim projections (MXU); XLA fuses
    the gate into the surrounding matmuls.
    """

    dim: int = 128    # D, the attention hidden dim
    n_token: int = 1  # K branches

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        av = jnp.tanh(Dense(self.dim)(x))         # [B, N, D]
        au = nn.sigmoid(Dense(self.dim)(x))       # [B, N, D]
        a = Dense(self.n_token)(av * au)          # [B, N, K]
        return jnp.swapaxes(a, -1, -2)             # [B, K, N]


def torch_xavier_normal(key, shape, dtype=jnp.float32):
    """torch ``xavier_normal_`` for 2-D kernels [in, out]: a FULL normal
    with std sqrt(2/(fan_in+fan_out)). flax's ``xavier_normal`` is a
    truncated normal (no tails beyond 2 sigma) — close but not the
    reference's distribution."""
    std = float(np.sqrt(2.0 / (shape[0] + shape[1])))
    return std * jax.random.normal(key, shape, dtype)


# CLAM's reference applies `initialize_weights` (xavier_normal + zero
# bias, `utils/utils.py:519`) — not torch Linear defaults — so its
# attention nets keep flax Dense with xavier kernels.
def _xavier_dense(features):
    return nn.Dense(features, kernel_init=torch_xavier_normal)


class AttnNet(nn.Module):
    """Ungated attention scorer (CLAM's `Attn_Net`, `architecture/clam.py:17`)."""

    dim: int = 256
    n_token: int = 1
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = jnp.tanh(_xavier_dense(self.dim)(x))
        if self.droprate > 0.0:
            h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        a = _xavier_dense(self.n_token)(h)
        return jnp.swapaxes(a, -1, -2)


class AttnNetGated(nn.Module):
    """Gated attention scorer with dropout (CLAM's `Attn_Net_Gated`,
    `architecture/clam.py:46`)."""

    dim: int = 256
    n_token: int = 1
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        av = jnp.tanh(_xavier_dense(self.dim)(x))
        au = nn.sigmoid(_xavier_dense(self.dim)(x))
        if self.droprate > 0.0:
            av = nn.Dropout(self.droprate)(av, deterministic=deterministic)
            au = nn.Dropout(self.droprate)(au, deterministic=deterministic)
        a = _xavier_dense(self.n_token)(av * au)
        return jnp.swapaxes(a, -1, -2)


class MlpHead(nn.Module):
    """Two-layer MLP head (`modules/mlp.py:2-21`)."""

    hid_dim: int = 512
    out_dim: int = 1
    bn: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        x = Dense(self.hid_dim)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=deterministic)(x)
        x = nn.relu(x)
        x = Dense(self.out_dim)(x)
        return x.reshape(*shape[:-1], self.out_dim)


class MlpHeadDINO(nn.Module):
    """DINO projection head (`modules/mlp.py:22-52`): n-layer GELU MLP to a
    bottleneck, L2-normalise, then a weight-normed bias-free last layer
    with g frozen at 1 when ``norm_last_layer`` (direction-only output)."""

    out_dim: int
    nlayers: int = 2
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    use_bn: bool = False
    norm_last_layer: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nlayers = max(self.nlayers, 1)
        if nlayers == 1:
            x = nn.Dense(self.bottleneck_dim)(x)
        else:
            x = nn.Dense(self.hidden_dim)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=deterministic)(x)
            x = nn.gelu(x, approximate=False)
            for _ in range(nlayers - 2):
                x = nn.Dense(self.hidden_dim)(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=deterministic)(x)
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim)(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        # weight_norm(Linear(bias=False)): W = g * V / ||V||_row
        v = self.param("last_v", nn.initializers.lecun_normal(),
                       (self.bottleneck_dim, self.out_dim))
        g = self.param("last_g", nn.initializers.ones, (self.out_dim,))
        if self.norm_last_layer:
            g = jax.lax.stop_gradient(g)
        w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12) * g
        return x @ w
