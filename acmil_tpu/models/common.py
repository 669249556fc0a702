"""Shared MIL building blocks (reference: `architecture/network.py`,
`architecture/transformer.py:239-266`).

All blocks are batched: bags are ``[B, N, D]`` with validity masks, unlike
the reference's ``x[0]`` unbatching (`transformer.py:307`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class Classifier1fc(nn.Module):
    """One-linear-layer classifier with optional dropout
    (`architecture/network.py:6`)."""

    n_classes: int
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.droprate > 0.0:
            x = nn.Dropout(self.droprate)(x, deterministic=deterministic)
        return nn.Dense(self.n_classes)(x)


class ResidualBlock(nn.Module):
    """Two bias-free linear+ReLU layers with a skip (`network.py:22`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.dim, use_bias=False)(x))
        h = nn.relu(nn.Dense(self.dim, use_bias=False)(h))
        return x + h


class DimReduction(nn.Module):
    """Bias-free linear + ReLU (+optional residual blocks)
    (`network.py:37`). Maps encoder features D_feat → D_inner."""

    dim: int
    n_res: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.dim, use_bias=False)(x))
        for _ in range(self.n_res):
            x = ResidualBlock(self.dim)(x)
        return x


class DimReduction1(nn.Module):
    """Residual-input variant: relu(x + fc(x)) (`network.py:61-83`)."""

    dim: int
    n_res: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x + nn.Dense(self.dim)(x))
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
        av = jnp.tanh(nn.Dense(self.dim)(x))       # [B, N, D]
        au = nn.sigmoid(nn.Dense(self.dim)(x))     # [B, N, D]
        a = nn.Dense(self.n_token)(av * au)        # [B, N, K]
        return jnp.swapaxes(a, -1, -2)             # [B, K, N]


class AttnNet(nn.Module):
    """Ungated attention scorer (CLAM's `Attn_Net`, `architecture/clam.py:17`)."""

    dim: int = 256
    n_token: int = 1
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = jnp.tanh(nn.Dense(self.dim)(x))
        if self.droprate > 0.0:
            h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        a = nn.Dense(self.n_token)(h)
        return jnp.swapaxes(a, -1, -2)


class AttnNetGated(nn.Module):
    """Gated attention scorer with dropout (CLAM's `Attn_Net_Gated`,
    `architecture/clam.py:46`)."""

    dim: int = 256
    n_token: int = 1
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        av = jnp.tanh(nn.Dense(self.dim)(x))
        au = nn.sigmoid(nn.Dense(self.dim)(x))
        if self.droprate > 0.0:
            av = nn.Dropout(self.droprate)(av, deterministic=deterministic)
            au = nn.Dropout(self.droprate)(au, deterministic=deterministic)
        a = nn.Dense(self.n_token)(av * au)
        return jnp.swapaxes(a, -1, -2)
