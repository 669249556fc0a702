"""Positional embeddings for bag transformers.

Reference: `modules/emb_position.py` — `PPEG:5` (pad-to-square pyramid
depthwise convs; the grid version lives in
:class:`acmil_tpu.models.transmil.PPEG`), `PEG:41` (single depthwise
conv), `SINCOS:66` (2-D sin-cos grid embedding). These are the pluggable
``pos`` options of SAttention (`modules/satten.py:40-48`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from acmil_tpu.models.common import torch_linear_uniform_init


class PEG(nn.Module):
    """Single depthwise-conv positional encoding over the grid view
    (`emb_position.py:41`)."""

    dim: int
    k: int = 7

    @nn.compact
    def __call__(self, x, grid_h: int, grid_w: int):
        b, n, c = x.shape
        img = x.transpose(0, 2, 1).reshape(b, c, grid_h, grid_w)
        # grouped Conv2d(k, groups=dim, bias=True) with torch defaults
        # (fan_in = k*k); the reference PEG keeps its conv bias
        # (`emb_position.py:44`)
        c_init = torch_linear_uniform_init(1.0 / self.k)
        w = self.param("proj", c_init, (c, 1, self.k, self.k))
        bias = self.param("proj_b", c_init, (c,))
        pad = self.k // 2
        out = jax.lax.conv_general_dilated(
            img, w.astype(img.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)
        out = out + bias[None, :, None, None].astype(out.dtype)
        return x + out.reshape(b, c, n).transpose(0, 2, 1)


def sincos_2d(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """2-D sin-cos table (`SINCOS`, `emb_position.py:66-141`)."""
    def one_dim(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (dim / 2))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # (w, h) order like the reference
    emb_h = one_dim(embed_dim // 2, np.stack(grid)[1])
    emb_w = one_dim(embed_dim // 2, np.stack(grid)[0])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class SINCOS(nn.Module):
    """Fixed 2-D sin-cos positional embedding."""

    dim: int

    @nn.compact
    def __call__(self, x, grid_h: int, grid_w: int):
        table = jnp.asarray(sincos_2d(self.dim, grid_h, grid_w))
        return x + table[None, : x.shape[1]].astype(x.dtype)
