"""Vision Transformer patch encoders (flax).

Covers the reference's ViT encoders (`models.py:138-150,191-206`):
DINO ViT-S/16 (Lunit pathology SSL, 384-d), timm ViT-B/16 (768-d), and the
CLIP ViT-L/336 variant (`path-clip-L-336`, 1024-d trunk with a projection).
Layout matches timm/DINO so torch checkpoints convert 1:1
(:mod:`acmil_tpu.models.encoders.convert`).

TPU notes: patch embedding is a conv that XLA lowers to one MXU matmul;
bf16 activations with f32 layernorm statistics. Attention has three
implementations: plain ``jnp.einsum`` (training/default), a fused Pallas
MHA (``attn_impl='fused'``, ops/vit_attn.py), and — for trunks whose
whole layer fits VMEM (ViT-S) — the layer-fused inference path
``encoders.fast.vit_encode`` over ops/vit_layer.py, which is what the
Step2 extraction engine uses (11.5k patches/s/chip vs 6.1k unfused,
BENCH_NOTES.md).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def mlp_act(x, act: str, approx_gelu: bool = False):
    """The one activation dispatch every ViT MLP path shares:
    'gelu' | 'quick_gelu' (OpenAI CLIP) | 'swiglu' (timm SwiGLUPacked
    layout — vit_giant_patch14_dinov2, the GigaPath tile encoder: fc1
    emits 2x the true hidden width, gate = silu(first half) * second
    half). ``approx_gelu`` selects tanh-approx gelu (bf16 inference —
    exact gelu's erf runs on the VPU, see BENCH_NOTES r3)."""
    if act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if act == "swiglu":
        a, b = jnp.split(x, 2, axis=-1)
        return jax.nn.silu(a) * b
    return jax.nn.gelu(x, approximate=approx_gelu)


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32
    act: str = "gelu"   # see mlp_act

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = mlp_act(x, self.act)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class SelfAttention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True  # False: inference-only bf16 softmax (~13% faster)
    attn_impl: str = "einsum"  # 'einsum' | 'fused' (Pallas, f32 softmax in VMEM)

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        dh = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        if self.attn_impl == "fused":
            # packed-layout fused MHA: consumes qkv token-major straight
            # from the Dense and emits token-major output for proj — no
            # [B,H,N,dh] relayouts cross HBM and the score tensor stays in
            # VMEM (ops/vit_attn_packed.py; f32 softmax in-kernel)
            from acmil_tpu.ops.vit_attn_packed import fused_mha_packed

            out = fused_mha_packed(qkv, self.heads).astype(self.dtype)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh).astype(
            self.dtype)
        if self.softmax_f32:
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        else:
            attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    act: str = "gelu"
    layerscale: bool = False   # DINOv2-style ls1/ls2 (UNI, GigaPath)
    ls_init: float = 1e-5
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x):
        y = SelfAttention(self.dim, self.heads, self.dtype,
                          self.softmax_f32, self.attn_impl, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        if self.layerscale:
            y = y * self.param("ls1", nn.initializers.constant(self.ls_init),
                               (self.dim,)).astype(y.dtype)
        x = x + y
        y = MlpBlock(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                     self.act, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        if self.layerscale:
            y = y * self.param("ls2", nn.initializers.constant(self.ls_init),
                               (self.dim,)).astype(y.dtype)
        return x + y


class ViT(nn.Module):
    """timm/DINO-layout ViT trunk; returns the cls-token feature."""

    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    img_size: int = 224
    mlp_ratio: float = 4.0
    proj_dim: Optional[int] = None   # CLIP-style output projection
    pre_norm: bool = False           # CLIP applies LN before the blocks
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    act: str = "gelu"
    layerscale: bool = False
    ls_init: float = 1e-5
    attn_impl: str = "einsum"

    @property
    def embed_dim(self) -> int:
        return self.proj_dim or self.dim

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] (NHWC, normalised)."""
        b = images.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(b, -1, self.dim)
        n_tok = x.shape[1] + 1
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tok, self.dim))
        x = x + pos.astype(x.dtype)
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-6, name="norm_pre")(x)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, self.mlp_ratio, self.dtype,
                         self.softmax_f32, self.act, self.layerscale,
                         self.ls_init, self.attn_impl, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        feat = x[:, 0]
        if self.proj_dim:
            feat = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                            name="proj_out")(feat)
        return feat
