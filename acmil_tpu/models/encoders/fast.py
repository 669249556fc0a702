"""Inference-path ViT encoder over fused Pallas layers.

Consumes a trained/converted :class:`~acmil_tpu.models.encoders.vit.ViT`
parameter tree directly (same pattern as ``models/fast.py`` for the MIL
heads) and runs patch-embed -> depth x transformer layer -> final
layernorm, giving the Step2 extraction engine
(`/root/reference/Step2_feature_extract.py:35-67`) the fastest compute
path available per trunk size:

1. whole-layer Pallas fusion (ops/vit_layer.py) — ViT-S class, weights
   fit VMEM; activations cross HBM twice per layer;
2. attention-half Pallas fusion (ops/vit_layer.py::fused_vit_attn_half)
   + XLA MLP half — ViT-B / UNI class: the qkv+proj weights fit VMEM,
   the MLP GEMMs are already at roofline in XLA (BENCH_NOTES);
3. packed-layout fused MHA (ops/vit_attn_packed.py) inside an otherwise
   XLA layer — CLIP-L / GigaPath class.

Every route supports gelu/quick_gelu/swiglu MLPs, DINOv2 layerscale,
CLIP pre-norm and output projection, so all reference encoders
(`models.py:191-206` + UNI/GigaPath) go through this one function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmil_tpu.models.encoders.vit import mlp_act
from acmil_tpu.ops.vit_layer import (LN_EPS, _ln_f32, _unfused_attn_half,
                                     attn_half_fits, fits_vmem,
                                     fused_vit_attn_half, fused_vit_layer)


def _block_weights(bp):
    return {
        "ln1": bp["norm1"], "ln2": bp["norm2"],
        "qkv": bp["attn"]["qkv"], "proj": bp["attn"]["proj"],
        "fc1": bp["mlp"]["Dense_0"], "fc2": bp["mlp"]["Dense_1"],
    }


def _mlp_half(x, bp, act: str):
    """LN2 -> fc1 -> act -> fc2 (*ls2) -> +residual, in XLA (roofline
    there — the LN epilogues fuse into the big GEMMs). bf16 callers get
    tanh-approx gelu: exact gelu's erf runs on the VPU and measured as
    THE ViT-B bottleneck (3.1k -> 4.1k patches/s on v5e); the error
    (<~1e-3 abs) is below the bf16 noise floor — same call the
    full-layer ViT-S kernel makes (ops/vit_layer.py). f32 callers
    (parity tests) keep exact gelu."""
    f32 = jnp.float32
    xf = x.astype(f32)
    y = _ln_f32(xf, bp["norm2"]["scale"], bp["norm2"]["bias"]).astype(x.dtype)
    h = y @ bp["mlp"]["Dense_0"]["kernel"] + bp["mlp"]["Dense_0"]["bias"]
    h = mlp_act(h, act, approx_gelu=x.dtype == jnp.bfloat16).astype(x.dtype)
    h = h @ bp["mlp"]["Dense_1"]["kernel"] + bp["mlp"]["Dense_1"]["bias"]
    h = h.astype(f32)
    if "ls2" in bp:
        h = h * bp["ls2"]
    return (xf + h).astype(x.dtype)


def _attn_half_weights(bp):
    w = {"ln1": bp["norm1"], "qkv": bp["attn"]["qkv"],
         "proj": bp["attn"]["proj"]}
    if "ls1" in bp:
        w["ls1"] = bp["ls1"]
    return w


def _xla_attn_half(x, bp, heads: int):
    """LN1 -> qkv -> packed fused MHA -> proj (*ls1) -> +residual —
    the route for trunks whose qkv+proj weights exceed VMEM. Shares
    _unfused_attn_half's surrounding math; only the MHA differs."""
    from acmil_tpu.ops.vit_attn_packed import fused_mha_packed

    return _unfused_attn_half(x, _attn_half_weights(bp), heads,
                              mha=fused_mha_packed)


def vit_encode(params, images, *, patch: int, depth: int, heads: int,
               dtype=jnp.bfloat16, act: str = "gelu",
               pre_norm: bool = False, proj_dim=None):
    """images: [B, H, W, 3] normalised -> cls features [B, D or proj_dim].

    ``params``: the flax ViT param tree (vit.py naming: patch_embed,
    cls_token, pos_embed, block{i}[, norm_pre], norm[, proj_out]).
    """
    b = images.shape[0]
    x = jax.lax.conv_general_dilated(
        images.astype(dtype), params["patch_embed"]["kernel"].astype(dtype),
        window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["bias"].astype(dtype)
    dim = x.shape[-1]
    x = x.reshape(b, -1, dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)
    if pre_norm:
        xf = x.astype(jnp.float32)
        x = _ln_f32(xf, params["norm_pre"]["scale"],
                    params["norm_pre"]["bias"]).astype(dtype)

    n_tok = x.shape[1]
    n_pad = (n_tok + 15) // 16 * 16
    hidden = params["block0"]["mlp"]["Dense_0"]["kernel"].shape[1]
    layerscale = "ls1" in params["block0"]
    full_ok = (act == "gelu" and not layerscale
               and fits_vmem(dim, hidden, n_pad, heads))
    half_ok = attn_half_fits(dim, n_pad, heads, g=1,
                             bytes_per_el=jnp.dtype(dtype).itemsize)

    for i in range(depth):
        bp = params[f"block{i}"]
        if full_ok:
            x = fused_vit_layer(x, _block_weights(bp), heads)
        elif half_ok:
            x = fused_vit_attn_half(x, _attn_half_weights(bp), heads)
            x = _mlp_half(x, bp, act)
        else:
            x = _xla_attn_half(x, bp, heads)
            x = _mlp_half(x, bp, act)

    xf = x.astype(jnp.float32)
    xn = _ln_f32(xf, params["norm"]["scale"], params["norm"]["bias"])
    feat = xn[:, 0].astype(dtype)
    if proj_dim:
        feat = feat @ params["proj_out"]["kernel"].astype(dtype)
    return feat
