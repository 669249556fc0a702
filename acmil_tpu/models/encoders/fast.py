"""Inference-path ViT encoder over fused Pallas layers.

Consumes a trained/converted :class:`~acmil_tpu.models.encoders.vit.ViT`
parameter tree directly (same pattern as ``models/fast.py`` for the MIL
heads) and runs patch-embed -> depth x fused transformer layer -> final
layernorm, giving the Step2 extraction engine
(`/root/reference/Step2_feature_extract.py:35-67`) a layer-fused compute
path: per layer, activations cross HBM exactly twice instead of ~10x
(see ops/vit_layer.py for the VMEM budget argument).

Falls back layer-by-layer to the unfused graph when the layer does not
fit VMEM (ViT-B and larger), so it is safe to call for any trunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmil_tpu.ops.vit_layer import LN_EPS, fused_vit_layer


def _block_weights(bp):
    return {
        "ln1": bp["norm1"], "ln2": bp["norm2"],
        "qkv": bp["attn"]["qkv"], "proj": bp["attn"]["proj"],
        "fc1": bp["mlp"]["Dense_0"], "fc2": bp["mlp"]["Dense_1"],
    }


def vit_encode(params, images, *, patch: int, depth: int, heads: int,
               dtype=jnp.bfloat16):
    """images: [B, H, W, 3] normalised -> cls features [B, D].

    ``params``: the flax ViT param tree (vit.py naming: patch_embed,
    cls_token, pos_embed, block{i}, norm). Plain-GELU, no-layerscale
    trunks only (ViT-S/B family) — exactly what vit.py builds for the
    medical_ssl / natural_* encoders.
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

    for i in range(depth):
        x = fused_vit_layer(x, _block_weights(params[f"block{i}"]), heads)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    xn = xn * params["norm"]["scale"] + params["norm"]["bias"]
    return xn[:, 0].astype(dtype)
