"""Fused multi-head self-attention for short-sequence ViT encoders (Pallas).

The Step2 extraction workload (`/root/reference/Step2_feature_extract.py:35-67`)
is a ViT-S/16 over 197 tokens x batch 256+. The unfused XLA graph
materialises the [B, H, N, N] score tensor in HBM twice per layer
(bf16 write + read around the softmax; 2x that when the softmax runs in
f32), which makes the encoder memory-bound at ~23% MFU and spills at
batch 512 (BENCH_NOTES r1). At N=197 the whole score matrix for one
sample fits in VMEM, so no flash-style streaming softmax is needed:
one kernel program per batch element computes QK^T -> masked softmax -> PV
for all heads without touching HBM in between.

Layout: q, k, v are [B, H, N, dh]. N is padded to a multiple of 128 by
the BlockSpec (Pallas bounds-masks the out-of-range rows; their contents
are garbage, so padded *columns* are -inf'd before the softmax and padded
*value rows* are zeroed — padded query rows produce garbage that the
masked output write drops).

Inference-grade: differentiation falls back to the reference einsum path
via custom_vjp (Step2 never backprops through the encoder; 'lp'
fine-tuning trains only the head).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmil_tpu.ops.tile import round_up as _round_up



def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    """One batch element, all heads resident in VMEM.

    Block shapes: q/k/v/o = [1, H, N_pad, dh].
    """
    q = q_ref[0]                      # [H, N_pad, dh]
    k = k_ref[0]
    v = v_ref[0]
    n_pad = q.shape[1]

    # scores: [H, N_pad, N_pad] in f32 (softmax precision)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    # padded keys: -inf BEFORE the softmax; jnp.where also scrubs any
    # NaN garbage Pallas bounds-masking may have read past row n_valid
    s = jnp.where(col < n_valid, s, -jnp.inf)

    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=2, keepdims=True)
    p = (p / denom).astype(q.dtype)

    # padded value rows may be garbage/NaN; their p is exactly 0 but
    # 0 * NaN = NaN, so zero them explicitly
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    v = jnp.where(row < n_valid, v, 0)

    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_vit_attention(q, k, v, scale: Optional[float] = None):
    """Fused MHA for short sequences: softmax(q k^T / sqrt(dh)) v.

    q, k, v: [B, H, N, dh] (N <= ~1k; the [H, N_pad, N_pad] f32 score
    tensor must fit VMEM). Returns [B, H, N, dh] in q.dtype.
    """
    return _fused_fwd_impl(q, k, v, scale)


def _fused_fwd_impl(q, k, v, scale):
    b, h, n, dh = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(dh))
    n_pad = _round_up(n, 128)
    # VMEM budget: scores h*n_pad^2*4B + 4 qkv/o blocks. 16MB/core caps
    # n_pad around 768 for h=6; beyond that use a streaming kernel.
    assert h * n_pad * n_pad * 4 <= 12 * 2 ** 20, (
        f"score tensor too large for VMEM: h={h} n_pad={n_pad}")

    spec = pl.BlockSpec((1, h, n_pad, dh), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_mha_kernel, n_valid=n, scale=float(scale))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def _reference_attention(q, k, v, scale):
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _fused_fwd(q, k, v, scale):
    return _fused_fwd_impl(q, k, v, scale), (q, k, v)


def _fused_bwd(scale, res, g):
    # backward rematerialises through the plain einsum graph — the
    # encoder is frozen in every reference training path, so this runs
    # only in exotic fine-tuning setups where clarity beats speed
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, scale),
                     q, k, v)
    return vjp(g)


fused_vit_attention.defvjp(_fused_fwd, _fused_bwd)
