"""Packed-layout fused MHA for large ViT trunks (ViT-B, CLIP-L, UNI, ViT-G).

ops/vit_layer.py fuses the whole encoder layer, but only trunks whose
weights fit VMEM (ViT-S) qualify. For bigger trunks the dominant
remaining cost is not the attention math — it is the LAYOUT traffic: the
einsum path materialises [B, H, N, dh] transposes of q, k, v and the
output (4 full HBM round-trips per layer), and the plain fused MHA
(ops/vit_attn.py) still needs those transposes to feed its blocks.

This kernel consumes the qkv projection EXACTLY as the Dense emits it —
token-major [B, N, 3*D] — splits heads with static lane slices inside
VMEM, and writes the attention output token-major [B, N, D], ready for
the proj matmul. Zero relayouts touch HBM.

Heads loop sequentially inside the program, so VMEM holds one [N_pad,
N_pad] f32 score matrix at a time: fits for CLIP-L's 577 tokens and
ViT-G's 24 heads alike.

Inference-grade (bf16/f32); backward falls back to the einsum graph via
custom_vjp (encoders are frozen in every reference training path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmil_tpu.ops.tile import round_up as _round_up



def _packed_kernel(qkv_ref, o_ref, *, heads: int, n_valid: int,
                   q_chunk: int):
    """Grid (B, n_q_chunks): the full qkv block stays VMEM-resident across
    a batch element's query chunks (constant index map), so only one
    [q_chunk, N_pad] score matrix lives at a time."""
    qi = pl.program_id(1)
    qkv = qkv_ref[0]                     # [N_pad, 3D], resident
    n_pad, three_d = qkv.shape
    d = three_d // 3
    dh = d // heads
    scale = 1.0 / float(np.sqrt(dh))
    col = jax.lax.broadcasted_iota(jnp.int32, (q_chunk, n_pad), 1)
    q_rows = qkv_ref[0, pl.ds(qi * q_chunk, q_chunk), :]
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q_h = q_rows[:, 0 * d:1 * d][:, sl]
        k_h = qkv[:, 1 * d:2 * d][:, sl]
        v_h = qkv[:, 2 * d:3 * d][:, sl]
        # bounds-masking garbage rows: keys masked via -inf columns,
        # values zeroed (0 * NaN = NaN otherwise), query garbage dropped
        # by the masked output write
        row = jax.lax.broadcasted_iota(jnp.int32, v_h.shape, 0)
        v_h = jnp.where(row < n_valid, v_h, 0)
        s = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(col < n_valid, s, -jnp.inf)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(qkv.dtype)
        outs.append(jnp.dot(p, v_h, preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_mha_packed(qkv, heads: int):
    """qkv: [B, N, 3*D] (token-major, as the fused qkv Dense emits) ->
    attention output [B, N, D] in qkv.dtype."""
    return _packed_impl(qkv, heads)


def _packed_impl(qkv, heads, q_chunk: int = 256):
    b, n, three_d = qkv.shape
    d = three_d // 3
    # N_pad must be a multiple of q_chunk: a ragged final chunk would have
    # its dynamic-slice start clamped and read the WRONG rows. Pad to the
    # 128-lane granule FIRST and pick the largest 64-aligned divisor ≤384
    # as q_chunk — padding N up to a q_chunk multiple instead cost CLIP-L
    # (N=577) a 768-row pad, 1.77x the useful attention work; while tiny
    # q_chunks (128) halve the M-dim of every per-head dot and measured
    # slower than the padding they saved (BENCH_NOTES r4).
    n_pad = _round_up(n, 128)
    cap = min(384, n_pad)
    q_chunk = max(c for c in range(64, cap + 1, 64) if n_pad % c == 0)
    n_q = n_pad // q_chunk

    in_spec = pl.BlockSpec((1, n_pad, three_d), lambda i, qi: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, q_chunk, d), lambda i, qi: (i, qi, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_packed_kernel, heads=heads, n_valid=n,
                               q_chunk=q_chunk)
    return pl.pallas_call(
        kernel,
        grid=(b, n_q),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qkv)


def _reference_packed(qkv, heads):
    b, n, three_d = qkv.shape
    d = three_d // 3
    dh = d // heads

    def split(t):
        return t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = (split(qkv[..., i * d:(i + 1) * d]) for i in range(3))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(b, n, d)


def _fwd(qkv, heads):
    return _packed_impl(qkv, heads), (qkv,)


def _bwd(heads, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda qkv: _reference_packed(qkv, heads), qkv)
    return vjp(g)


fused_mha_packed.defvjp(_fwd, _bwd)
