"""Fused gated-attention pooling — the flagship Pallas TPU kernel.

Covers the hot inference path of ABMIL / ACMIL_GA / IBMIL / DTFD-style
heads (SURVEY.md §7 step 4a): for a bag of N patch features it fuses

    h  = relu(feats @ W1)            (DimReduction, network.py:37)
    a  = (tanh(h V) * sigmoid(h U)) w   (Attention_Gated, transformer.py:239)
    A  = softmax over N (masked)
    out[k] = sum_n A[k, n] * h[n]       (branch bag features)

into ONE streaming pass over the feature matrix: an online-softmax
(Flash-style, but the "query" axis is just K attention branches) with
running (max, sum, weighted-accumulator) state in VMEM. XLA's unfused
graph reads ``feats`` once and the reduced ``h`` twice more from HBM;
the fused kernel reads ``feats`` exactly once and keeps everything else
in VMEM — the op is HBM-bound, so this is the speed-of-light formulation.

The raw (pre-softmax) attention logits are also emitted per chunk for
heatmaps (Step4) and downstream analysis.

Training keeps the jnp path (XLA handles the backward well; STKIM needs
the full logit matrix anyway); this kernel is the deterministic inference
path, exposed through :func:`acmil_tpu.models.fast.acmil_ga_infer`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
K_OUT = 8  # sublane tile for the emitted attention-logit rows (branches)


def _kernel(feats_ref, mask_ref, w1_ref, v_ref, bv_ref, u_ref, bu_ref,
            w_ref, bw_ref, bag_ref, logits_ref,
            m_scr, s_scr, acc_scr):
    # grid = (B, n_chunks); chunks iterate fastest, so the running stats
    # reset at the first chunk of every bag
    i = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = feats_ref[0]                                   # [C, Df]
    h = jnp.maximum(jnp.dot(x, w1_ref[:],
                            preferred_element_type=jnp.float32), 0.0)  # [C, L]
    av = jnp.tanh(jnp.dot(h, v_ref[:], preferred_element_type=jnp.float32)
                  + bv_ref[:])
    au = jax.nn.sigmoid(jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32)
                        + bu_ref[:])
    logits = jnp.dot(av * au, w_ref[:],
                     preferred_element_type=jnp.float32) + bw_ref[:]  # [C, K]

    valid = mask_ref[0] > 0                            # [C, 1]
    logits = jnp.where(valid, logits, NEG)
    # emit raw logits as [K_OUT, C] (sublane-major): 16x less HBM traffic
    # than a [C, 128-lane] layout when K is small
    logits_ref[0] = jax.lax.slice(logits, (0, 0), (logits.shape[0], K_OUT)).T

    # online softmax update, per branch k (K is the lane-tile axis of the
    # running stats; stats are [1, K] rows)
    chunk_max = jnp.max(logits, axis=0, keepdims=True)          # [1, K]
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, chunk_max)
    scale = jnp.exp(m_old - m_new)                              # [1, K]
    p = jnp.exp(logits - m_new)                                 # [C, K]
    p = jnp.where(valid, p, 0.0)
    s_scr[:] = s_scr[:] * scale + jnp.sum(p, axis=0, keepdims=True)
    acc_scr[:] = acc_scr[:] * scale.T + jnp.dot(
        p.T, h, preferred_element_type=jnp.float32)             # [K, L]
    m_scr[:] = m_new

    @pl.when(i == n_chunks - 1)
    def _final():
        bag_ref[0] = acc_scr[:] / jnp.maximum(s_scr[:].T, 1e-12)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_gated_attn_pool_batched(
    feats: jnp.ndarray,       # [B, N, Df] float32/bf16
    mask: jnp.ndarray,        # [B, N] bool
    w1: jnp.ndarray,          # [Df, L]  (bias-free DimReduction)
    v: jnp.ndarray,           # [L, A]
    bv: jnp.ndarray,          # [A]
    u: jnp.ndarray,           # [L, A]
    bu: jnp.ndarray,          # [A]
    w: jnp.ndarray,           # [A, K]
    bw: jnp.ndarray,          # [K]
    chunk: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused pooling. Returns (bag_feats [B, K, L],
    attn_logits [B, K, N]).

    K is padded to the 128-lane tile for the running stats and to
    ``K_OUT`` sublanes for the emitted logit rows; N must be a multiple of
    ``chunk`` (bags are already bucketed to powers of two). The grid is
    (B, N/chunk) with chunks innermost so the online-softmax state resets
    per bag.
    """
    b, n, df = feats.shape
    l = w1.shape[1]
    a_dim = v.shape[1]
    k = w.shape[1]
    assert k <= K_OUT, f"more than {K_OUT} attention branches: {k}"
    k_pad = 128  # one lane tile for the branch axis
    chunk = min(chunk, n)
    assert n % chunk == 0, (n, chunk)

    w_p = jnp.zeros((a_dim, k_pad), w.dtype).at[:, :k].set(w)
    bw_p = jnp.full((1, k_pad), 0.0, jnp.float32).at[0, :k].set(bw)
    mask2 = mask.astype(jnp.int32)[..., None]

    grid = (b, n // chunk)
    const = lambda bi, i: (0, 0)
    bag, logits = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, df), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((df, l), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, a_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, a_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((a_dim, k_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, l), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_OUT, chunk), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((b, K_OUT, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.float32),   # running max
            pltpu.VMEM((1, k_pad), jnp.float32),   # running sum
            pltpu.VMEM((k_pad, l), jnp.float32),   # weighted accumulator
        ],
        interpret=interpret,
    )(feats, mask2, w1, v, bv.reshape(1, -1), u, bu.reshape(1, -1), w_p, bw_p)
    return bag[:, :k], logits[:, :k]


def fused_gated_attn_pool(feats, mask, w1, v, bv, u, bu, w, bw,
                          chunk: int = 1024, interpret: bool = False):
    """Single-bag wrapper: feats [N, Df], mask [N] →
    (bag_feats [K, L], attn_logits [K, N])."""
    bag, logits = fused_gated_attn_pool_batched(
        feats[None], mask[None], w1, v, bv, u, bu, w, bw,
        chunk=chunk, interpret=interpret)
    return bag[0], logits[0]


def gated_attn_pool_reference(feats, mask, w1, v, bv, u, bu, w, bw):
    """jnp reference for testing the kernel."""
    h = jnp.maximum(feats @ w1, 0.0)
    logits = (jnp.tanh(h @ v + bv) * jax.nn.sigmoid(h @ u + bu)) @ w + bw
    logits = jnp.where(mask[:, None], logits, NEG)
    p = jax.nn.softmax(logits, axis=0)
    p = p * mask[:, None]
    p = p / jnp.maximum(p.sum(axis=0, keepdims=True), 1e-12)
    bag = p.T @ h
    return bag, logits
