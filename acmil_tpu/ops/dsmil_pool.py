"""Fused DSMIL bag-head pooling (VERDICT r3 item 2, second target).

DSMIL's bag stream (`architecture/dsmil.py:38-85`, built with
``nonlinear=False`` by the generic trainer,
`Step3_WSI_classification.py:129-131`) is, per class c:

    q_n   = x_n @ Wq + bq                      (instance queries)
    a_cn  = q_n · q_max_c / sqrt(Q)            (critical-instance query)
    A     = softmax over n (masked)
    bag_c = sum_n A_cn * x_n                   (values are the RAW feats)

The unfused XLA graph reads ``feats`` twice (the q GEMM and the A·x
einsum) and round-trips ``q [N, Q]`` through HBM; this kernel is one
streaming pass with the same online-softmax state machine as
``ops/attn_pool.py`` — the score head is a linear form instead of the
gated MLP, and the accumulator carries D feature lanes instead of L.

``q_max [B, C, Q]`` (the critical instances' queries) is computed
XLA-side from the instance-classifier argmax — that needs the full
instance-score pass anyway, which is a single GEMM already at roofline.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmil_tpu.ops.attn_pool import NEG, _k_out


def _kernel(x_ref, mask_ref, wq_ref, bq_ref, qmax_ref,
            bag_ref, logits_ref, m_scr, s_scr, acc_scr, *, inv_sqrt_q):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0]                                        # [C, D]
    q = jnp.dot(x, wq_ref[:],
                preferred_element_type=jnp.float32) + bq_ref[:]   # [C, Q]
    logits = jax.lax.dot_general(
        q, qmax_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_sqrt_q  # [C, C_pad]

    valid = mask_ref[0] > 0                             # [C, 1]
    logits = jnp.where(valid, logits, NEG)
    k_out = logits_ref.shape[1]
    logits_ref[0] = jax.lax.slice(logits, (0, 0),
                                  (logits.shape[0], k_out)).T

    chunk_max = jnp.max(logits, axis=0, keepdims=True)
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, chunk_max)
    scale = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new)
    p = jnp.where(valid, p, 0.0)
    s_scr[:] = s_scr[:] * scale + jnp.sum(p, axis=0, keepdims=True)
    acc_scr[:] = acc_scr[:] * scale.T + jax.lax.dot_general(
        p, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [C_pad, D]
    m_scr[:] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _final():
        bag_ref[0] = acc_scr[:] / jnp.maximum(s_scr[:].T, 1e-12)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_dsmil_pool(
    feats: jnp.ndarray,   # [B, N, D]
    mask: jnp.ndarray,    # [B, N] bool
    wq: jnp.ndarray,      # [D, Q]
    bq: jnp.ndarray,      # [Q]
    q_max: jnp.ndarray,   # [B, C, Q] critical-instance queries
    chunk: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (bag_feat [B, C, D], attn_logits [B, C, N] — the model's
    pre-softmax ``a`` with NEG at masked slots)."""
    b, n, d = feats.shape
    q_dim = wq.shape[1]
    c = q_max.shape[1]
    assert c <= 128, f"class axis exceeds the 128-lane stat tile: {c}"
    k_out = _k_out(c)
    k_pad = 128
    chunk = min(chunk, n)
    n_full = (n + chunk - 1) // chunk * chunk
    if n_full != n:
        feats = jnp.pad(feats, ((0, 0), (0, n_full - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_full - n)))

    qmax_p = jnp.zeros((b, k_pad, q_dim), jnp.float32).at[:, :c].set(
        q_max.astype(jnp.float32))
    mask2 = mask.astype(jnp.int32)[..., None]

    grid = (b, n_full // chunk)
    const = lambda bi, i: (0, 0)
    bag, logits = pl.pallas_call(
        functools.partial(_kernel, inv_sqrt_q=1.0 / math.sqrt(q_dim)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, q_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, q_dim), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_out, chunk), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, k_out, n_full), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.float32),
            pltpu.VMEM((1, k_pad), jnp.float32),
            pltpu.VMEM((k_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(feats, mask2, wq, bq.reshape(1, -1), qmax_p)
    return bag[:, :c], logits[:, :c, :n]


def dsmil_pool_reference(feats, mask, wq, bq, q_max):
    """jnp reference (the model's own formulation) for testing."""
    q = feats @ wq + bq                                   # [B, N, Q]
    a = jnp.einsum("bnq,bcq->bcn", q, q_max) / jnp.sqrt(
        jnp.asarray(wq.shape[1], jnp.float32))
    a = jnp.where(mask[:, None, :], a, NEG)
    p = jax.nn.softmax(a, axis=-1)
    p = p * mask[:, None, :]
    p = p / jnp.maximum(p.sum(-1, keepdims=True), 1e-12)
    bag = jnp.einsum("bcn,bnd->bcd", p, feats)
    return bag, a
