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

Training runs the same kernel through :func:`gated_attn_pool_grad`
(custom_vjp with the one-pass fused backward below) — single device or,
via :func:`sharded_gated_attn_pool_grad`, sharded over a (data, seq)
mesh with the flash merge rule and globally-corrected backward stats.
STKIM training reuses the emitted logit matrix: the drop correction is
O(K·n_masked_patch) on top of one kernel pass
(models/fast.py::acmil_ga_apply_batched). Inference is exposed through
:func:`acmil_tpu.models.fast.acmil_ga_infer`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _k_out(k: int) -> int:
    """Sublane-tile-aligned row count for the emitted attention logits.

    Branches are emitted [K_OUT, N] (sublane-major); f32 tiles are 8
    sublanes, so pad K up to a multiple of 8. The running-stat lane tile
    caps K at 128 — far above any reference config (default n_token=5).
    """
    return max(8, (k + 7) // 8 * 8)


def _kernel(feats_ref, mask_ref, w1_ref, b1_ref, v_ref, bv_ref, u_ref,
            bu_ref, w_ref, bw_ref, bag_ref, logits_ref, m_ref, s_ref,
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
                            preferred_element_type=jnp.float32)
                    + b1_ref[:], 0.0)                  # [C, L]
    av = jnp.tanh(jnp.dot(h, v_ref[:], preferred_element_type=jnp.float32)
                  + bv_ref[:])
    au = jax.nn.sigmoid(jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32)
                        + bu_ref[:])
    logits = jnp.dot(av * au, w_ref[:],
                     preferred_element_type=jnp.float32) + bw_ref[:]  # [C, K]

    valid = mask_ref[0] > 0                            # [C, 1]
    logits = jnp.where(valid, logits, NEG)
    # emit raw logits as [k_out, C] (sublane-major): 16x less HBM traffic
    # than a [C, 128-lane] layout when K is small
    k_out = logits_ref.shape[1]
    logits_ref[0] = jax.lax.slice(logits, (0, 0), (logits.shape[0], k_out)).T

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
        # online-softmax stats: lets shards of a seq-sharded bag combine
        # (bag_global = sum_i bag_i*s_i*exp(m_i-m*) / sum_i s_i*exp(m_i-m*))
        m_ref[0] = m_scr[:]
        s_ref[0] = s_scr[:]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret", "return_stats"))
def fused_gated_attn_pool_batched(
    feats: jnp.ndarray,       # [B, N, Df] float32/bf16
    mask: jnp.ndarray,        # [B, N] bool
    w1: jnp.ndarray,          # [Df, L]
    b1: jnp.ndarray,          # [L] (zeros for the reference's bias-free
                              #      DimReduction; CLAM's fc has a bias)
    v: jnp.ndarray,           # [L, A]
    bv: jnp.ndarray,          # [A]
    u: jnp.ndarray,           # [L, A]
    bu: jnp.ndarray,          # [A]
    w: jnp.ndarray,           # [A, K]
    bw: jnp.ndarray,          # [K]
    chunk: int = 1024,
    interpret: bool = False,
    return_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Batched fused pooling. Returns (bag_feats [B, K, L],
    attn_logits [B, K, N]); with ``return_stats`` also the online-softmax
    running stats (max [B, K], denom [B, K]) for cross-shard combining.

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
    assert k <= 128, f"branch axis exceeds the 128-lane stat tile: {k}"
    k_out = _k_out(k)
    k_pad = 128  # one lane tile for the branch axis
    chunk = min(chunk, n)
    # bags are normally bucketed to multiples of chunk, but arbitrary N
    # (e.g. max_patches-clamped bags) pads up with mask=False rows, which
    # the kernel already treats as inert
    n_full = (n + chunk - 1) // chunk * chunk
    if n_full != n:
        feats = jnp.pad(feats, ((0, 0), (0, n_full - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_full - n)))

    w_p = jnp.zeros((a_dim, k_pad), w.dtype).at[:, :k].set(w)
    bw_p = jnp.full((1, k_pad), 0.0, jnp.float32).at[0, :k].set(bw)
    mask2 = mask.astype(jnp.int32)[..., None]

    grid = (b, n_full // chunk)
    const = lambda bi, i: (0, 0)
    bag, logits, m_out, s_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, df), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((df, l), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), const, memory_space=pltpu.VMEM),
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
            pl.BlockSpec((1, k_out, chunk), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((b, k_out, n_full), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k_pad), jnp.float32),   # running max
            pltpu.VMEM((1, k_pad), jnp.float32),   # running sum
            pltpu.VMEM((k_pad, l), jnp.float32),   # weighted accumulator
        ],
        interpret=interpret,
    )(feats, mask2, w1, b1.reshape(1, -1), v, bv.reshape(1, -1), u,
      bu.reshape(1, -1), w_p, bw_p)
    if return_stats:
        return (bag[:, :k], logits[:, :k, :n],
                m_out[:, 0, :k], s_out[:, 0, :k])
    return bag[:, :k], logits[:, :k, :n]


def fused_gated_attn_pool(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                          chunk: int = 1024, interpret: bool = False):
    """Single-bag wrapper: feats [N, Df], mask [N] →
    (bag_feats [K, L], attn_logits [K, N])."""
    bag, logits = fused_gated_attn_pool_batched(
        feats[None], mask[None], w1, b1, v, bv, u, bu, w, bw,
        chunk=chunk, interpret=interpret)
    return bag[0], logits[0]


def gated_attn_pool_reference(feats, mask, w1, b1, v, bv, u, bu, w, bw):
    """jnp reference for testing the kernel."""
    h = jnp.maximum(feats @ w1 + b1, 0.0)
    logits = (jnp.tanh(h @ v + bv) * jax.nn.sigmoid(h @ u + bu)) @ w + bw
    logits = jnp.where(mask[:, None], logits, NEG)
    p = jax.nn.softmax(logits, axis=0)
    p = p * mask[:, None]
    p = p / jnp.maximum(p.sum(axis=0, keepdims=True), 1e-12)
    bag = p.T @ h
    return bag, logits


# ---------------------------------------------------------------------------
# Differentiable wrapper + fused backward kernel (VERDICT r1 item 8)
# ---------------------------------------------------------------------------

def _reference_batched(feats, mask, w1, b1, v, bv, u, bu, w, bw):
    """vmapped jnp reference with the kernel's output layout
    (bag [B, K, L], logits [B, K, N])."""
    bag, logits = jax.vmap(
        gated_attn_pool_reference,
        in_axes=(0, 0) + (None,) * 8)(feats, mask, w1, b1, v, bv, u, bu,
                                      w, bw)
    return bag, logits.transpose(0, 2, 1)


def _bwd_kernel(x_ref, mask_ref, lse_ref, c_ref, dbag_ref, dlo_ref,
                w1_ref, b1_ref, v_ref, bv_ref, u_ref, bu_ref, w_ref, bw_ref,
                dx_ref, dw1_ref, db1_ref, dv_ref, dbv_ref, du_ref, dbu_ref,
                dw_ref, dbw_ref,
                dw1_s, db1_s, dv_s, dbv_s, du_s, dbu_s, dw_s, dbw_s):
    """One chunked pass over x. Softmax-backward coupling uses two
    closed forms instead of extra passes: lse per branch (from the
    emitted logits) reconstructs p, and c_k = sum_l d_bag[k,l]*bag[k,l]
    replaces sum_n p[n,k]*d_p[n,k] (both computed XLA-side)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    last = jnp.logical_and(bi == pl.num_programs(0) - 1,
                           i == pl.num_programs(1) - 1)

    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _init():
        for s in (dw1_s, db1_s, dv_s, dbv_s, du_s, dbu_s, dw_s, dbw_s):
            s[:] = jnp.zeros_like(s)

    # --- recompute forward intermediates for this chunk --------------------
    x = x_ref[0]                                            # [C, Df]
    h = jnp.maximum(jnp.dot(x, w1_ref[:],
                            preferred_element_type=jnp.float32)
                    + b1_ref[:], 0.0)
    av_pre = jnp.dot(h, v_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    au_pre = jnp.dot(h, u_ref[:], preferred_element_type=jnp.float32) + bu_ref[:]
    gv, gu = jnp.tanh(av_pre), jax.nn.sigmoid(au_pre)
    g = gv * gu
    logits = jnp.dot(g, w_ref[:],
                     preferred_element_type=jnp.float32) + bw_ref[:]
    valid = mask_ref[0] > 0                                 # [C, 1]
    p = jnp.exp(jnp.where(valid, logits, NEG) - lse_ref[0])  # [C, k_pad]
    p = jnp.where(valid, p, 0.0)

    # --- softmax + head backward -------------------------------------------
    dbag = dbag_ref[0]                                      # [k_pad, L]
    d_p = jax.lax.dot_general(h, dbag, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [C, k_pad]
    d_log = p * (d_p - c_ref[0])
    dlo = dlo_ref[0]                                        # [C, k_pad]
    d_log = d_log + jnp.where(valid, dlo, 0.0)

    d_g = jax.lax.dot_general(d_log, w_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [C, A]
    d_av = d_g * gu * (1.0 - gv * gv)
    d_au = d_g * gv * gu * (1.0 - gu)

    d_h = jax.lax.dot_general(p, dbag, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [C, L]
    d_h = d_h + jax.lax.dot_general(d_av, v_ref[:], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    d_h = d_h + jax.lax.dot_general(d_au, u_ref[:], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    r = jnp.where(h > 0.0, d_h, 0.0)
    dx_ref[0] = jax.lax.dot_general(
        r, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    # --- weight-grad accumulators (VMEM-resident across the whole grid) ----
    ct = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw1_s[:] += ct(x, r)
    db1_s[:] += jnp.sum(r, axis=0, keepdims=True)
    dv_s[:] += ct(h, d_av)
    dbv_s[:] += jnp.sum(d_av, axis=0, keepdims=True)
    du_s[:] += ct(h, d_au)
    dbu_s[:] += jnp.sum(d_au, axis=0, keepdims=True)
    dw_s[:] += ct(g, d_log)
    dbw_s[:] += jnp.sum(d_log, axis=0, keepdims=True)

    @pl.when(last)
    def _emit():
        dw1_ref[:] = dw1_s[:]
        db1_ref[:] = db1_s[:]
        dv_ref[:] = dv_s[:]
        dbv_ref[:] = dbv_s[:]
        du_ref[:] = du_s[:]
        dbu_ref[:] = dbu_s[:]
        dw_ref[:] = dw_s[:]
        dbw_ref[:] = dbw_s[:]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _fused_pool_bwd(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                    bag, logits, d_bag, d_logits,
                    chunk: int = 1024, interpret: bool = False):
    # closed forms for the cross-chunk couplings (see _bwd_kernel doc)
    masked_logits = jnp.where(mask[:, None, :], logits, NEG)
    lse = jax.nn.logsumexp(masked_logits, axis=2)             # [B, K]
    c = jnp.sum(d_bag * bag, axis=2)                          # [B, K]
    return _fused_pool_bwd_stats(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                                 lse, c, d_bag, d_logits,
                                 chunk=chunk, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _fused_pool_bwd_stats(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                          lse, c, d_bag, d_logits,
                          chunk: int = 1024, interpret: bool = False):
    """Backward pass with the softmax couplings supplied externally.

    ``lse``/``c`` are per-(bag, branch) scalars ``[B, K]``: the softmax
    log-normaliser and ``sum_l d_bag·bag``. A seq-sharded caller passes
    GLOBAL values so each shard's kernel pass reconstructs the global
    softmax restricted to its local rows (weight grads come back as
    partial sums to be psum'd)."""
    b, n, df = feats.shape
    l = w1.shape[1]
    a_dim = v.shape[1]
    k = w.shape[1]
    k_pad = 128
    chunk = min(chunk, n)

    # padded-K lanes: lse=0 with zero d_bag/d_logits keeps their grads 0
    pad_k = lambda t: jnp.zeros((b, 1, k_pad), jnp.float32).at[:, 0, :k].set(t)
    lse_p, c_p = pad_k(lse), pad_k(c)
    dbag_p = jnp.zeros((b, k_pad, l), jnp.float32).at[:, :k].set(d_bag)
    # arbitrary N pads up to a chunk multiple with mask=False rows
    # (inert: zero p, zero d_log, zero dx) — same policy as the forward
    n_full = (n + chunk - 1) // chunk * chunk
    if n_full != n:
        feats = jnp.pad(feats, ((0, 0), (0, n_full - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_full - n)))
        d_logits = jnp.pad(d_logits, ((0, 0), (0, 0), (0, n_full - n)))
    # token-major cotangent: pad + transpose once in XLA so the kernel
    # reads [C, k_pad] blocks directly (an in-kernel [k_pad, C] transpose
    # cost more than the whole backward saved)
    dlo_p = jnp.zeros((b, n_full, k_pad), jnp.float32).at[:, :, :k].set(
        d_logits.transpose(0, 2, 1))
    w_p = jnp.zeros((a_dim, k_pad), w.dtype).at[:, :k].set(w)
    bw_p = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(bw)
    mask2 = mask.astype(jnp.int32)[..., None]
    feats32 = feats.astype(jnp.float32)

    grid = (b, n_full // chunk)
    const = lambda shape: pl.BlockSpec(
        shape, lambda bi, i, _nd=len(shape): (0,) * _nd,
        memory_space=pltpu.VMEM)
    per_bag = lambda shape: pl.BlockSpec(
        shape, lambda bi, i: (bi,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, df), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            per_bag((1, 1, k_pad)),            # lse
            per_bag((1, 1, k_pad)),            # c
            per_bag((1, k_pad, l)),            # d_bag
            pl.BlockSpec((1, chunk, k_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),   # d_logits (token-major)
            const((df, l)), const((1, l)), const((l, a_dim)),
            const((1, a_dim)),
            const((l, a_dim)), const((1, a_dim)),
            const((a_dim, k_pad)), const((1, k_pad)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, df), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            const((df, l)), const((1, l)), const((l, a_dim)),
            const((1, a_dim)),
            const((l, a_dim)), const((1, a_dim)),
            const((a_dim, k_pad)), const((1, k_pad)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_full, df), feats.dtype),
            jax.ShapeDtypeStruct((df, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((l, a_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, a_dim), jnp.float32),
            jax.ShapeDtypeStruct((l, a_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, a_dim), jnp.float32),
            jax.ShapeDtypeStruct((a_dim, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((df, l), jnp.float32),
            pltpu.VMEM((1, l), jnp.float32),
            pltpu.VMEM((l, a_dim), jnp.float32),
            pltpu.VMEM((1, a_dim), jnp.float32),
            pltpu.VMEM((l, a_dim), jnp.float32),
            pltpu.VMEM((1, a_dim), jnp.float32),
            pltpu.VMEM((a_dim, k_pad), jnp.float32),
            pltpu.VMEM((1, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(feats32, mask2, lse_p.reshape(b, 1, k_pad), c_p.reshape(b, 1, k_pad),
      dbag_p, dlo_p, w1, b1.reshape(1, -1), v, bv.reshape(1, -1), u,
      bu.reshape(1, -1), w_p, bw_p)
    d_feats, dw1, db1, dv, dbv, du, dbu, dw, dbw = outs
    return (d_feats[:, :n], dw1, db1.reshape(-1), dv, dbv.reshape(-1), du,
            dbu.reshape(-1), dw[:, :k], dbw[0, :k])


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def gated_attn_pool_grad(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                         chunk: int = 1024):
    """Differentiable fused pooling: forward and backward each make ONE
    streaming HBM pass over ``feats`` (the backward recomputes the chunk's
    intermediates in VMEM). Layout matches
    :func:`fused_gated_attn_pool_batched`.
    """
    return fused_gated_attn_pool_batched(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, chunk=chunk,
        interpret=jax.default_backend() != "tpu")


def _gap_fwd(feats, mask, w1, b1, v, bv, u, bu, w, bw, chunk):
    out = gated_attn_pool_grad(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                               chunk)
    bag, logits = out
    return out, (feats, mask, w1, b1, v, bv, u, bu, w, bw, bag, logits)


def _gap_bwd(chunk, res, g):
    feats, mask, w1, b1, v, bv, u, bu, w, bw, bag, logits = res
    d_bag, d_logits = g
    grads = _fused_pool_bwd(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, bag, logits,
        d_bag.astype(jnp.float32), d_logits.astype(jnp.float32),
        chunk=chunk, interpret=jax.default_backend() != "tpu")
    d_feats, dw1, db1, dv, dbv, du, dbu, dw, dbw = grads
    return (d_feats.astype(feats.dtype), None, dw1, db1, dv, dbv, du, dbu,
            dw, dbw)


gated_attn_pool_grad.defvjp(_gap_fwd, _gap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def gated_attn_pool_grad_one(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                             chunk: int = 1024):
    """:func:`gated_attn_pool_grad` with **softmax_one** normalisation
    (CLAM_MB, `architecture/clam.py:248` via `utils/utils.py:54`):
    attention weights are ``exp(a_n) / (1 + Σ_m exp(a_m))`` — a softmax
    with a phantom logit pinned at 0.

    Same one-pass kernel: the plain-softmax pooled output rescales by
    ``s / (s + exp(-m))`` from the emitted online-softmax stats, and the
    backward reuses the standard kernel with the phantom-augmented
    log-normaliser ``lse₁ = logaddexp(0, lse)`` — the softmax-one
    Jacobian has the identical ``p·(d_p − c)`` form because
    ``∂p_i/∂a_j = p_i(δ_ij − p_j)`` holds for both normalisations.
    """
    bag, logits, m, s = fused_gated_attn_pool_batched(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, chunk=chunk,
        interpret=jax.default_backend() != "tpu", return_stats=True)
    # bag (plain softmax) = acc / s; softmax-one = acc / (s·1 + exp(0−m))
    scale = s / jnp.maximum(s + jnp.exp(-m), 1e-30)
    return bag * scale[..., None], logits


def _gap1_fwd(feats, mask, w1, b1, v, bv, u, bu, w, bw, chunk):
    out = gated_attn_pool_grad_one(feats, mask, w1, b1, v, bv, u, bu, w,
                                   bw, chunk)
    bag, logits = out
    return out, (feats, mask, w1, b1, v, bv, u, bu, w, bw, bag, logits)


def _gap1_bwd(chunk, res, g):
    feats, mask, w1, b1, v, bv, u, bu, w, bw, bag, logits = res
    d_bag, d_logits = g
    d_bag = d_bag.astype(jnp.float32)
    masked_logits = jnp.where(mask[:, None, :], logits, NEG)
    lse = jax.nn.logsumexp(masked_logits, axis=2)              # [B, K]
    lse_one = jnp.logaddexp(0.0, lse)                # phantom logit at 0
    # c = Σ_n p_n·d_p_n = Σ_l d_bag·bag — valid for softmax-one too
    # because bag here already is the softmax-one pooled sum
    c = jnp.sum(d_bag * bag, axis=2)
    grads = _fused_pool_bwd_stats(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, lse_one, c,
        d_bag, d_logits.astype(jnp.float32),
        chunk=chunk, interpret=jax.default_backend() != "tpu")
    d_feats, dw1, db1, dv, dbv, du, dbu, dw, dbw = grads
    return (d_feats.astype(feats.dtype), None, dw1, db1, dv, dbv, du, dbu,
            dw, dbw)


gated_attn_pool_grad_one.defvjp(_gap1_fwd, _gap1_bwd)


# ---------------------------------------------------------------------------
# Sequence-sharded pooling: distributed online softmax over the patch axis
# ---------------------------------------------------------------------------

def _shard_specs(data_axis, seq_axis):
    """(in_specs, out_specs) for the sharded pooling shard_maps."""
    from jax.sharding import PartitionSpec as P

    w_specs = (P(None, None), P(None), P(None, None), P(None),
               P(None, None), P(None), P(None, None), P(None))
    return P, w_specs


def _sharded_pool_fwd_impl(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                           mesh, chunk, data_axis, seq_axis):
    """shard_map'd forward: per-shard kernel + flash merge over ``seq``.

    Returns (bag [B,K,L] replicated over seq / sharded over data,
    logits [B,K,N] sharded over data+seq, lse [B,K] — the GLOBAL
    softmax log-normaliser, needed by the sharded backward)."""
    from functools import partial

    from jax import shard_map

    P, w_specs = _shard_specs(data_axis, seq_axis)
    interp = jax.default_backend() != "tpu"

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(data_axis, seq_axis, None), P(data_axis, seq_axis),
                  *w_specs),
        out_specs=(P(data_axis, None, None), P(data_axis, None, seq_axis),
                   P(data_axis, None)),
        check_vma=False,
    )
    def run(feats, mask, w1, b1, v, bv, u, bu, w, bw):
        bag, logits, m, s = fused_gated_attn_pool_batched(
            feats, mask, w1, b1, v, bv, u, bu, w, bw, chunk=chunk,
            interpret=interp, return_stats=True)
        m_star = jax.lax.pmax(m, seq_axis)
        wgt = s * jnp.exp(m - m_star)                    # [B, K]
        acc = jax.lax.psum(bag * wgt[..., None], seq_axis)
        denom = jax.lax.psum(wgt, seq_axis)
        bag_g = acc / jnp.maximum(denom[..., None], 1e-12)
        lse = m_star + jnp.log(jnp.maximum(denom, 1e-30))
        return bag_g, logits, lse

    return run(feats, mask, w1, b1, v, bv, u, bu, w, bw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def sharded_gated_attn_pool_grad(feats, mask, w1, b1, v, bv, u, bu, w, bw,
                                 mesh, chunk: int = 1024,
                                 data_axis: str = "data",
                                 seq_axis: str = "seq"):
    """Differentiable fused pooling over a (data, seq) mesh.

    Forward: each device runs the streaming kernel on its local shard of
    ``feats [B, N, Df]`` (batch sharded over ``data``, patch axis over
    ``seq``), then seq-shards combine with the flash-attention merge rule
    over ICI:

        m* = pmax(m_i);  w_i = s_i * exp(m_i - m*)
        bag = psum(bag_i * w_i) / psum(w_i)

    — O(K*(L+1)) bytes of collective traffic per bag, independent of N.
    Nothing is approximated: the result equals the single-device kernel
    up to f32 summation order. Empty shards contribute w_i = 0.

    Backward: each shard runs the fused one-pass backward kernel with the
    GLOBAL softmax stats (lse from the merged forward, c = Σ d_bag·bag),
    so its local rows see the exact global softmax; weight grads psum
    over both mesh axes (the explicit version of the all-reduce jit
    would insert for replicated params), feature grads stay sharded.

    This is the mesh train/eval path for GA-structured heads — the
    reference has no distributed training at all (SURVEY §2.7).

    Returns (bag [B, K, L] replicated over seq, attn_logits [B, K, N]
    sharded over seq). Weights must be replicated.
    """
    bag, logits, _lse = _sharded_pool_fwd_impl(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, mesh, chunk, data_axis,
        seq_axis)
    return bag, logits


def _sgap_fwd(feats, mask, w1, b1, v, bv, u, bu, w, bw,
              mesh, chunk, data_axis, seq_axis):
    bag, logits, lse = _sharded_pool_fwd_impl(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, mesh, chunk, data_axis,
        seq_axis)
    return (bag, logits), (feats, mask, w1, b1, v, bv, u, bu, w, bw, bag,
                           logits, lse)


def _sgap_bwd(mesh, chunk, data_axis, seq_axis, res, g):
    from functools import partial

    from jax import shard_map

    feats, mask, w1, b1, v, bv, u, bu, w, bw, bag, logits, lse = res
    d_bag, d_logits = g
    d_bag = d_bag.astype(jnp.float32)
    d_logits = d_logits.astype(jnp.float32)
    c = jnp.sum(d_bag * bag, axis=2)                     # [B, K] global
    P, w_specs = _shard_specs(data_axis, seq_axis)
    interp = jax.default_backend() != "tpu"

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(data_axis, seq_axis, None), P(data_axis, seq_axis),
                  *w_specs,
                  P(data_axis, None), P(data_axis, None),
                  P(data_axis, None, None), P(data_axis, None, seq_axis)),
        out_specs=(P(data_axis, seq_axis, None),
                   *(P(*(None,) * nd) for nd in (2, 1, 2, 1, 2, 1, 2, 1))),
        check_vma=False,
    )
    def run(feats, mask, w1, b1, v, bv, u, bu, w, bw, lse, c, d_bag,
            d_logits):
        outs = _fused_pool_bwd_stats(
            feats, mask, w1, b1, v, bv, u, bu, w, bw, lse, c, d_bag,
            d_logits, chunk=chunk, interpret=interp)
        d_feats, dw1, db1, dv, dbv, du, dbu, dw, dbw = outs
        # weight grads are partial (local batch rows x local patch rows):
        # the cross-shard sum IS the gradient all-reduce
        ps = lambda t: jax.lax.psum(t, (data_axis, seq_axis))
        return (d_feats, ps(dw1), ps(db1), ps(dv), ps(dbv), ps(du),
                ps(dbu), ps(dw), ps(dbw))

    d_feats, dw1, db1, dv, dbv, du, dbu, dw, dbw = run(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, lse, c, d_bag, d_logits)
    return (d_feats.astype(feats.dtype), None, dw1, db1, dv, dbv, du, dbu,
            dw, dbw)


sharded_gated_attn_pool_grad.defvjp(_sgap_fwd, _sgap_bwd)


def sharded_gated_attn_pool(feats, mask, w1, b1, v, bv, u, bu, w, bw, mesh,
                            seq_axis: str = "seq", chunk: int = 1024,
                            data_axis: str = "data"):
    """Non-differentiable alias of :func:`sharded_gated_attn_pool_grad`
    (kept for inference callers; see its docstring for the merge rule).

    On a seq-only mesh (no ``data`` axis — the original contract of this
    wrapper) the batch dimension is replicated rather than erroring on a
    nonexistent axis name (code-review r3)."""
    if data_axis is not None and data_axis not in mesh.axis_names:
        data_axis = None
    bag, logits, _ = _sharded_pool_fwd_impl(
        feats, mask, w1, b1, v, bv, u, bu, w, bw, mesh, chunk, data_axis,
        seq_axis)
    return bag, logits
