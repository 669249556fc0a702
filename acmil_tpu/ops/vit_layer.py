"""Fully fused ViT encoder layer for small trunks (Pallas, inference).

Speed-of-light analysis for the Step2 extraction workload (ViT-S/16,
197 tokens, `/root/reference/Step2_feature_extract.py:35-67`): the MXU
sustains ~190 TFLOP/s on this chip for the raw GEMM chain, but the
unfused layer graph runs at <45% MFU because every layernorm, head
split/transpose and softmax round-trips activations through HBM. A
ViT-S layer's weights are only ~3.5 MB bf16 — they fit in VMEM with room
to spare — so the whole layer (LN1 -> QKV -> MHA -> proj -> +res -> LN2
-> MLP -> +res) runs as ONE kernel per batch element: HBM traffic
collapses to reading x once and writing the layer output once.

Applicability: D*(3D + D + 8D) * 2 bytes must fit VMEM alongside ~6 MB
of activations — true for ViT-S (384: 3.5 MB), not for ViT-B+ (768:
14 MB). `fits_vmem()` reports this; larger trunks use the fused
*attention* kernel (ops/vit_attn.py) instead.

Numerics: layernorm statistics, matmul accumulation, softmax and both
residual adds are f32; tensors cross HBM in bf16 only. Backward falls
back to the unfused graph via custom_vjp (encoders are frozen in every
reference training path).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acmil_tpu.ops.tile import round_up as _round_up

LN_EPS = 1e-6



def _ln_f32(h, scale, bias):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _layer_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                  *, heads: int, n_valid: int, g: int, n_pad: int):
    """``g`` batch elements per program, whole encoder layer in VMEM.

    The g images' tokens are stacked along the GEMM M-axis ([g*N_pad, D])
    so the qkv/proj/mlp matmuls run at M=g*208 instead of 208 — the MXU
    pipeline-fill fraction at M=208 costs ~11% end-to-end (measured
    g=1 14.2k vs g=4 15.9k img/s on the 12-layer chain). Attention stays
    per-image (keys never mix across the g images).
    """
    d = x_ref.shape[-1]
    dh = d // heads
    x = x_ref[:].reshape(g * n_pad, d).astype(jnp.float32)

    # --- attention half ---------------------------------------------------
    y = _ln_f32(x, ln1s_ref[0], ln1b_ref[0]).astype(x_ref.dtype)
    qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(x_ref.dtype)   # [g*N_pad, 3D]

    # per-head 2D slices: Mosaic cannot lower the [N, D] -> [H, N, dh]
    # shape-cast, but static lane slices + 2D matmuls it handles natively
    col2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, dh), 0)
    scale = 1.0 / float(np.sqrt(dh))
    outs = []
    for gi in range(g):
        tok = slice(gi * n_pad, (gi + 1) * n_pad)
        per_head = []
        for hh in range(heads):
            sl = slice(hh * dh, (hh + 1) * dh)
            q_h = qkv[tok, 0 * d:1 * d][:, sl]
            k_h = qkv[tok, 1 * d:2 * d][:, sl]
            v_h = qkv[tok, 2 * d:3 * d][:, sl]
            # rows past n_valid are bounds-masking garbage (possibly NaN);
            # their softmax weight is exactly 0 but 0*NaN = NaN in the PV dot
            v_h = jnp.where(row1 < n_valid, v_h, 0)
            s = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(col2 < n_valid, s, -jnp.inf)   # mask padded keys
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(x_ref.dtype)
            per_head.append(
                jnp.dot(p, v_h, preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(per_head, axis=1))
    o = jnp.concatenate(outs, axis=0).astype(x_ref.dtype)

    attn_out = jnp.dot(o, wproj_ref[:], preferred_element_type=jnp.float32)
    h = x + attn_out + bproj_ref[0]                 # f32 residual

    # --- MLP half -----------------------------------------------------------
    y2 = _ln_f32(h, ln2s_ref[0], ln2b_ref[0]).astype(x_ref.dtype)
    m = jnp.dot(y2, w1_ref[:], preferred_element_type=jnp.float32)
    m = m + b1_ref[0]
    # tanh-approx gelu: Mosaic lowers neither erf nor erfc, and the
    # approximation error (<~1e-3 abs) is below the bf16 noise floor of
    # this inference path; exact-gelu users take the unfused graph
    m = jax.nn.gelu(m, approximate=True).astype(x_ref.dtype)
    m = jnp.dot(m, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (h + m + b2_ref[0]).astype(o_ref.dtype).reshape(g, n_pad, d)


def fits_vmem(dim: int, mlp_hidden: int, n_pad: int, heads: int,
              bytes_per_el: int = 2, budget: int = None,
              g: int = 1) -> bool:
    """Conservative scoped-VMEM model for ``g`` images per program.

    Calibrated against Mosaic's own stack estimate on v5e (g=4 at
    N_pad=208/D=384 compiles at ~12 MB scoped; g=8 is rejected by the
    compiler at 16.7 MB vs its 16 MB limit). Shapes outside the
    calibrated ViT-S class keep a wider margin below the 16 MB limit so
    an optimistic activation model degrades to the unfused path instead
    of a hard Mosaic compile failure (ADVICE r2)."""
    if budget is None:
        calibrated = dim <= 448 and n_pad <= 256
        budget = (13 if calibrated else 10) * 2 ** 20
    weights = dim * (3 * dim + dim + 2 * mlp_hidden) * bytes_per_el
    gn = g * n_pad
    # Mosaic reuses dead buffers, so the live set per token is roughly one
    # f32 working tensor (the wider of qkv accum / mlp accum) plus one f32
    # residual lane; scores are per-image (the head loop is sequential).
    acts = (gn * 4 * (max(3 * dim, mlp_hidden) + dim)
            + n_pad * n_pad * 4)
    return weights + acts <= budget


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_vit_layer(x, weights, heads: int):
    """x: [B, N, D] -> [B, N, D]; weights: dict with ln1/{scale,bias},
    qkv/{kernel,bias}, proj/{kernel,bias}, ln2/{scale,bias},
    fc1/{kernel,bias}, fc2/{kernel,bias} (flax layout: kernel [in, out])."""
    return _fused_layer_impl(x, weights, heads)


def _unfused_layer(x, w, heads):
    f32 = jnp.float32
    y = _ln_f32(x.astype(f32), w["ln1"]["scale"], w["ln1"]["bias"]).astype(x.dtype)
    qkv = y @ w["qkv"]["kernel"] + w["qkv"]["bias"]
    b, n, d = x.shape
    dh = d // heads

    def heads_of(t):
        return t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = (heads_of(qkv[..., i * d:(i + 1) * d]) for i in range(3))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(f32) / np.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    h = x.astype(f32) + (o @ w["proj"]["kernel"] + w["proj"]["bias"]).astype(f32)
    y2 = _ln_f32(h, w["ln2"]["scale"], w["ln2"]["bias"]).astype(x.dtype)
    m = jax.nn.gelu(y2 @ w["fc1"]["kernel"] + w["fc1"]["bias"], approximate=False)
    m = m.astype(x.dtype) @ w["fc2"]["kernel"] + w["fc2"]["bias"]
    return (h + m.astype(f32)).astype(x.dtype)


def _fused_layer_impl(x, w, heads):
    b, n, d = x.shape
    hidden = w["fc1"]["kernel"].shape[1]
    # Sublane granularity is enough for the token axis (bf16 tiles are
    # 16x128 on the second-minor dim): 197 tokens pad to 208, not 256 —
    # the qkv/proj/mlp GEMMs are M-dim proportional, so this alone cuts
    # ~18% of the layer's MXU work for the Step2 ViT-S/16 workload.
    n_pad = _round_up(n, 16)
    if not fits_vmem(d, hidden, n_pad, heads):
        return _unfused_layer(x, w, heads)

    # Largest image group per program that divides the batch and fits
    # VMEM: stacking g images' tokens along the GEMM M-axis amortises the
    # MXU pipeline-fill at M=n_pad (g=4 is ~11% end-to-end on ViT-S).
    g = 1
    for cand in (4, 2):
        if b % cand == 0 and fits_vmem(d, hidden, n_pad, heads, g=cand):
            g = cand
            break

    dt = x.dtype
    x_spec = pl.BlockSpec((g, n_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def const(shape):  # weight blocks: same block every program
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    vec = lambda v: v.reshape(1, -1)
    args = [
        x,
        vec(w["ln1"]["scale"]), vec(w["ln1"]["bias"]),
        w["qkv"]["kernel"].astype(dt), vec(w["qkv"]["bias"]),
        w["proj"]["kernel"].astype(dt), vec(w["proj"]["bias"]),
        vec(w["ln2"]["scale"]), vec(w["ln2"]["bias"]),
        w["fc1"]["kernel"].astype(dt), vec(w["fc1"]["bias"]),
        w["fc2"]["kernel"].astype(dt), vec(w["fc2"]["bias"]),
    ]
    in_specs = [x_spec] + [const(tuple(a.shape)) for a in args[1:]]
    kernel = functools.partial(_layer_kernel, heads=heads, n_valid=n,
                               g=g, n_pad=n_pad)
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _fwd(x, w, heads):
    return _fused_layer_impl(x, w, heads), (x, w)


def _bwd(heads, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: _unfused_layer(x, w, heads), x, w)
    return vjp(g)


fused_vit_layer.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Attention-half fusion for big trunks (ViT-B / ViT-L / UNI) — VERDICT r2
# item 5. Whole-layer fusion needs qkv+proj+mlp weights in VMEM (ViT-S
# only); here only the ATTENTION half fuses (LN1 -> qkv -> per-image MHA
# -> proj -> layerscale -> +residual, one kernel, g images per program so
# the qkv/proj GEMMs run at M = g*N_pad), and the MLP half stays in XLA —
# which is already at roofline there (BENCH_NOTES "negative result": the
# LN epilogues fuse fine around the big MLP GEMMs; it was the M=N_pad cap
# of per-image programs that made half-layer fusion lose before).
# ---------------------------------------------------------------------------

def _attn_half_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, ls1_ref, o_ref,
                      *, heads: int, n_valid: int, g: int, n_pad: int):
    d = x_ref.shape[-1]
    dh = d // heads
    x = x_ref[:].reshape(g * n_pad, d).astype(jnp.float32)

    y = _ln_f32(x, ln1s_ref[0], ln1b_ref[0]).astype(x_ref.dtype)
    qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(x_ref.dtype)      # [g*N_pad, 3D]

    col2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, dh), 0)
    scale = 1.0 / float(np.sqrt(dh))
    outs = []
    for gi in range(g):
        tok = slice(gi * n_pad, (gi + 1) * n_pad)
        per_head = []
        for hh in range(heads):
            sl = slice(hh * dh, (hh + 1) * dh)
            q_h = qkv[tok, 0 * d:1 * d][:, sl]
            k_h = qkv[tok, 1 * d:2 * d][:, sl]
            v_h = qkv[tok, 2 * d:3 * d][:, sl]
            v_h = jnp.where(row1 < n_valid, v_h, 0)
            s = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(col2 < n_valid, s, -jnp.inf)
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(x_ref.dtype)
            per_head.append(
                jnp.dot(p, v_h, preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(per_head, axis=1))
    o = jnp.concatenate(outs, axis=0).astype(x_ref.dtype)

    attn_out = jnp.dot(o, wproj_ref[:], preferred_element_type=jnp.float32)
    attn_out = (attn_out + bproj_ref[0]) * ls1_ref[0]
    o_ref[:] = (x + attn_out).astype(o_ref.dtype).reshape(g, n_pad, d)


def attn_half_fits(dim: int, n_pad: int, heads: int, g: int = 1,
                   bytes_per_el: int = 2,
                   budget: int = 13 * 2 ** 20) -> bool:
    """VMEM model for the attention-half kernel: qkv+proj weights plus
    one f32 working tensor the width of the qkv accumulator and one f32
    residual lane per token, one per-image score matrix at a time.
    Calibrated on v5e: ViT-B g=2 ≈ 10 MB compiles; UNI (D=1024) g=1
    ≈ 12 MB compiles; g one step higher is rejected by Mosaic.

    ``bytes_per_el`` must match the dtype the kernel will cast the
    weights to (``x.dtype`` — see ``_attn_half_impl``): an f32 caller
    doubles the weight footprint, and under-counting it turns the
    graceful unfused fallback into a hard Mosaic compile failure."""
    weights = dim * 4 * dim * bytes_per_el
    gn = g * n_pad
    acts = gn * 4 * (3 * dim + dim) + n_pad * n_pad * 4
    return weights + acts <= budget


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_vit_attn_half(x, w, heads: int):
    """x: [B, N, D] -> LN1 -> qkv -> MHA -> proj (*ls1) -> +x.

    ``w``: dict with ln1/{scale,bias}, qkv/{kernel,bias},
    proj/{kernel,bias} and optional ls1 (flax layout). The MLP half is
    the caller's (XLA's) job."""
    return _attn_half_impl(x, w, heads)


def _unfused_attn_half(x, w, heads, mha=None):
    """LN1 -> qkv -> MHA -> proj (*ls1) -> +residual outside Pallas.

    ``mha``: optional ``(qkv [B,N,3D], heads) -> o [B,N,D]`` callable
    replacing the einsum MHA (e.g. the packed fused kernel for trunks
    whose qkv+proj weights exceed VMEM — encoders/fast.py); everything
    around it is shared so the two routes cannot drift."""
    f32 = jnp.float32
    y = _ln_f32(x.astype(f32), w["ln1"]["scale"], w["ln1"]["bias"]).astype(x.dtype)
    qkv = y @ w["qkv"]["kernel"] + w["qkv"]["bias"]
    if mha is not None:
        o = mha(qkv.astype(x.dtype), heads).astype(x.dtype)
    else:
        b, n, d = x.shape
        dh = d // heads

        def heads_of(t):
            return t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

        q, k, v = (heads_of(qkv[..., i * d:(i + 1) * d]) for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(f32) / np.sqrt(dh)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(*x.shape)
    attn = (o @ w["proj"]["kernel"] + w["proj"]["bias"]).astype(f32)
    if "ls1" in w:
        attn = attn * w["ls1"]
    return (x.astype(f32) + attn).astype(x.dtype)


def _attn_half_impl(x, w, heads):
    b, n, d = x.shape
    n_pad = _round_up(n, 16)
    bpe = jnp.dtype(x.dtype).itemsize  # kernel casts weights to x.dtype
    g = 1
    for cand in (4, 2):
        if b % cand == 0 and attn_half_fits(d, n_pad, heads, g=cand,
                                            bytes_per_el=bpe):
            g = cand
            break
    if g == 1 and not attn_half_fits(d, n_pad, heads, g=1,
                                     bytes_per_el=bpe):
        return _unfused_attn_half(x, w, heads)

    dt = x.dtype
    x_spec = pl.BlockSpec((g, n_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    vec = lambda v: v.reshape(1, -1)
    ls1 = w.get("ls1")
    ls1 = (jnp.ones((d,), jnp.float32) if ls1 is None
           else ls1.astype(jnp.float32))
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    args = [
        x,
        vec(w["ln1"]["scale"]), vec(w["ln1"]["bias"]),
        w["qkv"]["kernel"].astype(dt), vec(w["qkv"]["bias"]),
        w["proj"]["kernel"].astype(dt), vec(w["proj"]["bias"]),
        vec(ls1),
    ]
    in_specs = [x_spec] + [const(tuple(a.shape)) for a in args[1:]]
    kernel = functools.partial(_attn_half_kernel, heads=heads, n_valid=n,
                               g=g, n_pad=n_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:, :n]


def _ah_fwd(x, w, heads):
    return _attn_half_impl(x, w, heads), (x, w)


def _ah_bwd(heads, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: _unfused_attn_half(x, w, heads), x, w)
    return vjp(g)


fused_vit_attn_half.defvjp(_ah_fwd, _ah_bwd)
