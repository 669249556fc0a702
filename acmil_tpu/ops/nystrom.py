"""Masked Nystrom attention — landmark-based O(N·m) attention.

Reference: `architecture/nystrom_attention.py:30-149` (vendored
nystrom-attention 0.0.12). Mechanics: sum-reduce the sequence into ``m``
landmark groups, build three softmax similarity matrices
(q·kL, qL·kL, qL·k), invert the middle one with 6 Newton–Schulz
iterations, and compose ``attn1 @ pinv(attn2) @ (attn3 @ v)`` — plus a
depthwise conv residual over values.

The reference's masked branch is dead code with a NameError
(`nystrom_attention.py:124-126` uses undefined ``sim1``); this
implementation does masked landmark means and masked softmax correctly
(SURVEY.md §7 hard-parts list):

- masked q/k/v are zeroed so landmark sums only see valid patches;
  landmark means divide by the per-group valid count;
- similarity logits to/from invalid landmarks or positions are -1e9;
- fully-invalid landmark rows of attn2 are replaced by identity rows so
  the Newton–Schulz inverse stays well-conditioned; those landmarks get
  zero weight from attn1's masked softmax anyway.

Everything is static-shape: m divides the (front-padded) sequence length,
padding is prepended like the reference does (`nystrom_attention.py:73-79`)
so ``out[:, -n:]`` recovers the original sequence.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from acmil_tpu.ops.masked import masked_softmax


def newton_schulz_pinv(x: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Moore-Penrose pseudo-inverse by the cubic Newton iteration used by
    Nystromformer (`nystrom_attention.py:12-27`). Runs in f32 regardless of
    input dtype — the iteration is numerically touchy in bf16, and the
    m x m matrices are tiny."""
    x = x.astype(jnp.float32)
    abs_x = jnp.abs(x)
    col = abs_x.sum(axis=-1)
    row = abs_x.sum(axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (
        jnp.max(col, axis=-1, keepdims=True)[..., None]
        * jnp.max(row, axis=-1, keepdims=True)[..., None]
    )
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)

    def body(_, z):
        xz = x @ z
        return 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))

    return jax.lax.fori_loop(0, iters, body, z)


def nystrom_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_landmarks: int,
    pinv_iterations: int = 6,
    return_attn_rows: int = 0,
    attn_row_offset: int = 0,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Core masked Nystrom attention over pre-projected heads.

    Args:
      q, k, v: ``[B, H, N, Dh]`` (q already scaled). N % num_landmarks == 0.
      mask: ``[B, N]`` bool or None.
      return_attn_rows: if > 0, also reconstruct the full attention rows for
        ``r`` queries starting at ``attn_row_offset`` (the cls/branch
        tokens), head-averaged — `nystrom_attention.py:143-147`. The offset
        fixes the reference's latent bug of reading the front-pad rows
        instead of the cls token when the sequence was padded.

    Returns (out [B, H, N, Dh], attn_rows [B, r, N] | None).
    """
    b, h, n, dh = q.shape
    m = num_landmarks
    assert n % m == 0, f"sequence {n} not divisible by landmarks {m}"
    l = n // m

    if mask is not None:
        mk = mask[:, None, :, None].astype(q.dtype)             # [B,1,N,1]
        q = q * mk
        k = k * mk
        v = v * mk

    # landmark means (masked)
    q_l = q.reshape(b, h, m, l, dh).sum(axis=3)
    k_l = k.reshape(b, h, m, l, dh).sum(axis=3)
    if mask is not None:
        counts = mask.reshape(b, m, l).sum(axis=-1)             # [B, m]
        divisor = counts[:, None, :, None].astype(q.dtype) + eps
        lm_valid = counts > 0                                    # [B, m]
    else:
        divisor = jnp.asarray(float(l), q.dtype)
        lm_valid = None
    q_l = q_l / divisor
    k_l = k_l / divisor

    sim1 = jnp.einsum("bhnd,bhmd->bhnm", q, k_l)
    sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)
    sim3 = jnp.einsum("bhmd,bhnd->bhmn", q_l, k)

    if mask is not None:
        pos = mask[:, None, :]                                   # [B,1,N]
        lm = lm_valid[:, None, :]                                # [B,1,m]
        attn1 = masked_softmax(sim1, lm[:, :, None, :])          # cols: landmarks
        attn2 = masked_softmax(sim2, lm[:, :, None, :])
        attn3 = masked_softmax(sim3, pos[:, :, None, :])         # cols: positions
        # zero rows for invalid queries/landmarks
        attn1 = attn1 * pos[..., None].astype(q.dtype)
        attn3 = attn3 * lm[..., None].astype(q.dtype)
        # identity rows for invalid landmarks keep attn2 invertible
        eye = jnp.eye(m, dtype=q.dtype)
        lm_row = lm[..., None].astype(q.dtype)                   # [B,1,m,1]
        attn2 = attn2 * lm_row + eye * (1.0 - lm_row)
    else:
        attn1 = jax.nn.softmax(sim1, axis=-1)
        attn2 = jax.nn.softmax(sim2, axis=-1)
        attn3 = jax.nn.softmax(sim3, axis=-1)

    attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)
    out = (attn1 @ attn2_inv) @ (attn3 @ v)                      # [B,H,N,Dh]

    attn_rows = None
    if return_attn_rows > 0:
        r, off = return_attn_rows, attn_row_offset
        rows = (attn1[:, :, off:off + r] @ attn2_inv) @ attn3    # [B,H,r,N]
        attn_rows = rows.mean(axis=1)
    return out, attn_rows


def sharded_nystrom_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    mesh,
    num_landmarks: int,
    seq_axis: str = "seq",
    pinv_iterations: int = 6,
    eps: float = 1e-8,
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-sharded masked Nystrom attention for mega-bags.

    The patch axis N is sharded over ``seq_axis`` (S devices); landmarks
    partition with it (``num_landmarks % S == 0``, same contiguous
    grouping as :func:`nystrom_attention`), so the result equals the
    single-device op up to f32 summation order — nothing is approximated.
    Communication per layer is O(H·m·Dh) bytes, independent of N:

    - landmark means ``q_l``/``k_l`` (tiny, [B,H,m/S,Dh]) all-gather;
    - ``attn2``/its pseudo-inverse replicate (m x m, computed everywhere);
    - ``attn1`` rows are local (softmax over the gathered landmark axis);
    - ``attn3``'s softmax runs over the *sharded* position axis: global
      row max via pmax, global denominator and the ``attn3 @ v``
      contraction via one psum of the [B,H,m,Dh] partial products.

    q, k, v: [B, H, N, Dh] sharded P(data_axis, None, seq_axis, None);
    mask: [B, N] sharded P(data_axis, seq_axis) or None. ``data_axis``
    additionally shards the batch axis (each data-shard runs the same
    collectives over its seq sub-axis). Returns out with q's sharding.
    Attention-row extraction (heatmaps) is single-device-only.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    s = mesh.shape[seq_axis]
    m = num_landmarks
    assert m % s == 0, f"landmarks {m} not divisible by seq shards {s}"
    da = data_axis

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(da, None, seq_axis, None),) * 3
        + ((P(da, seq_axis),) if mask is not None else (P(),)),
        out_specs=P(da, None, seq_axis, None),
        check_vma=False,
    )
    def run(q, k, v, mask_l):
        b, h, n_loc, dh = q.shape
        m_loc = m // s
        assert n_loc % m_loc == 0, (n_loc, m_loc)
        l = n_loc // m_loc
        NEG = -1e9

        if mask is not None:
            mk = mask_l[:, None, :, None].astype(q.dtype)
            q_, k_, v_ = q * mk, k * mk, v * mk
        else:
            q_, k_, v_ = q, k, v

        q_l = q_.reshape(b, h, m_loc, l, dh).sum(axis=3)
        k_l = k_.reshape(b, h, m_loc, l, dh).sum(axis=3)
        if mask is not None:
            counts = mask_l.reshape(b, m_loc, l).sum(axis=-1)    # [B, m/S]
            divisor = counts[:, None, :, None].astype(q.dtype) + eps
            lmv_loc = counts > 0
        else:
            divisor = jnp.asarray(float(l), q.dtype)
            lmv_loc = jnp.ones((b, m_loc), bool)
        q_l = q_l / divisor
        k_l = k_l / divisor

        # gather the landmark stats (tiny): [B, H, m, Dh] everywhere
        q_lg = jax.lax.all_gather(q_l, seq_axis, axis=2, tiled=True)
        k_lg = jax.lax.all_gather(k_l, seq_axis, axis=2, tiled=True)
        lmv = jax.lax.all_gather(lmv_loc, seq_axis, axis=1, tiled=True)

        lm_cols = lmv[:, None, None, :]                          # [B,1,1,m]
        # attn1: local query rows over all m landmarks (local softmax)
        sim1 = jnp.einsum("bhnd,bhmd->bhnm", q_, k_lg)
        attn1 = masked_softmax(sim1, lm_cols)
        if mask is not None:
            attn1 = attn1 * mask_l[:, None, :, None].astype(q.dtype)

        # attn2 + pinv: replicated m x m compute
        sim2 = jnp.einsum("bhid,bhjd->bhij", q_lg, k_lg)
        attn2 = masked_softmax(sim2, lm_cols)
        lm_row = lmv[:, None, :, None].astype(q.dtype)
        eye = jnp.eye(m, dtype=q.dtype)
        attn2 = attn2 * lm_row + eye * (1.0 - lm_row)
        attn2_inv = newton_schulz_pinv(attn2, pinv_iterations)

        # attn3: softmax over the SHARDED position axis — flash-style
        # global max + global denominator, then one psum of the partial
        # [m, Dh] products
        sim3 = jnp.einsum("bhmd,bhnd->bhmn", q_lg, k_)
        if mask is not None:
            sim3 = jnp.where(mask_l[:, None, None, :], sim3, NEG)
        # stop_gradient on the OPERAND: the max is only a stabiliser
        # (gradient-neutral), and pmax has no differentiation rule — a
        # zero tangent in lets the JVP skip the primitive entirely
        row_max = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(sim3, axis=-1, keepdims=True)),
            seq_axis)
        p3 = jnp.exp(sim3 - row_max)
        if mask is not None:
            p3 = jnp.where(mask_l[:, None, None, :], p3, 0.0)
        denom = jax.lax.psum(jnp.sum(p3, axis=-1, keepdims=True), seq_axis)
        pv = jax.lax.psum(jnp.einsum("bhmn,bhnd->bhmd", p3, v_), seq_axis)
        attn3_v = pv / jnp.maximum(denom, eps)
        attn3_v = attn3_v * lm_row                               # invalid lms

        out = (attn1 @ attn2_inv) @ attn3_v.astype(q.dtype)      # [B,H,n_loc,Dh]
        return out

    args = (q, k, v, mask if mask is not None else jnp.zeros((), q.dtype))
    return run(*args)


def sharded_depthwise_seq_conv(v: jnp.ndarray, w: jnp.ndarray, mesh,
                               seq_axis: str = "seq",
                               data_axis: Optional[str] = None) -> jnp.ndarray:
    """Sequence-sharded value-residual conv: halo-exchange ``ksize // 2``
    positions with each neighbour via ppermute, zero halos at the ends
    (matching :func:`depthwise_seq_conv`'s zero padding)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    s = mesh.shape[seq_axis]
    h, ksize = w.shape
    pad = ksize // 2
    da = data_axis

    @partial(shard_map, mesh=mesh,
             in_specs=(P(da, None, seq_axis, None), P()),
             out_specs=P(da, None, seq_axis, None), check_vma=False)
    def run(v_loc, w_):
        idx = jax.lax.axis_index(seq_axis)
        assert v_loc.shape[2] >= pad, "shard shorter than the conv halo"
        right_edge = v_loc[:, :, -pad:]                  # goes to i+1's left
        left_edge = v_loc[:, :, :pad]                    # goes to i-1's right
        from_left = jax.lax.ppermute(
            right_edge, seq_axis, [(i, (i + 1) % s) for i in range(s)])
        from_right = jax.lax.ppermute(
            left_edge, seq_axis, [(i, (i - 1) % s) for i in range(s)])
        from_left = jnp.where(idx == 0, 0.0, from_left)
        from_right = jnp.where(idx == s - 1, 0.0, from_right)
        ext = jnp.concatenate([from_left, v_loc, from_right], axis=2)
        kernel = w_[:, None, :, None]                    # [H,1,k,1] OIHW
        out = jax.lax.conv_general_dilated(
            ext, kernel.astype(ext.dtype), window_strides=(1, 1),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=h)
        return out

    return run(v, w)


def depthwise_seq_conv(v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-head depthwise conv along the sequence axis — the value residual
    (`nystrom_attention.py:61-65`, Conv2d(heads, heads, (k,1), groups=heads)).

    v: [B, H, N, Dh]; w: [H, ksize]. Output same shape as v.
    """
    h, ksize = w.shape
    pad = ksize // 2
    kernel = w[:, None, :, None]                                 # [H, 1, k, 1] OIHW
    return jax.lax.conv_general_dilated(
        v, kernel.astype(v.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=h,
    )
