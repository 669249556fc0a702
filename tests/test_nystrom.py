"""Nystrom attention op tests: pinv accuracy, mask correctness, and
approximation quality against exact attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmil_tpu.ops.nystrom import depthwise_seq_conv, newton_schulz_pinv, nystrom_attention


def test_newton_schulz_pinv():
    rs = np.random.RandomState(0)
    # diagonally-dominant row-stochastic matrices (the attn2 regime)
    logits = rs.randn(2, 16, 16) + 3.0 * np.eye(16)
    x = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    z = newton_schulz_pinv(x, iters=12)
    # defining property of the pseudo-inverse: x z x == x
    xzx = np.asarray(x @ z @ x)
    np.testing.assert_allclose(xzx, np.asarray(x), rtol=5e-3, atol=5e-3)


def _rand_qkv(rs, b=1, h=2, n=64, dh=8):
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32) * dh ** -0.5
    k = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    return q, k, v


def test_nystrom_approximates_exact_attention():
    """With landmarks == n/2 on a smooth problem the approximation should
    track exact attention closely."""
    rs = np.random.RandomState(1)
    q, k, v = _rand_qkv(rs, n=64)
    out, _ = nystrom_attention(q, k, v, None, num_landmarks=32)
    exact = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2), axis=-1) @ v
    err = np.abs(np.asarray(out - exact)).mean() / np.abs(np.asarray(exact)).mean()
    assert err < 0.35, err


def test_nystrom_mask_correctness():
    """Garbage values in masked slots must be inert (note: the *grouping*
    of positions into landmarks depends on the padded length, so a masked
    long run is not numerically identical to a short run — but pad values
    must never matter)."""
    rs = np.random.RandomState(2)
    b, h, n_pad, n_valid, dh = 1, 2, 64, 37, 8
    q, k, v = _rand_qkv(rs, b=b, h=h, n=n_pad, dh=dh)
    mask = jnp.arange(n_pad)[None, :] < n_valid

    def with_pads(t, val):
        return jnp.where(mask[:, None, :, None], t, val)

    out_a, _ = nystrom_attention(with_pads(q, 777.0), with_pads(k, 777.0),
                                 with_pads(v, 777.0), mask, num_landmarks=8)
    out_b, _ = nystrom_attention(with_pads(q, -3.5), with_pads(k, -3.5),
                                 with_pads(v, -3.5), mask, num_landmarks=8)
    assert np.all(np.isfinite(np.asarray(out_a)))
    np.testing.assert_allclose(np.asarray(out_a[:, :, :n_valid]),
                               np.asarray(out_b[:, :, :n_valid]),
                               rtol=1e-4, atol=1e-5)


def test_nystrom_fully_masked_group():
    """A landmark group with zero valid patches must not poison outputs."""
    rs = np.random.RandomState(5)
    q, k, v = _rand_qkv(rs, n=64)
    mask = jnp.arange(64)[None, :] < 8   # only group 0 of 8 has any valid
    out, _ = nystrom_attention(q, k, v, mask, num_landmarks=8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_nystrom_attn_rows():
    rs = np.random.RandomState(3)
    q, k, v = _rand_qkv(rs, n=32)
    out, rows = nystrom_attention(q, k, v, None, num_landmarks=8,
                                  return_attn_rows=1)
    assert rows.shape == (1, 1, 32)
    # reconstructed attention row should approximately sum to 1
    np.testing.assert_allclose(np.asarray(rows.sum(-1)), 1.0, atol=0.2)


def test_depthwise_seq_conv_shape():
    rs = np.random.RandomState(4)
    v = jnp.asarray(rs.randn(2, 3, 16, 8), jnp.float32)
    w = jnp.asarray(rs.randn(3, 5), jnp.float32)
    out = depthwise_seq_conv(v, w)
    assert out.shape == v.shape
    # head 0 output depends only on head 0 input
    v2 = v.at[:, 1:].set(0.0)
    out2 = depthwise_seq_conv(v2, w)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]),
                               rtol=1e-5)


@pytest.mark.slow  # 8-device shard_map equivalence; core Nystrom units stay fast
def test_sharded_nystrom_matches_single_device():
    """Sequence-sharded Nystrom must equal the single-device op (nothing
    approximated: landmark stats all-gather, attn3 uses global max/sum)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.ops.nystrom import nystrom_attention, sharded_nystrom_attention
    from acmil_tpu.parallel import make_mesh

    rs = np.random.RandomState(0)
    b, h, n, dh, m = 2, 4, 256, 16, 32
    q = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32) * 0.3
    k = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32) * 0.3
    v = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.85)

    ref, _ = nystrom_attention(q, k, v, mask, num_landmarks=m)
    mesh = make_mesh(data=2, seq=4)
    out = sharded_nystrom_attention(q, k, v, mask, mesh, num_landmarks=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    # unmasked path
    ref_u, _ = nystrom_attention(q, k, v, None, num_landmarks=m)
    out_u = sharded_nystrom_attention(q, k, v, None, mesh, num_landmarks=m)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u),
                               rtol=2e-4, atol=2e-5)


def test_sharded_depthwise_conv_matches_single_device():
    import jax.numpy as jnp

    from acmil_tpu.ops.nystrom import depthwise_seq_conv, sharded_depthwise_seq_conv
    from acmil_tpu.parallel import make_mesh

    rs = np.random.RandomState(1)
    b, h, n, dh = 2, 4, 256, 16
    v = jnp.asarray(rs.randn(b, h, n, dh), jnp.float32)
    w = jnp.asarray(rs.randn(h, 33) * 0.1, jnp.float32)
    ref = depthwise_seq_conv(v, w)
    mesh = make_mesh(data=2, seq=4)
    out = sharded_depthwise_seq_conv(v, w, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
