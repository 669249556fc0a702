"""Fused attention-pooling kernel vs jnp reference (interpret mode on CPU)
and vs the flax models."""

import jax
import jax.numpy as jnp
import numpy as np

from acmil_tpu.models.acmil import ABMIL, ACMIL_GA
from acmil_tpu.models.fast import abmil_infer, acmil_ga_infer
from acmil_tpu.ops.attn_pool import fused_gated_attn_pool, gated_attn_pool_reference


def _weights(rs, df=64, l=32, a=32, k=5):
    return (
        jnp.asarray(rs.randn(df, l) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(l, a) * 0.2, jnp.float32),
        jnp.asarray(rs.randn(a) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(l, a) * 0.2, jnp.float32),
        jnp.asarray(rs.randn(a) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(a, k) * 0.3, jnp.float32),
        jnp.asarray(rs.randn(k) * 0.1, jnp.float32),
    )


def test_kernel_matches_reference():
    rs = np.random.RandomState(0)
    n, df = 512, 64
    feats = jnp.asarray(rs.randn(n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(n) < 0.8)
    w1, v, bv, u, bu, w, bw = _weights(rs, df=df)
    bag, logits = fused_gated_attn_pool(feats, mask, w1, v, bv, u, bu, w, bw,
                                        chunk=128, interpret=True)
    bag_r, logits_r = gated_attn_pool_reference(feats, mask, w1, v, bv, u, bu, w, bw)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(logits)[:, m], np.asarray(logits_r)[m].T,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bag), np.asarray(bag_r),
                               rtol=1e-4, atol=1e-4)


def test_kernel_multi_chunk_online_softmax():
    """Online softmax across chunks must equal single-chunk softmax."""
    rs = np.random.RandomState(1)
    n, df = 1024, 32
    feats = jnp.asarray(rs.randn(n, df) * 3.0, jnp.float32)  # wide logit range
    mask = jnp.ones(n, bool)
    ws = _weights(rs, df=df, k=3)
    bag_1, _ = fused_gated_attn_pool(feats, mask, *ws, chunk=1024, interpret=True)
    bag_8, _ = fused_gated_attn_pool(feats, mask, *ws, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(bag_1), np.asarray(bag_8),
                               rtol=1e-4, atol=1e-4)


def test_acmil_ga_fast_path_matches_model():
    rs = np.random.RandomState(2)
    n, df = 256, 48
    model = ACMIL_GA(n_class=2, d_inner=16, d_attn=16, n_token=4)
    feats = jnp.asarray(rs.randn(1, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(1, n) < 0.9)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, mask)
    sub_m, slide_m, attn_m = model.apply(variables, feats, mask, deterministic=True)
    sub_f, slide_f, attn_f = acmil_ga_infer(variables["params"], feats[0], mask[0],
                                            chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(sub_f), np.asarray(sub_m[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(slide_f), np.asarray(slide_m[0]),
                               rtol=2e-3, atol=2e-3)
    valid = np.asarray(mask[0])
    np.testing.assert_allclose(np.asarray(attn_f)[:, valid],
                               np.asarray(attn_m[0])[:, valid],
                               rtol=2e-3, atol=2e-3)


def test_abmil_fast_path_matches_model():
    rs = np.random.RandomState(3)
    n, df = 256, 48
    model = ABMIL(n_class=3, d_inner=16, d_attn=16)
    feats = jnp.asarray(rs.randn(1, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(1, n) < 0.9)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, mask)
    logits_m = model.apply(variables, feats, mask, deterministic=True)
    logits_f, _ = abmil_infer(variables["params"], feats[0], mask[0],
                              chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_m[0]),
                               rtol=2e-3, atol=2e-3)


def test_batched_kernel_matches_per_bag():
    from acmil_tpu.ops.attn_pool import fused_gated_attn_pool_batched

    rs = np.random.RandomState(5)
    b, n, df = 3, 256, 64
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.8)
    ws = _weights(rs, df=df, k=4)
    bag_b, log_b = fused_gated_attn_pool_batched(feats, mask, *ws, chunk=128,
                                                 interpret=True)
    for i in range(b):
        bag_1, log_1 = fused_gated_attn_pool(feats[i], mask[i], *ws,
                                             chunk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(bag_b[i]), np.asarray(bag_1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(log_b[i]), np.asarray(log_1),
                                   rtol=1e-5, atol=1e-6)
