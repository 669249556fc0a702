"""Unit tests for the masked numerics substrate (acmil_tpu/ops/masked.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from acmil_tpu.ops.masked import (
    masked_mean,
    masked_max,
    masked_softmax,
    masked_topk_mask,
    softmax_one,
    stkim_mask,
)


def test_masked_softmax_zeroes_pads():
    logits = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.array([[True, True, False, True]])
    p = masked_softmax(logits, mask)
    assert p[0, 2] == 0.0
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    # equals plain softmax over the valid subset
    ref = jax.nn.softmax(jnp.array([1.0, 2.0, 4.0]))
    np.testing.assert_allclose(np.asarray(p[0, [0, 1, 3]]), np.asarray(ref), rtol=1e-6)


def test_masked_softmax_fully_masked_row_is_zero():
    logits = jnp.ones((2, 4))
    mask = jnp.array([[True] * 4, [False] * 4])
    p = masked_softmax(logits, mask)
    assert not np.any(np.isnan(np.asarray(p)))
    np.testing.assert_allclose(np.asarray(p[1]), 0.0)


def test_softmax_one_denominator():
    logits = jnp.array([[0.0, 0.0]])
    p = softmax_one(logits)
    # exp(0)/(1+2) each
    np.testing.assert_allclose(np.asarray(p), np.full((1, 2), 1 / 3), rtol=1e-6)


def test_softmax_one_masked():
    logits = jnp.array([[0.0, 100.0, 0.0]])
    mask = jnp.array([[True, False, True]])
    p = softmax_one(logits, mask)
    np.testing.assert_allclose(np.asarray(p), [[1 / 3, 0.0, 1 / 3]], rtol=1e-5)


def test_masked_topk_mask():
    scores = jnp.array([[5.0, 1.0, 9.0, 3.0, 7.0]])
    mask = jnp.array([[True, True, False, True, True]])
    sel = masked_topk_mask(scores, 2, mask)
    # 9.0 is masked, so top-2 = {7.0, 5.0}
    np.testing.assert_array_equal(np.asarray(sel[0]), [True, False, False, False, True])


def test_stkim_mask_drops_subset_of_topk():
    rng = jax.random.PRNGKey(1)
    a = jnp.arange(20.0).reshape(1, 1, 20)
    out = stkim_mask(rng, a, n_masked_patch=8, mask_drop=0.5)
    dropped = np.asarray(out[0, 0] <= -1e8)
    assert dropped.sum() == 4  # floor(8 * 0.5)
    # only drops among the top-8 (indices 12..19)
    assert not dropped[:12].any()


def test_stkim_mask_respects_validity_mask():
    rng = jax.random.PRNGKey(2)
    a = jnp.arange(20.0).reshape(1, 1, 20)
    valid = jnp.ones((1, 1, 20), bool).at[0, 0, 15:].set(False)
    out = stkim_mask(rng, a, n_masked_patch=4, mask_drop=1.0, mask=valid)
    dropped = np.asarray(out[0, 0] <= -1e8)
    assert dropped.sum() == 4
    # top-4 of *valid* entries = indices 11..14
    assert dropped[11:15].all()


def test_stkim_noop_when_disabled():
    rng = jax.random.PRNGKey(0)
    a = jnp.ones((2, 3, 10))
    np.testing.assert_array_equal(
        np.asarray(stkim_mask(rng, a, 0, 0.5)), np.asarray(a))
    np.testing.assert_array_equal(
        np.asarray(stkim_mask(rng, a, 5, 0.0)), np.asarray(a))


def test_masked_mean_max():
    x = jnp.array([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
    mask = jnp.array([[True, True, False]])
    np.testing.assert_allclose(np.asarray(masked_mean(x, mask)), [[2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(masked_max(x, mask)), [[3.0, 4.0]])


def test_stkim_clamps_to_valid_count():
    """A bag with fewer valid patches than n_masked_patch must drop
    floor(n_valid * mask_drop), not floor(n_masked_patch * mask_drop)
    (`transformer.py:313`: n_masked_patch = min(conf, n))."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.ops.masked import NEG_INF, stkim_mask

    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(
        np.random.RandomState(0).randn(1, 2, 256), jnp.float32)
    mask = jnp.zeros((1, 1, 256), bool).at[:, :, :3].set(True)  # 3 valid

    out = stkim_mask(rng, logits, n_masked_patch=10, mask_drop=0.6, mask=mask)
    dropped = (out <= NEG_INF / 2) & np.asarray(mask)
    # floor(min(10, 3) * 0.6) = 1 per branch — never all 3
    per_branch = np.asarray(dropped.sum(axis=-1))[0]
    assert (per_branch == 1).all(), per_branch

    # plenty of valid patches: full static drop count applies
    mask_full = jnp.ones((1, 1, 256), bool)
    out2 = stkim_mask(rng, logits, n_masked_patch=10, mask_drop=0.6,
                      mask=mask_full)
    per_branch2 = np.asarray(((out2 <= NEG_INF / 2).sum(axis=-1)))[0]
    assert (per_branch2 == 6).all(), per_branch2
