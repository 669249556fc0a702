"""Model-zoo tests: shapes, mask invariance, STKIM behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmil_tpu.models.acmil import ABMIL, ACMIL_GA, ACMIL_MHA, MHA


def _init_and_apply(model, feats, mask, **kw):
    rngs = {"params": jax.random.PRNGKey(0), "stkim": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, feats, mask)
    return variables, model.apply(variables, feats, mask,
                                  rngs={"stkim": jax.random.PRNGKey(3),
                                        "dropout": jax.random.PRNGKey(4)}, **kw)


def test_abmil_shapes():
    model = ABMIL(n_class=2, d_inner=16)
    feats = jnp.ones((3, 64, 32))
    mask = jnp.ones((3, 64), bool)
    _, logits = _init_and_apply(model, feats, mask)
    assert logits.shape == (3, 2)


@pytest.mark.parametrize("cls,kw", [
    (ACMIL_GA, dict(n_class=2, d_inner=16, n_token=4, n_masked_patch=6, mask_drop=0.5)),
    (ACMIL_MHA, dict(n_class=2, d_inner=16, n_token=4, num_heads=4,
                     n_masked_patch=6, mask_drop=0.5)),
])
def test_acmil_shapes(cls, kw):
    model = cls(**kw)
    feats = jnp.ones((2, 64, 32))
    mask = jnp.ones((2, 64), bool)
    _, (sub, slide, attn) = _init_and_apply(model, feats, mask)
    assert sub.shape == (2, 4, 2)
    assert slide.shape == (2, 2)
    assert attn.shape[-1] == 64
    assert attn.shape[0] == 2


def test_mha_shapes():
    model = MHA(n_class=3, d_inner=16, num_heads=4)
    feats = jnp.ones((2, 32, 32))
    mask = jnp.ones((2, 32), bool)
    _, logits = _init_and_apply(model, feats, mask)
    assert logits.shape == (2, 3)


@pytest.mark.parametrize("cls,kw", [
    (ABMIL, dict(n_class=2, d_inner=16)),
    (ACMIL_GA, dict(n_class=2, d_inner=16, n_token=3)),
    (ACMIL_MHA, dict(n_class=2, d_inner=16, n_token=3, num_heads=4)),
    (MHA, dict(n_class=2, d_inner=16, num_heads=4)),
])
def test_padding_invariance(cls, kw):
    """A bag padded to a larger bucket must give identical outputs — the
    core correctness property of the masked TPU formulation."""
    rs = np.random.RandomState(0)
    n, d = 50, 32
    feats = rs.randn(1, n, d).astype(np.float32)

    small = jnp.zeros((1, 64, d)).at[:, :n].set(feats)
    small_mask = jnp.zeros((1, 64), bool).at[:, :n].set(True)
    big = jnp.zeros((1, 256, d)).at[:, :n].set(feats)
    big_mask = jnp.zeros((1, 256), bool).at[:, :n].set(True)

    model = cls(**kw)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "stkim": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, small, small_mask)

    out_s = model.apply(variables, small, small_mask, deterministic=True)
    out_b = model.apply(variables, big, big_mask, deterministic=True)

    s_logits = out_s[1] if isinstance(out_s, tuple) else out_s
    b_logits = out_b[1] if isinstance(out_b, tuple) else out_b
    np.testing.assert_allclose(np.asarray(s_logits), np.asarray(b_logits),
                               rtol=2e-4, atol=2e-5)


def test_acmil_ga_stkim_changes_training_attention():
    model = ACMIL_GA(n_class=2, d_inner=16, n_token=2, n_masked_patch=10, mask_drop=0.8)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 128, 32), jnp.float32)
    mask = jnp.ones((1, 128), bool)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "stkim": jax.random.PRNGKey(1)},
        feats, mask)
    _, _, a_train = model.apply(variables, feats, mask, deterministic=False,
                                rngs={"stkim": jax.random.PRNGKey(7)})
    _, _, a_eval = model.apply(variables, feats, mask, deterministic=True)
    n_dropped = int(np.sum(np.asarray(a_train) <= -1e8))
    assert n_dropped == 2 * 8  # 2 branches x floor(10*0.8)
    assert not np.any(np.asarray(a_eval) <= -1e8)


def test_batched_equals_single():
    """Batching bags must match running them one-by-one."""
    rs = np.random.RandomState(3)
    model = ACMIL_GA(n_class=2, d_inner=16, n_token=2)
    f1 = rs.randn(1, 64, 32).astype(np.float32)
    f2 = rs.randn(1, 64, 32).astype(np.float32)
    batch = jnp.concatenate([jnp.asarray(f1), jnp.asarray(f2)])
    mask = jnp.ones((2, 64), bool)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, mask)

    _, s_batch, _ = model.apply(variables, batch, mask, deterministic=True)
    _, s1, _ = model.apply(variables, jnp.asarray(f1), mask[:1], deterministic=True)
    _, s2, _ = model.apply(variables, jnp.asarray(f2), mask[:1], deterministic=True)
    # CPU/oneDNN picks different matmul tilings per batch size; assert
    # semantic equality, not bitwise.
    np.testing.assert_allclose(np.asarray(s_batch),
                               np.concatenate([s1, s2]), rtol=1e-2, atol=1e-3)
