"""Zoo-wide tests: every registered head builds, runs, respects masks, and
trains (loss decreases when overfitting one batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmil_tpu.data.bags import Bag
from acmil_tpu.engine.train import create_train_state, make_train_step, make_eval_step
from acmil_tpu.models import available_archs, build_mil_model


def _make_bag(rs, b=2, n=64, d=32, n_valid=(50, 37)):
    feats = rs.randn(b, n, d).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i, nv in enumerate(n_valid):
        mask[i, :nv] = True
    coords = rs.randint(0, 10000, (b, n, 2)).astype(np.int32)
    labels = np.arange(b) % 2
    return Bag(feats=jnp.asarray(feats), mask=jnp.asarray(mask),
               coords=jnp.asarray(coords), label=jnp.asarray(labels, jnp.int32))


ARCHS = ["abmil", "ga", "mha", "mha_single", "clam_sb", "clam_mb", "dsmil",
         "meanmil", "maxmil", "transmil", "dtfd", "ibmil", "bmil_vis",
         "bmil_enc", "bmil_spvis", "ilra", "mhim", "pure", "attmil",
         "attmil_gated", "lbmil", "ips"]


def _build(arch, tiny_conf):
    tiny_conf.arch = arch
    return build_mil_model(tiny_conf)


@pytest.mark.parametrize("arch", ARCHS)
def test_registered_and_forward(arch, tiny_conf):
    model, family = _build(arch, tiny_conf)
    assert arch in available_archs()
    rs = np.random.RandomState(0)
    bag = _make_bag(rs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, bag.feats, bag.mask)
    out = model.apply(variables, bag.feats, bag.mask, deterministic=True)
    flat = jax.tree_util.tree_leaves(out)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


@pytest.mark.parametrize("arch", ARCHS)
def test_masked_slots_are_inert(arch, tiny_conf):
    """Garbage written into padded slots must not change any output — the
    universal mask-correctness property for every head."""
    model, family = _build(arch, tiny_conf)
    rs = np.random.RandomState(1)
    bag = _make_bag(rs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, bag.feats, bag.mask)

    garbage = np.asarray(bag.feats).copy()
    garbage[~np.asarray(bag.mask)] = 1e3 * rs.randn(
        int((~np.asarray(bag.mask)).sum()), garbage.shape[-1])

    out_a = model.apply(variables, bag.feats, bag.mask, deterministic=True)
    out_b = model.apply(variables, jnp.asarray(garbage), bag.mask, deterministic=True)
    n = bag.feats.shape[1]
    mask_np = np.asarray(bag.mask)
    for xa, xb in zip(jax.tree_util.tree_leaves(out_a), jax.tree_util.tree_leaves(out_b)):
        xa, xb = np.asarray(xa), np.asarray(xb)
        # per-patch outputs (raw attn logits, instance logits) are only
        # meaningful at valid positions — masked entries get -1e9/zeroed
        # downstream, so restrict the comparison to valid slots there.
        if xa.ndim >= 2 and xa.shape[-1] == n:
            sel = np.broadcast_to(mask_np.reshape(
                mask_np.shape[0], *([1] * (xa.ndim - 2)), n), xa.shape)
            xa, xb = xa[sel], xb[sel]
        elif xa.ndim >= 2 and xa.shape[1] == n and xa.shape[0] == mask_np.shape[0]:
            xa, xb = xa[mask_np], xb[mask_np]
        np.testing.assert_allclose(xa, xb, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("arch", ARCHS)
def test_grads_finite_on_zero_padded_bags(arch, tiny_conf):
    """One real (stochastic) train step on a bag padded the way the loader
    pads — zero feats in masked slots — must produce finite loss and
    updates. Regression for the r5 BMIL NaN: LinearVDO's sampled variance
    is x²@(αw²+ε), exactly 0 for an all-zero row (zero-init biases), and
    sqrt'(0)=inf poisoned the whole backward even though the padded rows'
    cotangents were zero (the reference never pads so never hits this,
    `linear_vdo.py:42-48`)."""
    model, family = _build(arch, tiny_conf)
    rs = np.random.RandomState(2)
    bag = _make_bag(rs)
    feats = np.asarray(bag.feats).copy()
    feats[~np.asarray(bag.mask)] = 0.0        # the loader's real padding
    bag = Bag(feats=jnp.asarray(feats), mask=bag.mask, coords=bag.coords,
              label=bag.label)
    rng = jax.random.PRNGKey(3)
    state = create_train_state(model, tiny_conf, rng, bag, 4, family=family)
    step = make_train_step(model, tiny_conf, family)
    state, aux = step(state, bag, rng)
    assert np.isfinite(float(aux["loss"])), aux
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("arch", [
    "clam_sb", "clam_mb", "dsmil",
    pytest.param("transmil", marks=pytest.mark.slow),   # 45s+: Nystrom
    "meanmil", "dtfd", "ibmil", "bmil_spvis", "ilra",
    pytest.param("mhim", marks=pytest.mark.slow),       # 110s: EMA 2-model
    "lbmil", "ips"])
def test_overfit_one_batch(arch, tiny_conf):
    tiny_conf.arch = arch
    tiny_conf.lr = 1e-3
    tiny_conf.train_epoch = 1
    model, family = build_mil_model(tiny_conf)
    rs = np.random.RandomState(2)
    bag = _make_bag(rs, b=4, n=64, d=32, n_valid=(50, 37, 64, 20))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, tiny_conf, rng, bag, steps_per_epoch=50,
                               family=family)
    step = make_train_step(model, tiny_conf, family)
    first = None
    for _ in range(40):
        state, aux = step(state, bag, rng)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)

    eval_step = make_eval_step(model, family)
    probs = eval_step(state.params, bag)
    assert probs.shape == (4, tiny_conf.n_class)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)


def test_clam_instance_loss_present(tiny_conf):
    model, family = _build("clam_sb", tiny_conf)
    assert family == "clam"
    rs = np.random.RandomState(3)
    bag = _make_bag(rs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, bag.feats, bag.mask)
    out = model.apply(variables, bag.feats, bag.mask, label=bag.label,
                      instance_eval=True, deterministic=True)
    assert "instance_loss" in out and np.isfinite(float(out["instance_loss"]))
    assert out["logits"].shape == (2, 2)


def test_dsmil_outputs(tiny_conf):
    model, family = _build("dsmil", tiny_conf)
    assert family == "dsmil"
    rs = np.random.RandomState(4)
    bag = _make_bag(rs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, bag.feats, bag.mask)
    inst, bag_logits, attn = model.apply(variables, bag.feats, bag.mask,
                                         deterministic=True)
    assert inst.shape == (2, 64, 2)
    assert bag_logits.shape == (2, 2)
    assert attn.shape == (2, 2, 64)


@pytest.mark.slow  # dual-precision TransMIL compile; f32 forward coverage stays fast
def test_transmil_bf16_matches_f32(tiny_conf):
    """The bf16 inference path must track f32 logits closely."""
    import jax.numpy as jnp

    from acmil_tpu.models.transmil import TransMIL

    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(1, 256, 32), jnp.float32)
    mask = jnp.asarray(np.arange(256)[None] < 200)
    m32 = TransMIL(n_class=2, d_inner=64, dtype=jnp.float32)
    v = m32.init({"params": jax.random.PRNGKey(0)}, feats, mask)
    m16 = TransMIL(n_class=2, d_inner=64, dtype=jnp.bfloat16)
    out32 = m32.apply(v, feats, mask, deterministic=True)
    out16 = m16.apply(v, feats, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.1, atol=0.05)


def test_mhim_wrap_mode_padded_bags_stay_mask_correct():
    """pad_mode='wrap' serves imported torch checkpoints with
    reference-exact numerics at natural length; under bucket padding it
    must still honour the mask invariant — the PPEG wrap runs modulo the
    per-bag VALID count (duplicating leading valid patches like the
    reference's torch.cat), never reading pad slots (code-review r5)."""
    from acmil_tpu.models.mhim import MHIM

    n, nb, d, dim = 200, 256, 32, 64
    fm = MHIM(n_class=2, mlp_dim=dim, baseline="selfattn", act="relu",
              droprate=0.0, pad_mode="wrap")
    rs = np.random.RandomState(0)
    x = rs.randn(1, n, d).astype(np.float32)
    params = fm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                     jnp.ones((1, n), bool))["params"]

    xp = np.zeros((1, nb, d), np.float32)
    xp[:, :n] = x
    mk = np.zeros((1, nb), bool)
    mk[:, :n] = True
    pad = fm.apply({"params": params}, jnp.asarray(xp), jnp.asarray(mk),
                   deterministic=True)["logits"]
    xg = xp.copy()
    xg[:, n:] = 37.0                       # garbage in masked slots
    gar = fm.apply({"params": params}, jnp.asarray(xg), jnp.asarray(mk),
                   deterministic=True)["logits"]
    np.testing.assert_array_equal(np.asarray(pad), np.asarray(gar))

    # wrap + non-ppeg positional embeddings are rejected, not silently
    # mis-shaped
    from acmil_tpu.models.mhim import SAttentionEncoder
    enc = SAttentionEncoder(dim, pos="peg", pad_mode="wrap")
    with pytest.raises(ValueError, match="wrap"):
        enc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, n, dim), jnp.float32))
