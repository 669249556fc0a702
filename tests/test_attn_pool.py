"""Fused attention-pooling kernel vs jnp reference (interpret mode on CPU)
and vs the flax models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmil_tpu.models.acmil import ABMIL, ACMIL_GA
from acmil_tpu.models.fast import abmil_infer, acmil_ga_infer
from acmil_tpu.ops.attn_pool import fused_gated_attn_pool, gated_attn_pool_reference


def _weights(rs, df=64, l=32, a=32, k=5):
    return (
        jnp.asarray(rs.randn(df, l) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(l) * 0.1, jnp.float32),     # h-bias (CLAM fc)
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
    w1, b1, v, bv, u, bu, w, bw = _weights(rs, df=df)
    bag, logits = fused_gated_attn_pool(feats, mask, w1, b1, v, bv, u, bu,
                                        w, bw, chunk=128, interpret=True)
    bag_r, logits_r = gated_attn_pool_reference(feats, mask, w1, b1, v, bv,
                                                u, bu, w, bw)
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


def test_kernel_more_than_8_branches():
    """K>8 lifted (VERDICT r1 weak #4): pad to the 8-sublane tile."""
    import jax.numpy as jnp

    from acmil_tpu.ops.attn_pool import (fused_gated_attn_pool,
                                         gated_attn_pool_reference)

    rs = np.random.RandomState(0)
    n, df, l, a, k = 256, 32, 16, 16, 11
    feats = jnp.asarray(rs.randn(n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(n) < 0.9)
    ws = [jnp.asarray(rs.randn(*s) * 0.3, jnp.float32)
          for s in [(df, l), (l,), (l, a), (a,), (l, a), (a,), (a, k), (k,)]]
    bag, logits = fused_gated_attn_pool(feats, mask, *ws, chunk=128,
                                        interpret=True)
    ref_bag, ref_logits = gated_attn_pool_reference(feats, mask, *ws)
    assert bag.shape == (k, l) and logits.shape == (k, n)
    np.testing.assert_allclose(np.asarray(bag), np.asarray(ref_bag),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits.T),
                               rtol=2e-4, atol=2e-4)


def test_gated_attn_pool_grad_matches_reference():
    """custom_vjp wrapper: fused forward, rematerialised backward."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.ops.attn_pool import (_reference_batched,
                                         gated_attn_pool_grad)

    rs = np.random.RandomState(1)
    b, n, df, l, a, k = 2, 256, 32, 16, 16, 3
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.8)
    ws = [jnp.asarray(rs.randn(*s) * 0.3, jnp.float32)
          for s in [(df, l), (l,), (l, a), (a,), (l, a), (a,), (a, k), (k,)]]

    def loss_fused(feats, *ws):
        bag, logits = gated_attn_pool_grad(feats, mask, *ws, 128)
        return (bag ** 2).sum() + 1e-3 * jnp.tanh(logits).sum()

    def loss_ref(feats, *ws):
        bag, logits = _reference_batched(feats, mask, *ws)
        return (bag ** 2).sum() + 1e-3 * jnp.tanh(logits).sum()

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 3, 6))(feats, *ws)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 3, 6))(feats, *ws)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=2e-4, atol=2e-4)


def test_fused_train_step_matches_unfused():
    """ACMILFamily fused_train: same loss and gradients as model.apply
    when STKIM is off (the reference ABMIL config). Gradients, not
    post-Adam params: Adam's sign normalisation amplifies fp noise."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.models import build_mil_model

    rs = np.random.RandomState(0)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 256, 32), jnp.float32),
              mask=jnp.asarray(rs.rand(2, 256) < 0.8),
              coords=jnp.zeros((2, 256, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    rng = jax.random.PRNGKey(0)
    valid = bag.mask.any(axis=1)

    results = []
    for fused in [False, True]:
        conf = Config(n_class=2, D_feat=32, D_inner=16, arch="ga",
                      n_token=3, n_masked_patch=0, mask_drop=0.0,
                      lr=1e-3, train_epoch=1)
        conf.extra["fused_train"] = fused
        model, fam_name = build_mil_model(conf)
        fam = get_family(fam_name)
        conf_d = fam.conf_dict(conf)
        assert conf_d.get("fused", False) == fused
        params = model.init({"params": rng},
                            bag.feats, bag.mask)["params"]

        def loss_fn(params):
            outputs = fam.train_outputs(model.apply, params, bag,
                                        {"stkim": rng, "dropout": rng},
                                        conf_d)
            loss, _ = fam.loss(outputs, bag, valid, conf_d)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        results.append((float(loss), jax.tree_util.tree_leaves(grads)))

    (l0, g0), (l1, g1) = results
    np.testing.assert_allclose(l0, l1, rtol=2e-4)
    for a0, a1 in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   rtol=2e-3, atol=1e-5)


def test_fused_eval_outputs_match_apply():
    """ACMILFamily.eval_outputs routes GA param trees through the fused
    kernel; outputs must match model.apply deterministic forward."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.models import build_mil_model

    rs = np.random.RandomState(3)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 256, 32), jnp.float32),
              mask=jnp.asarray(rs.rand(2, 256) < 0.8),
              coords=jnp.zeros((2, 256, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    conf = Config(n_class=2, D_feat=32, D_inner=16, arch="ga", n_token=4,
                  n_masked_patch=6, mask_drop=0.5)  # STKIM on: eval ignores
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        bag.feats, bag.mask)["params"]

    sub_f, slide_f, attn_f = fam.eval_outputs(model.apply, params, bag)
    sub_r, slide_r, attn_r = model.apply({"params": params}, bag.feats,
                                         bag.mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(slide_f), np.asarray(slide_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sub_f), np.asarray(sub_r),
                               rtol=2e-4, atol=2e-5)
    # attention logits: fused emits mask-NEG'd raw logits; the module
    # returns raw logits — compare on valid slots only
    m = np.asarray(bag.mask)[:, None, :]
    diff = np.abs(np.asarray(attn_f) - np.asarray(attn_r)) * m
    assert diff.max() < 2e-4


def test_sharded_pool_matches_single_device():
    """Seq-sharded fused pooling (distributed online-softmax combine)
    equals the single-device kernel on the full bag."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.ops.attn_pool import (fused_gated_attn_pool_batched,
                                         sharded_gated_attn_pool)
    from acmil_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, seq=4)
    rs = np.random.RandomState(0)
    b, n, df, l, a, k = 2, 1024, 32, 16, 16, 3
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    # mask pattern that empties one shard entirely for bag 0
    mask = rs.rand(b, n) < 0.7
    mask[0, 256:512] = False
    mask = jnp.asarray(mask)
    ws = [jnp.asarray(rs.randn(*sh) * 0.3, jnp.float32)
          for sh in [(df, l), (l,), (l, a), (a,), (l, a), (a,), (a, k), (k,)]]

    ref_bag, ref_logits = fused_gated_attn_pool_batched(
        feats, mask, *ws, chunk=256, interpret=True)
    with mesh:
        bag, logits = sharded_gated_attn_pool(feats, mask, *ws, mesh=mesh,
                                              chunk=256)
    np.testing.assert_allclose(np.asarray(bag), np.asarray(ref_bag),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-5, atol=2e-5)


def test_sharded_pool_seq_only_mesh():
    """A mesh with ONLY a seq axis (no 'data') replicates the batch
    instead of erroring on a nonexistent axis name — the wrapper's
    original contract (code-review r3)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from acmil_tpu.ops.attn_pool import (fused_gated_attn_pool_batched,
                                         sharded_gated_attn_pool)

    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    rs = np.random.RandomState(1)
    b, n, df, l, a, k = 2, 512, 16, 8, 8, 3
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.8)
    ws = [jnp.asarray(rs.randn(*sh) * 0.3, jnp.float32)
          for sh in [(df, l), (l,), (l, a), (a,), (l, a), (a,), (a, k), (k,)]]
    ref_bag, _ = fused_gated_attn_pool_batched(feats, mask, *ws,
                                               chunk=128, interpret=True)
    with mesh:
        bag, _ = sharded_gated_attn_pool(feats, mask, *ws, mesh=mesh,
                                         chunk=128)
    np.testing.assert_allclose(np.asarray(bag), np.asarray(ref_bag),
                               rtol=2e-5, atol=2e-5)


def test_kernel_non_chunk_multiple_n():
    """N that is not a multiple of chunk (e.g. a max_patches-clamped bag,
    or a non-power-of-two bucket) pads internally with inert rows —
    regression for the eval crash at n=1536, chunk=1024."""
    rs = np.random.RandomState(3)
    n, df = 1536, 64
    feats = jnp.asarray(rs.randn(n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(n) < 0.8)
    ws = _weights(rs, df=df)
    bag, logits = fused_gated_attn_pool(feats, mask, *ws, chunk=1024,
                                        interpret=True)
    assert logits.shape == (5, n)
    bag_r, _ = gated_attn_pool_reference(feats, mask, *ws)
    np.testing.assert_allclose(np.asarray(bag), np.asarray(bag_r),
                               rtol=1e-4, atol=1e-4)


def test_grad_non_chunk_multiple_n():
    from acmil_tpu.ops.attn_pool import (_reference_batched,
                                         gated_attn_pool_grad)

    rs = np.random.RandomState(4)
    n, df = 1536, 64
    feats = jnp.asarray(rs.randn(1, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(1, n) < 0.8)
    ws = _weights(rs, df=df)

    def loss_fused(feats, *ws):
        bag, logits = gated_attn_pool_grad(feats, mask, *ws, 1024)
        return jnp.sum(bag ** 2) + jnp.sum(jnp.where(mask[:, None], logits,
                                                     0.0) ** 2) * 1e-3

    def loss_ref(feats, *ws):
        bag, logits = _reference_batched(feats, mask, *ws)
        return jnp.sum(bag ** 2) + jnp.sum(jnp.where(mask[:, None], logits,
                                                     0.0) ** 2) * 1e-3

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(feats, *ws)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(feats, *ws)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_eval_outputs_unfused_gate(tiny_conf):
    """fused=False keeps GA eval on model.apply (the mesh-safe path)."""
    import jax

    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.train import make_eval_step
    from acmil_tpu.models import build_mil_model

    conf = tiny_conf
    conf.arch = "ga"
    model, family = build_mil_model(conf)
    rs = np.random.RandomState(0)
    bag = Bag(feats=jnp.asarray(rs.randn(1, 96, conf.D_feat), jnp.float32),
              mask=jnp.asarray(rs.rand(1, 96) < 0.9),
              coords=jnp.zeros((1, 96, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        bag.feats, bag.mask)["params"]
    p_fused = make_eval_step(model, family, fused=True)(params, bag)
    p_plain = make_eval_step(model, family, fused=False)(params, bag)
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_plain),
                               rtol=1e-4, atol=1e-5)


def test_sharded_pool_grad_matches_reference():
    """Differentiable sharded pooling (VERDICT r2 item 1): loss value and
    gradients through the shard_map'd fused fwd/bwd equal the jnp
    reference on an unsharded graph."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.ops.attn_pool import (_reference_batched,
                                         sharded_gated_attn_pool_grad)
    from acmil_tpu.parallel import make_mesh

    mesh = make_mesh(data=2, seq=2)
    rs = np.random.RandomState(7)
    b, n, df, l, a, k = 4, 512, 32, 16, 16, 3
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = rs.rand(b, n) < 0.7
    mask[1, 256:] = False        # empties bag 1's second seq shard
    mask = jnp.asarray(mask)
    ws = [jnp.asarray(rs.randn(*sh) * 0.3, jnp.float32)
          for sh in [(df, l), (l,), (l, a), (a,), (l, a), (a,), (a, k), (k,)]]

    def loss_sharded(feats, *ws):
        bag, logits = sharded_gated_attn_pool_grad(feats, mask, *ws,
                                                   mesh, 128)
        return (bag ** 2).sum() + 1e-3 * jnp.where(
            mask[:, None], jnp.tanh(logits), 0.0).sum()

    def loss_ref(feats, *ws):
        bag, logits = _reference_batched(feats, mask, *ws)
        return (bag ** 2).sum() + 1e-3 * jnp.where(
            mask[:, None], jnp.tanh(logits), 0.0).sum()

    v1, g1 = jax.value_and_grad(loss_sharded, argnums=(0, 1, 3, 5, 6))(feats, *ws)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 3, 5, 6))(feats, *ws)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=2e-4, atol=2e-4)


def test_derive_stkim_rng_matches_flax():
    """The probe module reproduces flax's make_rng("stkim") derivation for
    a root-scope draw — the invariant the fused STKIM path relies on."""
    import flax.linen as nn
    import jax

    from acmil_tpu.models.fast import derive_stkim_rng

    class Grab(nn.Module):
        @nn.compact
        def __call__(self, x):
            return self.make_rng("stkim"), x

    key = jax.random.PRNGKey(42)
    got, _ = Grab().apply({}, 0.0, rngs={"stkim": key})
    want = derive_stkim_rng(key)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow  # STKIM-on variant; the STKIM-off step equivalence stays fast
def test_fused_train_step_matches_unfused_stkim_on():
    """VERDICT r2 item 2: the flagship recipe (STKIM on) now runs fused;
    loss and gradients must match model.apply with the same rng."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.models import build_mil_model

    rs = np.random.RandomState(11)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 256, 32), jnp.float32),
              mask=jnp.asarray(rs.rand(2, 256) < 0.8),
              coords=jnp.zeros((2, 256, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    rng = jax.random.PRNGKey(4)
    valid = bag.mask.any(axis=1)

    results = []
    for fused in [False, True]:
        conf = Config(n_class=2, D_feat=32, D_inner=16, arch="ga",
                      n_token=5, n_masked_patch=10, mask_drop=0.6,
                      lr=1e-3, train_epoch=1)
        conf.extra["fused_train"] = fused
        model, fam_name = build_mil_model(conf)
        fam = get_family(fam_name)
        conf_d = fam.conf_dict(conf)
        assert conf_d.get("fused", False) == fused
        params = model.init({"params": rng}, bag.feats, bag.mask)["params"]

        def loss_fn(params):
            outputs = fam.train_outputs(model.apply, params, bag,
                                        {"stkim": rng, "dropout": rng},
                                        conf_d)
            loss, _ = fam.loss(outputs, bag, valid, conf_d)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        results.append((float(loss), jax.tree_util.tree_leaves(grads)))

    (l0, g0), (l1, g1) = results
    np.testing.assert_allclose(l0, l1, rtol=2e-4)
    for a0, a1 in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   rtol=3e-3, atol=3e-5)


def test_stkim_correction_matches_direct_softmax():
    """_stkim_correct's subtract-and-renormalise equals pooling with the
    post-drop softmax computed directly, including peaked logits."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.fast import _stkim_correct
    from acmil_tpu.ops.attn_pool import fused_gated_attn_pool_batched
    from acmil_tpu.ops.masked import stkim_drop

    rs = np.random.RandomState(5)
    b, n, df, l, a, k = 2, 512, 32, 16, 16, 4
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.8)
    # scale the last projection up to sharpen the attention distribution
    # b1 = 0: _stkim_correct recomputes the bias-free GA h
    ws = [jnp.asarray(rs.randn(*sh) * s, jnp.float32)
          for sh, s in [((df, l), 0.3), ((l,), 0.0), ((l, a), 0.5),
                        ((a,), 0.1),
                        ((l, a), 0.5), ((a,), 0.1), ((a, k), 3.0),
                        ((k,), 0.1)]]
    bag, logits = fused_gated_attn_pool_batched(feats, mask, *ws,
                                                chunk=128, interpret=True)
    rng = jax.random.PRNGKey(9)
    bag2, a_drop = _stkim_correct(bag, logits, feats, mask, ws[0], rng,
                                  n_masked_patch=8, mask_drop=0.5)
    # direct: pool h with softmax over the post-drop logits
    drop, _ = stkim_drop(rng, logits, 8, 0.5, mask[:, None, :])
    h = jnp.maximum(feats @ ws[0], 0.0)
    keep = mask[:, None, :] & ~drop
    p = jnp.where(keep, logits, -jnp.inf)
    p = jax.nn.softmax(p, axis=-1)
    ref = jnp.einsum("bkn,bnl->bkl", p, h)
    np.testing.assert_allclose(np.asarray(bag2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stkim_correction_extreme_logit_gap_takes_exact_path():
    """When the dropped entries carry almost all the softmax mass
    (kept_mass < _STKIM_KEPT_MIN), the f32 subtract-renormalise identity
    breaks down (relative error ~ eps/kept_mass); _stkim_correct must
    switch to the exact kept-softmax recompute and still match direct
    pooling instead of silently returning cancellation garbage
    (code-review r3)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.fast import (_STKIM_GAP_MAX, _STKIM_KEPT_MIN,
                                       _stkim_correct)
    from acmil_tpu.ops.attn_pool import fused_gated_attn_pool_batched
    from acmil_tpu.ops.masked import stkim_drop

    rs = np.random.RandomState(11)
    b, n, df, l, a, k = 1, 256, 16, 8, 8, 3
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.9)
    # last projection scaled so logits span tens of nats: dropping the
    # top-k then towers lse_full far above the kept maximum
    ws = [jnp.asarray(rs.randn(*sh) * s, jnp.float32)
          for sh, s in [((df, l), 0.3), ((l,), 0.0), ((l, a), 1.0),
                        ((a,), 0.1),
                        ((l, a), 1.0), ((a,), 0.1), ((a, k), 40.0),
                        ((k,), 0.1)]]
    bag, logits = fused_gated_attn_pool_batched(feats, mask, *ws,
                                                chunk=128, interpret=True)
    rng = jax.random.PRNGKey(3)
    # mask_drop=1.0 drops ALL top-k entries -> maximal gap
    drop, _ = stkim_drop(rng, logits, 4, 1.0, mask[:, None, :])
    a_drop = jnp.where(drop, -jnp.inf, logits)
    m2 = jnp.max(jnp.where(mask[:, None, :] & ~drop, a_drop, -jnp.inf),
                 axis=-1, keepdims=True)
    lse = jax.nn.logsumexp(jnp.where(mask[:, None, :], logits, -jnp.inf),
                           axis=-1, keepdims=True)
    assert float(jnp.max(lse - m2)) > _STKIM_GAP_MAX, (
        "fixture failed to open the gap; raise the projection scale")
    kept_mass = jnp.sum(
        jnp.exp(jnp.where(mask[:, None, :] & ~drop, logits, -jnp.inf)
                - lse), axis=-1)
    assert float(jnp.min(kept_mass)) < _STKIM_KEPT_MIN, (
        "fixture kept mass too large to force the exact path")

    bag2, _ = _stkim_correct(bag, logits, feats, mask, ws[0], rng,
                             n_masked_patch=4, mask_drop=1.0)
    h = jnp.maximum(feats @ ws[0], 0.0)
    p = jax.nn.softmax(jnp.where(mask[:, None, :] & ~drop, logits,
                                 -jnp.inf), axis=-1)
    ref = jnp.einsum("bkn,bnl->bkl", p, h)
    np.testing.assert_allclose(np.asarray(bag2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(bag2)).all()


def test_softmax_one_kernel_variant_matches_reference():
    """gated_attn_pool_grad_one (CLAM_MB's softmax_one pooling): value and
    gradients equal the jnp softmax_one formulation."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.ops.attn_pool import (gated_attn_pool_grad_one,
                                         gated_attn_pool_reference)

    rs = np.random.RandomState(2)
    b, n, df, l, a, k = 2, 512, 32, 16, 16, 3
    feats = jnp.asarray(rs.randn(b, n, df), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.8)
    ws = [jnp.asarray(rs.randn(*sh) * 0.3, jnp.float32)
          for sh in [(df, l), (l,), (l, a), (a,), (l, a), (a,), (a, k), (k,)]]

    def ref_one(feats, *ws):
        w1, b1, v, bv, u, bu, w, bw = ws

        def per_bag(x, m):
            h = jnp.maximum(x @ w1 + b1, 0.0)
            logits = (jnp.tanh(h @ v + bv) * jax.nn.sigmoid(h @ u + bu)) @ w + bw
            lg = jnp.where(m[:, None], logits, -jnp.inf)
            # softmax_one: phantom logit pinned at 0 (utils/utils.py:54)
            p = jnp.exp(lg - jax.nn.logsumexp(
                jnp.concatenate([lg, jnp.zeros((1, lg.shape[1]))], 0),
                axis=0))
            return p.T @ h, logits

        bag, logits = jax.vmap(per_bag)(feats, mask)
        return bag, logits.transpose(0, 2, 1)

    def loss_fused(feats, *ws):
        bag, logits = gated_attn_pool_grad_one(feats, mask, *ws, 128)
        return (bag ** 2).sum() + 1e-3 * jnp.where(
            mask[:, None], jnp.tanh(logits), 0.0).sum()

    def loss_ref(feats, *ws):
        bag, logits = ref_one(feats, *ws)
        return (bag ** 2).sum() + 1e-3 * jnp.where(
            mask[:, None], jnp.tanh(logits), 0.0).sum()

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 7))(feats, *ws)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 7))(feats, *ws)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=3e-4, atol=3e-4)


def _clam_fused_case(arch, fused):
    """Build a CLAM model/family pair and return (loss, grad leaves,
    eval outputs) under the given fused flag (droprate 0). Pins
    ``fast.FUSE_MIN_N`` to 0 so the kernel engages at the tiny test N
    (production routing only fuses past the measured crossover)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.engine.train import _conf_dict
    from acmil_tpu.models import build_mil_model, fast

    rs = np.random.RandomState(6)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 256, 32), jnp.float32),
              mask=jnp.asarray(rs.rand(2, 256) < 0.8),
              coords=jnp.zeros((2, 256, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    rng = jax.random.PRNGKey(0)
    valid = bag.mask.any(axis=1)
    conf = Config(n_class=2, D_feat=32, D_inner=16, arch=arch,
                  lr=1e-3, train_epoch=1)
    conf.extra["droprate"] = 0.0
    conf.extra["fused_train"] = fused
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    conf_d = _conf_dict(fam, conf)
    assert conf_d.get("fused", False) == fused
    params = model.init({"params": rng}, bag.feats, bag.mask)["params"]

    def loss_fn(params):
        outputs = fam.train_outputs(model.apply, params, bag,
                                    {"dropout": rng}, conf_d)
        loss, _ = fam.loss(outputs, bag, valid, conf_d)
        return loss

    min_n = fast.FUSE_MIN_N
    fast.FUSE_MIN_N = 0
    try:
        loss, grads = jax.value_and_grad(loss_fn)(params)
        ev = fam.eval_outputs(model.apply, params, bag, fused=fused)
    finally:
        fast.FUSE_MIN_N = min_n
    return (float(loss), jax.tree_util.tree_leaves(grads), ev, bag)


@pytest.mark.slow  # family-routed fused step; kernel-level CLAM equality stays fast
def test_clam_fused_train_step_matches_unfused():
    """CLAMFamily fused_train (droprate 0): loss incl. the instance
    clustering term and all gradients equal model.apply — SB (masked
    softmax) and MB (softmax_one + per-class heads)."""
    for arch in ["clam_sb", "clam_mb"]:
        (l0, g0, ev0, bag) = _clam_fused_case(arch, fused=False)
        (l1, g1, ev1, _) = _clam_fused_case(arch, fused=True)
        np.testing.assert_allclose(l0, l1, rtol=2e-4,
                                   err_msg=f"{arch} loss")
        for a0, a1 in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                       rtol=3e-3, atol=3e-5,
                                       err_msg=f"{arch} grads")
        # eval outputs: logits + bag features match; attention matches at
        # valid slots (the kernel masks padded slots, the model returns
        # raw scores there)
        np.testing.assert_allclose(np.asarray(ev0["logits"]),
                                   np.asarray(ev1["logits"]),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ev0["bag_feat"]),
                                   np.asarray(ev1["bag_feat"]),
                                   rtol=2e-3, atol=2e-4)
        m = np.asarray(bag.mask)
        a0 = np.asarray(ev0["attn"])
        a1 = np.asarray(ev1["attn"])
        for i in range(m.shape[0]):
            np.testing.assert_allclose(a0[i][:, m[i]], a1[i][:, m[i]],
                                       rtol=2e-3, atol=2e-4)


def _dtfd_fused_case(fused, distill="MaxMinS"):
    """DTFD train loss/grads + eval outputs under the given fused flag
    (stock build — droprate 0). Pins ``fast.DTFD_FUSE_MIN_S`` to 0 so
    the kernel engages (production default is OFF — measured negative,
    BENCH_NOTES r4)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.engine.train import _conf_dict
    from acmil_tpu.models import build_mil_model, fast

    rs = np.random.RandomState(11)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 256, 32), jnp.float32),
              mask=jnp.asarray(rs.rand(2, 256) < 0.8),
              coords=jnp.zeros((2, 256, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    rng = jax.random.PRNGKey(0)
    valid = bag.mask.any(axis=1)
    conf = Config(n_class=2, D_feat=32, D_inner=16, arch="dtfd",
                  lr=1e-3, train_epoch=1)
    conf.extra["distill"] = distill
    conf.extra["fused_train"] = fused
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    conf_d = _conf_dict(fam, conf)
    assert conf_d.get("fused", False) == fused
    assert conf_d["distill"] == distill
    params = model.init({"params": rng}, bag.feats, bag.mask)["params"]
    assert fast.dtfd_is_fusable(params)

    def loss_fn(params):
        outputs = fam.train_outputs(model.apply, params, bag,
                                    {"stkim": rng, "dropout": rng}, conf_d)
        loss, _ = fam.loss(outputs, bag, valid, conf_d)
        return loss

    min_s = fast.DTFD_FUSE_MIN_S
    fast.DTFD_FUSE_MIN_S = 0
    try:
        loss, grads = jax.value_and_grad(loss_fn)(params)
        ev = fam.eval_outputs(model.apply, params, bag, fused=fused,
                              model=model)
    finally:
        fast.DTFD_FUSE_MIN_S = min_s
    return (float(loss), jax.tree_util.tree_leaves(grads), ev)


@pytest.mark.slow  # family-routed fused step; kernel-level DTFD equality stays fast
def test_dtfd_fused_train_step_matches_unfused():
    """DTFDFamily fused routing (models/fast.py::dtfd_apply_fused):
    pseudo-bag grouping is bit-identical (flax-derived stkim rng), and
    the two-tier loss, every gradient, and the eval outputs match
    model.apply across all three distill modes."""
    for distill in ["MaxMinS", "MaxS", "AFS"]:
        l0, g0, ev0 = _dtfd_fused_case(False, distill)
        l1, g1, ev1 = _dtfd_fused_case(True, distill)
        np.testing.assert_allclose(l0, l1, rtol=2e-4,
                                   err_msg=f"{distill} loss")
        for a0, a1 in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                       rtol=3e-3, atol=3e-5,
                                       err_msg=f"{distill} grads")
        for k in ["logits", "sub_preds", "attn"]:
            np.testing.assert_allclose(np.asarray(ev0[k]),
                                       np.asarray(ev1[k]),
                                       rtol=2e-3, atol=2e-4,
                                       err_msg=f"{distill} eval {k}")
        assert (np.asarray(ev0["group_valid"])
                == np.asarray(ev1["group_valid"])).all()


def test_dsmil_pool_kernel_matches_reference():
    """ops/dsmil_pool.py streaming kernel vs the jnp formulation,
    including a multi-chunk online softmax and masked rows."""
    from acmil_tpu.ops.dsmil_pool import (dsmil_pool_reference,
                                          fused_dsmil_pool)

    rs = np.random.RandomState(3)
    b, n, d, q, c = 2, 512, 48, 16, 3
    feats = jnp.asarray(rs.randn(b, n, d), jnp.float32)
    mask = jnp.asarray(rs.rand(b, n) < 0.8)
    wq = jnp.asarray(rs.randn(d, q) * 0.3, jnp.float32)
    bq = jnp.asarray(rs.randn(q) * 0.1, jnp.float32)
    q_max = jnp.asarray(rs.randn(b, c, q), jnp.float32)

    bag_k, a_k = fused_dsmil_pool(feats, mask, wq, bq, q_max, chunk=128,
                                  interpret=True)
    bag_r, a_r = dsmil_pool_reference(feats, mask, wq, bq, q_max)
    np.testing.assert_allclose(np.asarray(bag_k), np.asarray(bag_r),
                               rtol=1e-4, atol=1e-4)
    m = np.asarray(mask)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(a_k)[i][:, m[i]],
                                   np.asarray(a_r)[i][:, m[i]],
                                   rtol=1e-4, atol=1e-4)


def test_dsmil_fused_eval_matches_model():
    """DSMILFamily.eval_outputs routes the generic-trainer build through
    the fused bag-head kernel; (max-inst, bag-logits) and the resulting
    eval probabilities must match model.apply."""
    import jax

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.models import build_mil_model

    rs = np.random.RandomState(8)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 300, 32), jnp.float32),
              mask=jnp.asarray(rs.rand(2, 300) < 0.8),
              coords=jnp.zeros((2, 300, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    conf = Config(n_class=2, D_feat=32, D_inner=16, arch="dsmil",
                  lr=1e-3, train_epoch=1)
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        bag.feats, bag.mask)["params"]

    from acmil_tpu.models import fast
    assert fast.dsmil_is_fusable(params)

    min_n = fast.FUSE_MIN_N
    fast.FUSE_MIN_N = 0  # force the kernel at the tiny test N
    try:
        out_f = fam.eval_outputs(model.apply, params, bag, fused=True)
    finally:
        fast.FUSE_MIN_N = min_n
    out_p = fam.eval_outputs(model.apply, params, bag, fused=False)
    for a, b_ in zip(out_f, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fam.probs(out_f)),
                               np.asarray(fam.probs(out_p)),
                               rtol=2e-4, atol=2e-5)
