"""Gradient-level parity against the reference torch TRAINING semantics.

Round-2 verdict item 4: the forward parity suite (test_reference_parity)
never checked the loss compositions or gradients. These tests build the
actual reference torch modules, compose the reference's training losses
(`Step3_WSI_classification_ACMIL.py:199-216`,
`Step3_WSI_classification_DTFD.py:131-148`), and assert our family
losses AND per-parameter gradients match on converted weights — for both
the plain XLA graph and the fused Pallas train path.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: deselect with -m "not slow"

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)


def _t(mod_param):
    return mod_param.detach().numpy().copy()


def _g(mod_param):
    return mod_param.grad.detach().numpy().copy()


def _lin(mod, get):
    out = {"kernel": get(mod.weight).T.copy()}
    if mod.bias is not None:
        out["bias"] = get(mod.bias)
    return out


def _assert_tree_close(got, want, rtol, atol, prefix=""):
    import jax

    got_l, got_tree = jax.tree_util.tree_flatten(got)
    want_l, want_tree = jax.tree_util.tree_flatten(want)
    assert got_tree == want_tree, (got_tree, want_tree)
    for g, w, path in zip(got_l, want_l,
                          jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
            err_msg=f"{prefix}{jax.tree_util.keystr(path[0])}")


# ---------------------------------------------------------------------------
# ACMIL: branch CE + slide CE + diversity (`Step3_ACMIL:199-216`)
# ---------------------------------------------------------------------------

def _acmil_tree(tm, get):
    return {
        "DimReduction_0": {"Dense_0": {
            "kernel": get(tm.dimreduction.fc1.weight).T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin(tm.attention.attention_V[0], get),
            "Dense_1": _lin(tm.attention.attention_U[0], get),
            "Dense_2": _lin(tm.attention.attention_weights, get),
        },
        "branch_w": np.stack([get(c.fc.weight).T for c in tm.classifier]),
        "branch_b": np.stack([get(c.fc.bias) for c in tm.classifier]),
        "Classifier1fc_0": {"Dense_0": _lin(tm.Slide_classifier.fc, get)},
    }


@pytest.mark.parametrize("fused", [False, True])
def test_acmil_training_loss_and_grad_parity(fused):
    """Loss value (rtol 1e-4) and per-parameter gradients of the full
    ACMIL training objective vs the torch reference, through both the
    plain graph and the fused kernel path."""
    import types

    from architecture.transformer import ACMIL_GA as TorchACMIL
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.models import build_mil_model

    K = 3
    rs = np.random.RandomState(7)
    bag_np = rs.randn(1, 256, 48).astype(np.float32)
    label = 1

    conf_t = types.SimpleNamespace(D_feat=48, D_inner=32, n_class=2,
                                   n_token=K)
    tm = TorchACMIL(conf_t, D=16, n_token=K, n_masked_patch=0, mask_drop=0)
    tm.train()

    x = torch.from_numpy(bag_np)
    labels = torch.tensor([label])
    sub, slide, attn = tm(x)
    crit = torch.nn.CrossEntropyLoss()
    loss0 = crit(sub, labels.repeat_interleave(K))
    loss1 = crit(slide, labels)
    p = torch.softmax(attn, dim=-1)
    diff = torch.tensor(0.0)
    for i in range(K):
        for j in range(i + 1, K):
            diff = diff + torch.cosine_similarity(
                p[:, i], p[:, j], dim=-1).mean() / (K * (K - 1) / 2)
    t_loss = loss0 + loss1 + diff
    t_loss.backward()

    params = _acmil_tree(tm, _t)
    want_grads = _acmil_tree(tm, _g)

    conf = Config(n_class=2, D_feat=48, D_inner=32, arch="ga", n_token=K,
                  n_masked_patch=0, mask_drop=0.0, lr=1e-3, train_epoch=1)
    conf.extra["fused_train"] = fused
    model, fam_name = build_mil_model(conf)
    # d_attn=16 to match the torch module: rebuild directly
    from acmil_tpu.models.acmil import ACMIL_GA

    model = ACMIL_GA(n_class=2, d_inner=32, d_attn=16, n_token=K)
    fam = get_family(fam_name)
    conf_d = fam.conf_dict(conf)
    assert conf_d["fused"] == fused

    bag = Bag(feats=jnp.asarray(bag_np),
              mask=jnp.ones((1, 256), bool),
              coords=jnp.zeros((1, 256, 2), jnp.int32),
              label=jnp.asarray([label], jnp.int32))
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    rng = jax.random.PRNGKey(0)

    def loss_fn(ps):
        outputs = fam.train_outputs(model.apply, ps, bag,
                                    {"stkim": rng, "dropout": rng}, conf_d)
        loss, _ = fam.loss(outputs, bag, bag.mask.any(axis=1), conf_d)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(jparams)
    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-4)
    _assert_tree_close(grads, want_grads, rtol=2e-3, atol=1e-5,
                       prefix=f"fused={fused} ")


# ---------------------------------------------------------------------------
# DTFD: two-tier two-optimizer step (`Step3_DTFD:131-148`)
# ---------------------------------------------------------------------------

def test_dtfd_two_tier_grad_parity():
    """Tier-1 params must receive exactly loss0's gradients and the
    tier-2 head exactly loss1's (the reference's two-optimizer step:
    loss1's grads into tier-1 params are computed but never stepped —
    our stop_gradient reproduces the effective update)."""
    from architecture.Attention import Attention_Gated as RefAttention
    from architecture.Attention import Attention_with_Classifier
    from architecture.network import Classifier_1fc, DimReduction as RefDR

    import jax
    import jax.numpy as jnp

    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.families import get_family
    from acmil_tpu.models.dtfd import DTFD

    rs = np.random.RandomState(3)
    bag_np = rs.randn(1, 64, 48).astype(np.float32)
    label = 1
    L, C, k = 32, 2, 2

    dimred = RefDR(48, L)
    attn = RefAttention(L, 16, 1)
    cls1 = Classifier_1fc(L, C, 0)
    ucls = Attention_with_Classifier(L=L, D=16, K=1, num_cls=C)
    for m in (dimred, attn, cls1, ucls):
        m.train()

    # reference loop, numGroup=1 (grouping randomness vanishes)
    x = torch.from_numpy(bag_np[0])
    labels = torch.tensor([label])
    crit = torch.nn.CrossEntropyLoss()
    mid = dimred(x)
    a = torch.softmax(attn(mid, isNorm=False), dim=1)
    att_feats = mid * a.t()
    pooled = att_feats.sum(dim=0, keepdim=True)
    tier1 = cls1(pooled)
    loss0 = crit(tier1, labels).mean()
    cam = att_feats @ cls1.fc.weight.t()
    prob = torch.softmax(cam, dim=1)[:, -1]
    order = torch.argsort(prob, descending=True)
    sel = torch.cat([order[:k], order[-k:]])
    d_feat = mid[sel]
    tier2 = ucls(d_feat)
    loss1 = crit(tier2, labels).mean()

    tier1_params = (list(dimred.parameters()) + list(attn.parameters())
                    + list(cls1.parameters()))
    g0 = torch.autograd.grad(loss0, tier1_params, retain_graph=True)
    ucls_params = list(ucls.parameters())
    g1 = torch.autograd.grad(loss1, ucls_params)
    for p, g in zip(tier1_params + ucls_params, list(g0) + list(g1)):
        p.grad = g

    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": _t(dimred.fc1.weight).T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin(attn.attention_V[0], _t),
            "Dense_1": _lin(attn.attention_U[0], _t),
            "Dense_2": _lin(attn.attention_weights, _t),
        },
        "tier1_w": _t(cls1.fc.weight).T.copy(),
        "tier1_b": _t(cls1.fc.bias),
        "AttentionGated_1": {
            "Dense_0": _lin(ucls.attention.attention_V[0], _t),
            "Dense_1": _lin(ucls.attention.attention_U[0], _t),
            "Dense_2": _lin(ucls.attention.attention_weights, _t),
        },
        "Classifier1fc_0": {"Dense_0": _lin(ucls.classifier.fc, _t)},
    }
    want_grads = {
        "DimReduction_0": {"Dense_0": {
            "kernel": _g(dimred.fc1.weight).T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin_grad(attn.attention_V[0]),
            "Dense_1": _lin_grad(attn.attention_U[0]),
            "Dense_2": _lin_grad(attn.attention_weights),
        },
        "tier1_w": _g(cls1.fc.weight).T.copy(),
        "tier1_b": _g(cls1.fc.bias),
        "AttentionGated_1": {
            "Dense_0": _lin_grad(ucls.attention.attention_V[0]),
            "Dense_1": _lin_grad(ucls.attention.attention_U[0]),
            "Dense_2": _lin_grad(ucls.attention.attention_weights),
        },
        "Classifier1fc_0": {"Dense_0": _lin_grad(ucls.classifier.fc)},
    }

    fm = DTFD(n_class=C, d_inner=L, d_attn=16, num_group=1,
              instance_per_group=k, distill="MaxMinS")
    fam = get_family("dtfd")
    bag = Bag(feats=jnp.asarray(bag_np), mask=jnp.ones((1, 64), bool),
              coords=jnp.zeros((1, 64, 2), jnp.int32),
              label=jnp.asarray([label], jnp.int32))
    jparams = jax.tree_util.tree_map(jnp.asarray, params)

    def loss_fn(ps):
        out = fm.apply({"params": ps}, bag.feats, bag.mask,
                       deterministic=True)
        loss, aux = fam.loss(out, bag, bag.mask.any(axis=1), {})
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(jparams)
    np.testing.assert_allclose(float(aux["loss0"]), float(loss0), rtol=1e-4)
    np.testing.assert_allclose(float(aux["loss1"]), float(loss1), rtol=1e-4)
    _assert_tree_close(grads, want_grads, rtol=2e-3, atol=1e-5)


def _lin_grad(mod):
    out = {"kernel": _g(mod.weight).T.copy()}
    if mod.bias is not None:
        out["bias"] = _g(mod.bias)
    return out


# ---------------------------------------------------------------------------
# MHIM: teacher-guided masked step (`Step3_MHIM:124-161`)
# ---------------------------------------------------------------------------

def test_mhim_step_grad_parity():
    """Teacher forward -> deterministic low-attention masking -> student
    loss (cls CE + soft-target CE on features) and gradients vs the torch
    reference, DAttention baseline (`modules/mhim.py` with
    baseline='attn', mask_ratio_l>0 — the deterministic masking path;
    dropout off). Also checks the EMA update formula."""
    from modules.mhim import MHIM as TorchMHIM

    import jax
    import jax.numpy as jnp

    from acmil_tpu.data.bags import Bag
    from acmil_tpu.models.mhim import MHIM, soft_target_ce
    from acmil_tpu.engine import losses as L

    rs = np.random.RandomState(9)
    n, d, dim = 100, 48, 64
    bag_np = rs.randn(1, n, d).astype(np.float32)
    label = 1
    cls_alpha, cl_alpha = 1.0, 0.1

    tm = TorchMHIM(mlp_dim=dim, n_classes=2, dropout=0.0, act="relu",
                   baseline="attn", da_act="gelu", mask_ratio=0.0,
                   mask_ratio_l=0.2, mask_ratio_h=0.0, feat_dim=d)
    tm.train()

    x = torch.from_numpy(bag_np)
    labels = torch.tensor([label])
    with torch.no_grad():
        cls_tea, attn_tea = tm.forward_teacher(x, return_attn=True)
    logits, cls_loss, ps, len_keep = tm(x, attn_tea, cls_tea, i=0)
    assert len_keep < ps  # masking actually dropped patches
    crit = torch.nn.CrossEntropyLoss()
    t_loss = cls_alpha * crit(logits.view(1, -1), labels) + cl_alpha * cls_loss
    t_loss.backward()

    def tree(get):
        att = tm.online_encoder.attention.attention  # Sequential(L,GELU,L)
        return {
            "patch_to_emb": {"kernel": get(tm.patch_to_emb[0].weight).T.copy(),
                             "bias": get(tm.patch_to_emb[0].bias)},
            "DAttentionEncoder_0": {
                "Dense_0": {"kernel": get(att[0].weight).T.copy()},
                "Dense_1": {"kernel": get(att[2].weight).T.copy()},
            },
            "predictor": {"kernel": get(tm.predictor.weight).T.copy(),
                          "bias": get(tm.predictor.bias)},
        }

    params = tree(_t)
    want_grads = tree(_g)

    fm = MHIM(n_class=2, mlp_dim=dim, baseline="attn", act="relu",
              da_act="gelu", droprate=0.0, mask_ratio=0.0,
              mask_ratio_l=0.2, mask_ratio_h=0.0)
    bag = Bag(feats=jnp.asarray(bag_np), mask=jnp.ones((1, n), bool),
              coords=jnp.zeros((1, n, 2), jnp.int32),
              label=jnp.asarray([label], jnp.int32))
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    rng = jax.random.PRNGKey(0)

    tea = fm.apply({"params": jparams}, bag.feats, bag.mask,
                   deterministic=True, return_attn=True)
    np.testing.assert_allclose(np.asarray(tea["cls_feat"]),
                               cls_tea.detach().numpy(), rtol=2e-4, atol=2e-5)

    def loss_fn(ps_):
        out = fm.apply({"params": ps_}, bag.feats, bag.mask,
                       deterministic=False,
                       teacher_attn=jax.lax.stop_gradient(tea["attn"]),
                       rngs={"stkim": rng, "dropout": rng})
        ce = L.cross_entropy(out["logits"], bag.label)
        cl = soft_target_ce(out["cls_feat"],
                            jax.lax.stop_gradient(tea["cls_feat"]))
        return cls_alpha * ce + cl_alpha * cl, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(jparams)
    # same patches masked
    assert int(out["keep"].sum()) == int(len_keep)
    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-4)
    # atol 3e-5: near-zero grad entries carry f32 accumulation noise that
    # depends on the torch GLOBAL rng state at module init (test order)
    _assert_tree_close(grads, want_grads, rtol=2e-3, atol=3e-5)

    # EMA formula (`utils/utils.py:604`: k <- mm*k + (1-mm)*q)
    mm = 0.99
    tgt = jax.tree_util.tree_map(lambda t: t + 1.0, jparams)
    new = jax.tree_util.tree_map(lambda t, s: t * mm + s * (1.0 - mm),
                                 tgt, jparams)
    leaf_t = jax.tree_util.tree_leaves(tgt)[0]
    leaf_n = jax.tree_util.tree_leaves(new)[0]
    leaf_s = jax.tree_util.tree_leaves(jparams)[0]
    np.testing.assert_allclose(np.asarray(leaf_n),
                               np.asarray(leaf_t) * mm
                               + np.asarray(leaf_s) * (1 - mm), rtol=1e-6)


# ---------------------------------------------------------------------------
# DTFD: optimizer-step parity — coupled-L2 Adam + per-module clipping
# (`Step3_WSI_classification_DTFD.py:131-148`, code-review r3)
# ---------------------------------------------------------------------------

def test_dtfd_optimizer_step_parity():
    """One DTFDFamily.make_tx update must equal torch's
    clip_grad_norm_(each module, 5) -> Adam(lr, weight_decay=wd).step()
    on identical params/grads: per-module clip scales (a spiking module
    must not shrink the others), coupled L2 decay, Adam moments."""
    import jax
    import jax.numpy as jnp
    import optax
    from types import SimpleNamespace

    import acmil_tpu.models.dtfd  # noqa: F401 — registers the family
    from acmil_tpu.engine.families import get_family

    rs = np.random.RandomState(7)
    lr, wd, clip = 1e-2, 1e-3, 5.0

    # grads scaled so some module norms exceed the clip and others don't
    shapes = {
        "DimReduction_0": {"Dense_0": {"kernel": ((48, 32), 3.0)}},
        "AttentionGated_0": {"Dense_0": {"kernel": ((32, 16), 0.1),
                                         "bias": ((16,), 0.1)}},
        "tier1_w": ((32, 2), 9.0),
        "tier1_b": ((2,), 9.0),
        "AttentionGated_1": {"Dense_0": {"kernel": ((32, 16), 2.0),
                                         "bias": ((16,), 2.0)}},
        "Classifier1fc_0": {"Dense_0": {"kernel": ((32, 2), 0.05),
                                        "bias": ((2,), 0.05)}},
    }

    def build(tree):
        if isinstance(tree, dict):
            return {k: build(v) for k, v in tree.items()}
        shape, scale = tree
        return rs.randn(*shape).astype(np.float32) * scale

    params = jax.tree_util.tree_map(
        lambda _: None, shapes,
        is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
        and isinstance(x[0], tuple))
    params = build(shapes)
    grads = build(shapes)

    # ---- torch oracle: 4 clip groups exactly as the reference wires them
    tparams = jax.tree_util.tree_map(
        lambda a: torch.nn.Parameter(torch.from_numpy(a.copy())), params)
    tleaves = jax.tree_util.tree_leaves(tparams)
    for p, g in zip(tleaves, jax.tree_util.tree_leaves(grads)):
        p.grad = torch.from_numpy(g.copy())
    groups = [
        jax.tree_util.tree_leaves(tparams["DimReduction_0"]),
        jax.tree_util.tree_leaves(tparams["AttentionGated_0"]),
        [tparams["tier1_w"], tparams["tier1_b"]],
        jax.tree_util.tree_leaves(tparams["AttentionGated_1"])
        + jax.tree_util.tree_leaves(tparams["Classifier1fc_0"]),
    ]
    for g in groups:
        torch.nn.utils.clip_grad_norm_(g, clip)
    opt = torch.optim.Adam(tleaves, lr=lr, weight_decay=wd)
    opt.step()
    want = jax.tree_util.tree_map(lambda p: p.detach().numpy(), tparams)

    # ---- ours
    conf = SimpleNamespace(wd=wd, grad_clipping=clip)
    tx = get_family("dtfd").make_tx(conf, lr)
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    jgrads = jax.tree_util.tree_map(jnp.asarray, grads)
    state = tx.init(jparams)
    updates, _ = tx.update(jgrads, state, jparams)
    got = optax.apply_updates(jparams, updates)

    _assert_tree_close(got, want, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Init-distribution parity (r3: reference training dynamics are
# init-sensitive — DTFD under flax-default init converged ~4x slower)
# ---------------------------------------------------------------------------

def test_dtfd_init_matches_torch_linear_default():
    """Every DTFD Linear param must follow torch nn.Linear's default
    U(±1/sqrt(fan_in)) — kernels AND biases (flax's zero-bias lecun
    default trains measurably worse on the reference's own recipe)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.dtfd import DTFD

    m = DTFD(n_class=2, d_inner=128, d_attn=128)
    params = m.init({"params": jax.random.PRNGKey(0)},
                    jnp.ones((1, 64, 384)), jnp.ones((1, 64), bool))["params"]

    fan_ins = {
        "DimReduction_0": 384,
        "AttentionGated_0": {"Dense_0": 128, "Dense_1": 128, "Dense_2": 128},
        "AttentionGated_1": {"Dense_0": 128, "Dense_1": 128, "Dense_2": 128},
        "Classifier1fc_0": 128, "tier1_w": 128, "tier1_b": 128,
    }

    def check(leaf, fan_in, path):
        a = np.asarray(leaf)
        bound = 1.0 / np.sqrt(fan_in)
        assert np.abs(a).max() <= bound + 1e-7, (path, np.abs(a).max(), bound)
        if a.size >= 256:  # sampled std ≈ bound/sqrt(3) for U(±bound)
            np.testing.assert_allclose(a.std(), bound / np.sqrt(3),
                                       rtol=0.15, err_msg=str(path))
        if "bias" in str(path) or path in ("tier1_b",):
            assert np.abs(a).sum() > 0, f"{path}: zero bias (flax default?)"

    for top, sub in fan_ins.items():
        node = params[top]
        if isinstance(sub, dict):
            for dname, fi in sub.items():
                for pname, leaf in node[dname].items():
                    check(leaf, fi, f"{top}/{dname}/{pname}")
        elif top.startswith("tier1"):
            check(node, sub, top)
        else:
            for dname, d in node.items():
                for pname, leaf in d.items():
                    check(leaf, sub, f"{top}/{dname}/{pname}")


def test_mhim_init_matches_reference_xavier():
    """MHIM's reference applies `initialize_weights` (xavier_normal
    kernels, zero biases, `modules/mhim.py:9-17`) to every Linear —
    check a projection kernel's std and that its bias IS zero."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.mhim import MHIM

    m = MHIM(n_class=2, mlp_dim=128)
    params = m.init({"params": jax.random.PRNGKey(0)},
                    jnp.ones((1, 64, 384)), jnp.ones((1, 64), bool))["params"]
    k = np.asarray(params["patch_to_emb"]["kernel"])
    want_std = np.sqrt(2.0 / (k.shape[0] + k.shape[1]))
    np.testing.assert_allclose(k.std(), want_std, rtol=0.15)
    assert np.abs(np.asarray(params["patch_to_emb"]["bias"])).sum() == 0


def test_mhim_optimizer_is_coupled_adam():
    """The MHIM script trains BOTH its stages ('pure' pretrain and the
    mhim student) with plain ``torch.optim.Adam(lr, weight_decay=wd)``
    (`Step3_WSI_classification_MHIM.py:380`) — coupled L2, no clipping,
    unlike every other reference script's AdamW. One make_tx update for
    the 'mhim' and 'pure' families must equal torch's Adam step."""
    import jax
    import jax.numpy as jnp
    import optax
    from types import SimpleNamespace

    import acmil_tpu.models.mhim  # noqa: F401 — registers the families
    from acmil_tpu.engine.families import get_family

    rs = np.random.RandomState(11)
    lr, wd = 2e-3, 1e-4
    params = {"patch_to_emb": {"kernel": rs.randn(24, 16).astype(np.float32),
                               "bias": rs.randn(16).astype(np.float32)},
              "predictor": {"kernel": rs.randn(16, 2).astype(np.float32) * 4}}
    grads = jax.tree_util.tree_map(
        lambda a: rs.randn(*a.shape).astype(np.float32) * 2, params)

    tparams = jax.tree_util.tree_map(
        lambda a: torch.nn.Parameter(torch.from_numpy(a.copy())), params)
    tleaves = jax.tree_util.tree_leaves(tparams)
    for p, g in zip(tleaves, jax.tree_util.tree_leaves(grads)):
        p.grad = torch.from_numpy(g.copy())
    torch.optim.Adam(tleaves, lr=lr, weight_decay=wd).step()
    want = jax.tree_util.tree_map(lambda p: p.detach().numpy(), tparams)

    conf = SimpleNamespace(wd=wd)
    for family in ("mhim", "pure"):
        tx = get_family(family).make_tx(conf, lr)
        jparams = jax.tree_util.tree_map(jnp.asarray, params)
        state = tx.init(jparams)
        updates, _ = tx.update(
            jax.tree_util.tree_map(jnp.asarray, grads), state, jparams)
        got = optax.apply_updates(jparams, updates)
        _assert_tree_close(got, want, rtol=2e-5, atol=1e-6)
