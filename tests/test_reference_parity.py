"""Numerical parity against the reference torch implementation.

Loads the actual reference models from /root/reference (read-only), maps
their torch weights into our flax trees, and compares forward outputs on
identical bags. Skipped automatically when the reference checkout or torch
is unavailable (these tests document parity; the rest of the suite is
self-contained).
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: deselect with -m "not slow"

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REF not in sys.path:
    # APPEND, not insert(0): the reference repo carries same-named
    # top-level files (IBMIL_clustering.py, Step*.py) that would shadow
    # ours for any test that imports them after this module loads
    sys.path.append(REF)
_SHIMS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "refshims")
if _SHIMS not in sys.path:
    # after REF: reference packages win; the shims only satisfy its
    # missing deps (wandb/timm/torchmetrics/torchvision) so any parity
    # test passes in isolation, not just after a test that stubbed them
    sys.path.append(_SHIMS)


class _Conf(types.SimpleNamespace):
    pass


def _lin(mod):
    return {"kernel": mod.weight.detach().numpy().T.copy(),
            **({"bias": mod.bias.detach().numpy().copy()}
               if mod.bias is not None else {})}


@pytest.fixture(scope="module")
def bag():
    rs = np.random.RandomState(0)
    return rs.randn(1, 200, 48).astype(np.float32)


def test_acmil_ga_parity(bag):
    from architecture.transformer import ACMIL_GA as TorchACMIL

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.acmil import ACMIL_GA

    conf = _Conf(D_feat=48, D_inner=32, n_class=2, n_token=3)
    tm = TorchACMIL(conf, D=16, n_token=3, n_masked_patch=0, mask_drop=0)
    tm.eval()

    # map torch params -> flax tree
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": tm.dimreduction.fc1.weight.detach().numpy().T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin(tm.attention.attention_V[0]),
            "Dense_1": _lin(tm.attention.attention_U[0]),
            "Dense_2": _lin(tm.attention.attention_weights),
        },
        "branch_w": np.stack([c.fc.weight.detach().numpy().T
                              for c in tm.classifier]),
        "branch_b": np.stack([c.fc.bias.detach().numpy()
                              for c in tm.classifier]),
        "Classifier1fc_0": {"Dense_0": _lin(tm.Slide_classifier.fc)},
    }

    with torch.no_grad():
        t_sub, t_slide, t_attn = tm(torch.from_numpy(bag))

    fm = ACMIL_GA(n_class=2, d_inner=32, d_attn=16, n_token=3)
    f_sub, f_slide, f_attn = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(bag), jnp.ones((1, 200), bool), deterministic=True)

    np.testing.assert_allclose(np.asarray(f_sub[0]), t_sub.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_slide), t_slide.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_attn), t_attn.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_abmil_parity(bag):
    from architecture.transformer import ABMIL as TorchABMIL

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.acmil import ABMIL

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    tm = TorchABMIL(conf, D=16)
    tm.eval()
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": tm.dimreduction.fc1.weight.detach().numpy().T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin(tm.attention.attention_V[0]),
            "Dense_1": _lin(tm.attention.attention_U[0]),
            "Dense_2": _lin(tm.attention.attention_weights),
        },
        "Classifier1fc_0": {"Dense_0": _lin(tm.classifier.fc)},
    }
    with torch.no_grad():
        t_out = tm(torch.from_numpy(bag))
    fm = ABMIL(n_class=2, d_inner=32, d_attn=16)
    f_out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     jnp.asarray(bag), jnp.ones((1, 200), bool),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dsmil_parity(bag):
    # reference dsmil.py imports torchvision at module level but never
    # uses it in the classes under test — stub it out
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    from architecture.dsmil import BClassifier, FCLayer, MILNet

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.dsmil import DSMIL

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    tm = MILNet(FCLayer(48, 2), BClassifier(conf, nonlinear=False))
    tm.eval()

    params = {
        "Dense_0": _lin(tm.i_classifier.fc[0]),    # FCLayer wraps a Sequential
        "Dense_1": _lin(tm.b_classifier.q),        # linear q (nonlinear=False)
        "fcc_w": tm.b_classifier.fcc.weight.detach().numpy().reshape(2, -1).copy(),
        "fcc_b": tm.b_classifier.fcc.bias.detach().numpy().copy(),
    }
    with torch.no_grad():
        t_inst, t_bag, t_attn = tm(torch.from_numpy(bag))

    fm = DSMIL(n_class=2, d_feat=48, d_inner=32, nonlinear=False)
    f_inst, f_bag, f_attn = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(bag), jnp.ones((1, 200), bool), deterministic=True)

    np.testing.assert_allclose(np.asarray(f_inst[0]), t_inst.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_bag), t_bag.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_attn[0]), t_attn.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lbmil_parity(bag):
    from architecture.lbmil import LBMIL as TorchLBMIL

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.lbmil import LBMIL

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    tm = TorchLBMIL(conf)
    tm.eval()
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": tm.dimreduction.fc1.weight.detach().numpy().T.copy()}},
        "cls_w": tm.classifier.weight.detach().numpy().T.copy(),
        "cls_b": tm.classifier.bias.detach().numpy().copy(),
    }
    with torch.no_grad():
        t_y, t_c, t_alpha = tm(torch.from_numpy(bag))
    fm = LBMIL(n_class=2, d_inner=32)
    f_y, f_alpha = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(bag), jnp.ones((1, 200), bool), deterministic=True,
        return_attn=True)
    np.testing.assert_allclose(np.asarray(f_y[0]), t_y.numpy()[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_alpha[0, 0]), t_alpha.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clam_sb_parity(bag):
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    # reference clam imports utils.utils which pulls wandb etc.; stub the
    # two names it needs
    fake_utils = types.ModuleType("utils.utils")
    fake_utils.initialize_weights = lambda m: None
    import torch.nn.functional as F

    def softmax_one(x, dim=-1):
        ex = torch.exp(x - torch.clamp(x.max(dim=dim, keepdim=True).values,
                                       min=0))
        shift = torch.clamp(x.max(dim=dim, keepdim=True).values, min=0)
        return ex / (ex.sum(dim=dim, keepdim=True) + torch.exp(-shift))

    fake_utils.softmax_one = softmax_one
    pkg = types.ModuleType("utils")
    pkg.utils = fake_utils
    sys.modules.setdefault("utils", pkg)
    sys.modules.setdefault("utils.utils", fake_utils)

    from architecture.clam import CLAM_SB as TorchCLAM

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.clam import CLAM_SB

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    tm = TorchCLAM(conf, dropout=False)
    tm.eval()
    # attention_net = Sequential(Linear, ReLU, Attn_Net_Gated)
    stem = tm.attention_net[0]
    ang = tm.attention_net[2]
    params = {
        "Dense_0": _lin(stem),
        "AttnNetGated_0": {
            "Dense_0": _lin(ang.attention_a[0]),
            "Dense_1": _lin(ang.attention_b[0]),
            "Dense_2": _lin(ang.attention_c),
        },
        "Dense_1": _lin(tm.classifiers),
        "inst_w": np.stack([c.weight.detach().numpy().T
                            for c in tm.instance_classifiers]),
        "inst_b": np.stack([c.bias.detach().numpy()
                            for c in tm.instance_classifiers]),
    }
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(bag))

    fm = CLAM_SB(n_class=2, d_inner=32, d_attn=128, droprate=0.0)
    out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                   jnp.asarray(bag), jnp.ones((1, 200), bool),
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), t_logits.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_acmil_mha_parity(bag):
    """The K per-token torch attention modules vs our single vmapped
    module with stacked-K params."""
    from architecture.transformer import ACMIL_MHA as TorchMHA

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.acmil import ACMIL_MHA

    conf = _Conf(D_feat=48, D_inner=32, n_class=2, n_token=3)
    tm = TorchMHA(conf, n_token=3, n_masked_patch=0, mask_drop=0)
    tm.eval()

    def stack(fn):
        return np.stack([fn(sa) for sa in tm.sub_attention])

    vm = {
        "Dense_0": {"kernel": stack(lambda sa: sa.q_proj.weight.detach().numpy().T),
                    "bias": stack(lambda sa: sa.q_proj.bias.detach().numpy())},
        "Dense_1": {"kernel": stack(lambda sa: sa.k_proj.weight.detach().numpy().T),
                    "bias": stack(lambda sa: sa.k_proj.bias.detach().numpy())},
        "Dense_2": {"kernel": stack(lambda sa: sa.v_proj.weight.detach().numpy().T),
                    "bias": stack(lambda sa: sa.v_proj.bias.detach().numpy())},
        "Dense_3": {"kernel": stack(lambda sa: sa.out_proj.weight.detach().numpy().T),
                    "bias": stack(lambda sa: sa.out_proj.bias.detach().numpy())},
        "LayerNorm_0": {"scale": stack(lambda sa: sa.layer_norm.weight.detach().numpy()),
                        "bias": stack(lambda sa: sa.layer_norm.bias.detach().numpy())},
    }
    ba = tm.bag_attention
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": tm.dimreduction.fc1.weight.detach().numpy().T.copy()}},
        "q": tm.q.detach().numpy().copy(),
        "VmapMultiHeadAttention_0": vm,
        "branch_w": np.stack([c.fc.weight.detach().numpy().T
                              for c in tm.classifier]),
        "branch_b": np.stack([c.fc.bias.detach().numpy()
                              for c in tm.classifier]),
        "BagAttention_0": {
            "Dense_0": _lin(ba.v_proj),
            "Dense_1": _lin(ba.out_proj),
            "LayerNorm_0": {"scale": ba.layer_norm.weight.detach().numpy(),
                            "bias": ba.layer_norm.bias.detach().numpy()},
        },
        "Classifier1fc_0": {"Dense_0": _lin(tm.Slide_classifier.fc)},
    }
    with torch.no_grad():
        t_sub, t_slide, t_attn = tm(torch.from_numpy(bag))

    fm = ACMIL_MHA(n_class=2, d_inner=32, n_token=3, num_heads=8)
    f_sub, f_slide, f_attn = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(bag), jnp.ones((1, 200), bool), deterministic=True)

    # torch returns sub as cat over tokens [K, C]; attn as [H, K, N]
    np.testing.assert_allclose(np.asarray(f_sub[0]), t_sub.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_attn[0]), t_attn.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_slide), t_slide.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_ibmil_parity(bag):
    from architecture.ibmil import IBMIL as TorchIBMIL

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.ibmil import IBMIL

    conf = _Conf(D_feat=48, D_inner=32, n_class=2, c_path=None)
    tm = TorchIBMIL(conf)
    tm.eval()
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": tm.dimreduction.fc1.weight.detach().numpy().T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin(tm.attention.attention_V[0]),
            "Dense_1": _lin(tm.attention.attention_U[0]),
            "Dense_2": _lin(tm.attention.attention_weights),
        },
        "Classifier1fc_0": {"Dense_0": _lin(tm.classifier.fc)},
    }
    with torch.no_grad():
        t_logits, t_feat, t_attn = tm(torch.from_numpy(bag))
    fm = IBMIL(n_class=2, d_inner=32, d_attn=128)
    out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                   jnp.asarray(bag), jnp.ones((1, 200), bool),
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), t_logits.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["bag_feat"]), t_feat.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_nystrom_core_parity():
    """Our masked Nystrom core vs the reference's vendored NystromAttention
    on a no-padding case (n % landmarks == 0, full mask) where both
    definitions coincide."""
    from architecture.nystrom_attention import NystromAttention as TorchNy

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.transmil import NystromAttention as FlaxNy

    dim, heads, dh, m, n = 32, 4, 8, 8, 64
    tm = TorchNy(dim=dim, dim_head=dh, heads=heads, num_landmarks=m,
                 pinv_iterations=6, residual=True, dropout=0.0)
    tm.eval()

    params = {
        "Dense_0": {"kernel": tm.to_qkv.weight.detach().numpy().T.copy()},
        "res_conv": tm.res_conv.weight.detach().numpy()[:, 0, :, 0].copy(),
        "Dense_1": _lin(tm.to_out[0]),
    }
    rs = np.random.RandomState(0)
    x = rs.randn(1, n, dim).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()

    fm = FlaxNy(dim=dim, heads=heads, dim_head=dh, num_landmarks=m,
                pinv_iterations=6, residual=True, droprate=0.0)
    f_out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     jnp.asarray(x), jnp.ones((1, n), bool),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(f_out), t_out, rtol=5e-4, atol=5e-4)


def test_ilra_parity(bag):
    from architecture.ilra import ILRA as TorchILRA

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.ilra import ILRA

    tm = TorchILRA(num_layers=2, feat_dim=48, n_classes=2, hidden_feat=32,
                   num_heads=4, topk=1, ln=True)
    tm.eval()

    def mha_params(mod):
        """reference MultiHeadAttention (ilra.py:25) -> our _MHA tree
        (fc_q/fc_k/fc_v, then the attention's fused in-projection thirds,
        out_proj, fc_o, LNs, gate)."""
        ipw = mod.multihead_attn.in_proj_weight.detach().numpy()
        ipb = mod.multihead_attn.in_proj_bias.detach().numpy()
        d = ipw.shape[1]
        out = {
            "Dense_0": _lin(mod.fc_q),
            "Dense_1": _lin(mod.fc_k),
            "Dense_2": _lin(mod.fc_v),
            "Dense_3": {"kernel": ipw[:d].T.copy(), "bias": ipb[:d].copy()},
            "Dense_4": {"kernel": ipw[d:2 * d].T.copy(),
                        "bias": ipb[d:2 * d].copy()},
            "Dense_5": {"kernel": ipw[2 * d:].T.copy(),
                        "bias": ipb[2 * d:].copy()},
            "Dense_6": _lin(mod.multihead_attn.out_proj),
            "Dense_7": _lin(mod.fc_o),
            "LayerNorm_0": {"scale": mod.ln0.weight.detach().numpy(),
                            "bias": mod.ln0.bias.detach().numpy()},
            "LayerNorm_1": {"scale": mod.ln1.weight.detach().numpy(),
                            "bias": mod.ln1.bias.detach().numpy()},
        }
        if mod.gate is not None:
            out["Dense_8"] = _lin(mod.gate[0])
        return out

    params = {}
    for i, blk in enumerate(tm.gab_blocks):
        params[f"GAB_{i}"] = {
            "latent": blk.latent.detach().numpy().copy(),
            "_MHA_0": mha_params(blk.project_forward),
            "_MHA_1": mha_params(blk.project_backward),
        }
    params["NLP_0"] = {"seeds": tm.pooling.S.detach().numpy().copy(),
                       "_MHA_0": mha_params(tm.pooling.mha)}
    params["Dense_0"] = _lin(tm.classifier)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(bag))

    fm = ILRA(n_class=2, num_layers=2, hidden_feat=32, num_heads=4, topk=1,
              ln=True)
    f_out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     jnp.asarray(bag), jnp.ones((1, 200), bool),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy().reshape(1, -1),
                               rtol=5e-4, atol=5e-4)


def test_dtfd_parity_single_group():
    """DTFD with numGroup=1 is deterministic up to patch permutation
    (attention pooling and top/bottom-k selection are permutation
    invariant), so the whole two-tier pipeline can be compared."""
    from architecture.Attention import Attention_Gated as RefAttention
    from architecture.Attention import Attention_with_Classifier
    from architecture.network import Classifier_1fc, DimReduction as RefDR

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.dtfd import DTFD

    rs = np.random.RandomState(3)
    bag = rs.randn(1, 64, 48).astype(np.float32)
    L, C, k = 32, 2, 2

    dimred = RefDR(48, L)
    attn = RefAttention(L, 16, 1)
    cls1 = Classifier_1fc(L, C, 0)
    ucls = Attention_with_Classifier(L=L, D=16, K=1, num_cls=C)
    for m in (dimred, attn, cls1, ucls):
        m.eval()

    with torch.no_grad():
        x = torch.from_numpy(bag[0])
        mid = dimred(x)
        a = torch.softmax(attn(mid, isNorm=False), dim=1)
        att_feats = mid * a.t()
        pooled = att_feats.sum(dim=0, keepdim=True)
        t_tier1 = cls1(pooled)
        # CAM distillation (get_cam_1d without bias)
        cam = att_feats @ cls1.fc.weight.t()
        prob = torch.softmax(cam, dim=1)[:, -1]
        order = torch.argsort(prob, descending=True)
        sel = torch.cat([order[:k], order[-k:]])
        d_feat = mid[sel]
        t_tier2 = ucls(d_feat)

    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": dimred.fc1.weight.detach().numpy().T.copy()}},
        "AttentionGated_0": {
            "Dense_0": _lin(attn.attention_V[0]),
            "Dense_1": _lin(attn.attention_U[0]),
            "Dense_2": _lin(attn.attention_weights),
        },
        "tier1_w": cls1.fc.weight.detach().numpy().T.copy(),
        "tier1_b": cls1.fc.bias.detach().numpy().copy(),
        "AttentionGated_1": {
            "Dense_0": _lin(ucls.attention.attention_V[0]),
            "Dense_1": _lin(ucls.attention.attention_U[0]),
            "Dense_2": _lin(ucls.attention.attention_weights),
        },
        "Classifier1fc_0": {"Dense_0": _lin(ucls.classifier.fc)},
    }
    fm = DTFD(n_class=C, d_inner=L, d_attn=16, num_group=1,
              instance_per_group=k, distill="MaxMinS")
    out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                   jnp.asarray(bag), jnp.ones((1, 64), bool),
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out["sub_preds"][0]),
                               t_tier1.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["logits"]), t_tier2.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_bmil_vis_parity(bag, monkeypatch):
    """BMIL-vis with the Gaussian noise suppressed: reference samples even
    in eval (linear_vdo.py forward, bmil.py reparameterize); zeroing the
    noise sources makes both sides the deterministic mean path."""
    # reference bmil.py pulls in utils.utils which does
    # ``from torchvision import transforms`` at module level but never
    # uses it on this path — stub both names so the test passes in
    # isolation (the dsmil test above stubs the bare module already)
    from _stubs import stub_torchvision

    stub_torchvision()
    from architecture.bmil import probabilistic_MIL_Bayes_vis

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.bmil import BMILVis

    tm = probabilistic_MIL_Bayes_vis(gate=True, dropout=False, n_classes=2)
    tm.eval()
    monkeypatch.setattr(torch, "normal",
                        lambda mean, std: torch.zeros_like(mean))
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))

    # reference vis hardcodes size [1024, 512, 256]
    rs = np.random.RandomState(7)
    big = rs.randn(1, 100, 1024).astype(np.float32)
    with torch.no_grad():
        t_top, t_prob, _, t_yprobs, t_attn = tm(torch.from_numpy(big[0]))

    ang = tm.attention_net[2]
    params = {
        "Dense_0": _lin(tm.attention_net[0]),
        "Dense_1": _lin(ang.attention_a[0]),
        "Dense_2": _lin(ang.attention_b[0]),
        "Dense_3": _lin(ang.attention_c),
        "LinearVDO_0": {
            "kernel": tm.classifiers.weight.detach().numpy().T.copy(),
            "bias": tm.classifiers.bias.detach().numpy().copy(),
            "log_alp": tm.classifiers.log_alp.detach().numpy().T.copy(),
        },
    }
    fm = BMILVis(n_class=2, d_feat=1024, d_hidden=512, d_attn=256,
                 droprate=0.0, with_kl=False)
    out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                   jnp.asarray(big), jnp.ones((1, 100), bool),
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), t_top.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["attn"][0, 0]),
                               t_attn.numpy()[0], rtol=2e-4, atol=2e-5)


def test_clam_mb_parity(bag):
    """Multi-branch CLAM: per-class attention + per-class bag classifiers
    with softmax_one normalisation (`clam.py:211-282`)."""
    import jax
    import jax.numpy as jnp

    from architecture.clam import CLAM_MB as TorchCLAM

    from acmil_tpu.models.clam import CLAM_MB

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    tm = TorchCLAM(conf, dropout=False)
    tm.eval()
    stem = tm.attention_net[0]
    ang = tm.attention_net[2]
    params = {
        "Dense_0": _lin(stem),
        "AttnNetGated_0": {
            "Dense_0": _lin(ang.attention_a[0]),
            "Dense_1": _lin(ang.attention_b[0]),
            "Dense_2": _lin(ang.attention_c),
        },
        "bag_w": np.stack([c.weight.detach().numpy()[0]
                           for c in tm.classifiers]),
        "bag_b": np.array([c.bias.detach().numpy()[0]
                           for c in tm.classifiers]),
        "inst_w": np.stack([c.weight.detach().numpy().T
                            for c in tm.instance_classifiers]),
        "inst_b": np.stack([c.bias.detach().numpy()
                            for c in tm.instance_classifiers]),
    }
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(bag))

    fm = CLAM_MB(n_class=2, d_inner=32, d_attn=128, droprate=0.0)
    out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                   jnp.asarray(bag), jnp.ones((1, 200), bool),
                   deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), t_logits.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mha_single_query_parity(bag):
    """Single learned-query MHA baseline (`transformer.py:86-105`)."""
    import jax
    import jax.numpy as jnp

    from architecture.transformer import MHA as TorchMHA

    from acmil_tpu.models.acmil import MHA

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    tm = TorchMHA(conf)
    tm.eval()
    sa = tm.attention
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": tm.dimreduction.fc1.weight.detach().numpy().T.copy()}},
        "q": tm.q.detach().numpy().copy(),
        "MultiHeadAttention_0": {
            "Dense_0": _lin(sa.q_proj),
            "Dense_1": _lin(sa.k_proj),
            "Dense_2": _lin(sa.v_proj),
            "Dense_3": _lin(sa.out_proj),
            "LayerNorm_0": {"scale": sa.layer_norm.weight.detach().numpy(),
                            "bias": sa.layer_norm.bias.detach().numpy()},
        },
        "Classifier1fc_0": {"Dense_0": _lin(tm.classifier.fc)},
    }
    with torch.no_grad():
        t_out = tm(torch.from_numpy(bag))

    fm = MHA(n_class=2, d_inner=32, num_heads=8)
    f_out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     jnp.asarray(bag), jnp.ones((1, 200), bool),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_mean_max_parity(bag):
    """Conf-driven mean/max pooling MIL (`modules/mean_max.py:14,39`)."""
    import jax
    import jax.numpy as jnp

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    from modules.mean_max import MaxMIL as TorchMax
    from modules.mean_max import MeanMIL as TorchMean

    from acmil_tpu.models.mean_max import MaxMIL, MeanMIL

    conf = _Conf(D_feat=48, D_inner=32, n_class=2)
    for TorchCls, FlaxCls in ((TorchMean, MeanMIL), (TorchMax, MaxMIL)):
        tm = TorchCls(conf)
        tm.eval()
        params = {"Dense_0": _lin(tm.head[0]), "Dense_1": _lin(tm.head[-1])}
        with torch.no_grad():
            t_out = tm(torch.from_numpy(bag))
        fm = FlaxCls(n_class=2, d_inner=32, droprate=0.0)
        f_out = fm.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(bag), jnp.ones((1, 200), bool), deterministic=True)
        np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_transmil_wrap_pad_whole_model_parity(monkeypatch):
    """VERDICT r2 item 8: whole-model TransMIL parity under
    ``pad_mode='wrap'`` — the reference's duplicate-leading-patches
    square pad (`transMIL.py:63-66`) plus the pip package's unmasked
    front-pad rows (strict_pad). The zero-pad default remains the
    documented deviation; this un-N/As the whole-model comparison."""
    import sys as _sys

    import architecture.nystrom_attention as vendored_na
    _sys.modules.setdefault("nystrom_attention", vendored_na)
    from architecture.transMIL import TransMIL as TorchTransMIL

    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.transmil import TransMIL

    # the reference hardcodes .cuda() on the cls token (transMIL.py:71)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    rs = np.random.RandomState(11)
    n, df, L, C = 200, 48, 64, 2
    bag = rs.randn(1, n, df).astype(np.float32)

    conf = _Conf(D_feat=df, D_inner=L, n_class=C)
    tm = TorchTransMIL(conf)
    tm.eval()
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(bag))

    def layer_params(tl):
        return {
            "LayerNorm_0": {"scale": tl.norm.weight.detach().numpy().copy(),
                            "bias": tl.norm.bias.detach().numpy().copy()},
            "NystromAttention_0": {
                "Dense_0": {
                    "kernel": tl.attn.to_qkv.weight.detach().numpy().T.copy()},
                "res_conv": tl.attn.res_conv.weight
                    .detach().numpy()[:, 0, :, 0].copy(),
                "Dense_1": _lin(tl.attn.to_out[0]),
            },
        }

    def ppeg_params(pp):
        out = {}
        for name, conv in [("proj7", pp.proj), ("proj5", pp.proj1),
                           ("proj3", pp.proj2)]:
            out[name] = conv.weight.detach().numpy().copy()
            out[name + "_b"] = conv.bias.detach().numpy().copy()
        return out

    params = {
        "Dense_0": _lin(tm._fc1[0]),
        "cls_token": tm.cls_token.detach().numpy().copy(),
        "TransLayer_0": layer_params(tm.layer1),
        "PPEG_0": ppeg_params(tm.pos_layer),
        "TransLayer_1": layer_params(tm.layer2),
        "LayerNorm_0": {"scale": tm.norm.weight.detach().numpy().copy(),
                        "bias": tm.norm.bias.detach().numpy().copy()},
        "Dense_1": _lin(tm._fc2),
    }

    fm = TransMIL(n_class=C, d_inner=L, pad_mode="wrap")
    f_logits = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(bag), jnp.ones((1, n), bool), deterministic=True)
    np.testing.assert_allclose(np.asarray(f_logits), t_logits.numpy(),
                               rtol=2e-3, atol=2e-4)
