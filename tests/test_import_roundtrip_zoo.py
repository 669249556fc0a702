"""Zoo-wide importer round-trips (VERDICT r4 item 5).

For every arch scripts/import_torch_checkpoint.py supports (beyond the
three dedicated tests in test_import_checkpoint.py): build the ACTUAL
reference torch module, save a reference-format ``checkpoint-best.pth``
(`utils/utils.py:415-422` payload), import it, and serve the imported
params through our real eval path (``make_eval_step`` → family probs).
The torch-side probabilities are computed with the same family convention
(softmax on the slide logits; DSMIL's 0.5·softmax(max-instance) +
0.5·softmax(bag) mix, `engine.py:143-154`).

N = 200 is deliberately NOT a perfect square: the 'pure' (SAttention)
case serves with ``mhim_pad_mode: wrap`` and must reproduce the
reference's unmasked Nystrom front-pad + sequence-wrapped PPEG grid
(`modules/emb_position.py:12-39`) exactly.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
N, DF, DI = 200, 48, 32


@pytest.fixture(scope="module", autouse=True)
def _paths():
    added = []
    for p in (REF, os.path.join(REPO, "scripts"),
              os.path.join(REPO, "scripts", "refshims")):
        if p not in sys.path:
            sys.path.append(p)
            added.append(p)
    yield
    for p in added:
        sys.path.remove(p)


def _save_ckpt(tmp_path, model, conf_dict):
    from test_import_checkpoint import _save_ref_ckpt

    return _save_ref_ckpt(tmp_path, model, conf_dict)


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _stub_torchvision():
    from _stubs import stub_torchvision

    stub_torchvision()


def _stub_clam_utils():
    uu = sys.modules.setdefault("utils.utils",
                                types.ModuleType("utils.utils"))
    pkg = sys.modules.setdefault("utils", types.ModuleType("utils"))
    pkg.utils = uu
    uu.initialize_weights = lambda m: None

    def _softmax_one(x, dim=-1):
        shift = torch.clamp(x.max(dim=dim, keepdim=True).values, min=0)
        ex = torch.exp(x - shift)
        return ex / (ex.sum(dim=dim, keepdim=True) + torch.exp(-shift))

    uu.softmax_one = _softmax_one


class _Conf:
    def __init__(self, **kw):
        self.__dict__.update(kw)


# ---------------------------------------------------------------------------
# per-arch: (conf_dict, build_torch(), torch_probs(tm, x) -> np [C])
# ---------------------------------------------------------------------------

def _case_abmil():
    from architecture.transformer import ABMIL

    tm = ABMIL(_Conf(D_feat=DF, D_inner=DI, n_class=2))

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="abmil"), tm, probs


def _case_mha():
    from architecture.transformer import ACMIL_MHA

    tm = ACMIL_MHA(_Conf(D_feat=DF, D_inner=DI, n_class=2, n_token=3),
                   n_token=3, n_masked_patch=0, mask_drop=0)

    def probs(tm, x):
        _, slide, _ = tm(x)
        return _softmax(slide.numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, n_token=3,
                n_masked_patch=0, mask_drop=0.0, arch="mha"), tm, probs


def _case_mha_single():
    from architecture.transformer import MHA

    tm = MHA(_Conf(D_feat=DF, D_inner=DI, n_class=2))

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2,
                arch="mha_single"), tm, probs


def _case_clam_mb():
    _stub_torchvision()
    _stub_clam_utils()
    from architecture.clam import CLAM_MB

    tm = CLAM_MB(_Conf(D_feat=DF, D_inner=DI, n_class=2), dropout=False)

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, droprate=0.0,
                arch="clam_mb"), tm, probs


def _case_dsmil():
    _stub_torchvision()
    from architecture.dsmil import BClassifier, FCLayer, MILNet

    tm = MILNet(FCLayer(DF, 2),
                BClassifier(_Conf(D_feat=DF, D_inner=DI, n_class=2),
                            nonlinear=False))

    def probs(tm, x):
        inst, bag_pred, _ = tm(x)
        mx = inst.numpy().max(axis=0)
        return 0.5 * _softmax(mx) + 0.5 * _softmax(bag_pred.numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="dsmil"), tm, probs


def _case_ibmil():
    from architecture.ibmil import IBMIL

    tm = IBMIL(_Conf(D_feat=DF, D_inner=DI, n_class=2, c_path=None))

    def probs(tm, x):
        logits, _, _ = tm(x)
        return _softmax(logits.numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="ibmil"), tm, probs


def _case_lbmil():
    from architecture.lbmil import LBMIL

    tm = LBMIL(_Conf(D_feat=DF, D_inner=DI, n_class=2))

    def probs(tm, x):
        y, _, _ = tm(x)
        return _softmax(y.numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="lbmil"), tm, probs


def _case_meanmil():
    _stub_torchvision()
    from modules.mean_max import MeanMIL

    tm = MeanMIL(_Conf(D_feat=DF, D_inner=DI, n_class=2))

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="meanmil"), tm, probs


def _case_maxmil():
    _stub_torchvision()
    from modules.mean_max import MaxMIL

    tm = MaxMIL(_Conf(D_feat=DF, D_inner=DI, n_class=2))

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="maxmil"), tm, probs


def _case_ilra():
    from architecture.ilra import ILRA

    tm = ILRA(num_layers=2, feat_dim=DF, n_classes=2, hidden_feat=256,
              num_heads=8, topk=1, ln=True)

    def probs(tm, x):
        return _softmax(tm(x).numpy().reshape(-1))

    return dict(D_feat=DF, D_inner=DI, n_class=2, arch="ilra"), tm, probs


def _case_attmil():
    _stub_torchvision()   # attmil.py imports torchvision.models
    from architecture.attmil import DAttention

    tm = DAttention(n_classes=2, dropout=False, act="relu")

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    # reference hardcodes the 1024->512 stem (`attmil.py:106`)
    return dict(D_feat=1024, D_inner=DI, n_class=2, arch="attmil"), tm, probs


def _case_attmil_gated():
    _stub_torchvision()
    from architecture.attmil import AttentionGated

    tm = AttentionGated(act="relu", bias=False, dropout=False)

    def probs(tm, x):
        return _softmax(tm(x).numpy())[0]

    return (dict(D_feat=1024, D_inner=DI, n_class=2, arch="attmil_gated"),
            tm, probs)


def _case_pure():
    from modules.mhim import MHIM

    tm = MHIM(mlp_dim=64, n_classes=2, dropout=0.0, act="relu",
              baseline="selfattn", feat_dim=DF)

    def probs(tm, x):
        logits, _ = tm.forward_teacher(x, return_attn=True)
        return _softmax(tm.predictor(logits).detach().numpy())[0]

    return dict(D_feat=DF, n_class=2, mlp_dim=64, baseline="selfattn",
                act="relu", dropout=0.0, mhim_pad_mode="wrap",
                arch="pure"), tm, probs


def _case_mhim_attn():
    from modules.mhim import MHIM

    tm = MHIM(mlp_dim=64, n_classes=2, dropout=0.0, act="relu",
              baseline="attn", da_act="gelu", feat_dim=DF)

    def probs(tm, x):
        feat, _ = tm.forward_teacher(x, return_attn=True)
        return _softmax(tm.predictor(feat).detach().numpy())[0]

    return dict(D_feat=DF, n_class=2, mlp_dim=64, baseline="attn",
                act="relu", da_act="gelu", dropout=0.0,
                arch="mhim"), tm, probs


def _case_bmil_vis():
    _stub_torchvision()
    # an earlier import_checkpoint call may have registered the bare
    # utils.utils Struct stub; bmil.py needs initialize_weights on it
    _stub_clam_utils()
    from architecture.bmil import probabilistic_MIL_Bayes_vis

    tm = probabilistic_MIL_Bayes_vis(gate=True, dropout=False, n_classes=2)

    def probs(tm, x):
        top, _, _, _, _ = tm(x[0])
        return _softmax(top.numpy())[0]

    return dict(D_feat=1024, n_class=2, arch="bmil_vis"), tm, probs


CASES = {
    "abmil": _case_abmil,
    "mha": _case_mha,
    "mha_single": _case_mha_single,
    "clam_mb": _case_clam_mb,
    "dsmil": _case_dsmil,
    "ibmil": _case_ibmil,
    "lbmil": _case_lbmil,
    "meanmil": _case_meanmil,
    "maxmil": _case_maxmil,
    "ilra": _case_ilra,
    "attmil": _case_attmil,
    "attmil_gated": _case_attmil_gated,
    "pure": _case_pure,
    "mhim": _case_mhim_attn,
    "bmil_vis": _case_bmil_vis,
}


@pytest.mark.parametrize("arch", sorted(CASES))
def test_import_roundtrip(arch, tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from import_torch_checkpoint import import_checkpoint

    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.engine.train import create_train_state, make_eval_step
    from acmil_tpu.models import build_mil_model

    conf_dict, tm, torch_probs = CASES[arch]()
    tm.eval()
    if arch == "bmil_vis":
        # the reference samples noise even in eval (`linear_vdo.py`
        # forward); zero it so both sides are the deterministic mean path
        monkeypatch.setattr(torch, "normal",
                            lambda mean, std: torch.zeros_like(mean))
        monkeypatch.setattr(torch, "randn_like",
                            lambda t: torch.zeros_like(t))

    ckpt = _save_ckpt(tmp_path, tm, conf_dict)
    out_dir = str(tmp_path / "ours")
    conf2, params = import_checkpoint(ckpt, out_dir)
    assert conf2.arch == arch

    rs = np.random.RandomState(3)
    x_np = rs.randn(1, N, conf_dict["D_feat"]).astype(np.float32)
    with torch.no_grad():
        want = torch_probs(tm, torch.from_numpy(x_np))

    model, family = build_mil_model(conf2)
    fam = get_family(family)
    bag = Bag(feats=jnp.asarray(x_np), mask=jnp.ones((1, N), bool),
              coords=jnp.zeros((1, N, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    eval_step = make_eval_step(model, fam)
    got = np.asarray(eval_step(params, bag))[0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    # and the written orbax dir restores into a fresh TrainState
    from acmil_tpu.engine.checkpoint import CheckpointManager

    state = create_train_state(model, conf2, jax.random.PRNGKey(0), bag,
                               steps_per_epoch=1, family=fam)
    state = CheckpointManager(out_dir).restore("best", state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
