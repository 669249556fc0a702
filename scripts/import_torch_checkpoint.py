"""Import a reference torch checkpoint into an acmil_tpu checkpoint dir.

The reference saves ``checkpoint-best.pth`` as ``{'model': state_dict,
'optimizer': ..., 'epoch': ..., 'config': Struct}`` (`utils/utils.py:415-422`).
This tool translates the state_dict key-by-key into the matching flax
param tree (the same correspondences the parity suites verify on live
modules — tests/test_reference_parity.py) and writes an orbax
``checkpoint-best`` that Step4 / ``scripts/predict.py`` / ``--eval_only``
can serve — GA/CLAM heads through the fused Pallas pooling path.

Usage:
    python scripts/import_torch_checkpoint.py \
        --ckpt /path/checkpoint-best.pth --out ckpt_dir \
        [--arch ga] [--config conf.yml]

``--arch`` / dims are recovered from the checkpoint's saved config when
present; CLI flags win. No code from /root/reference is imported — the
``utils.utils.Struct`` pickle reference inside old checkpoints is
satisfied by a local stub class.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# state_dict helpers
# --------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _lin(sd, prefix):
    """torch ``nn.Linear`` at ``prefix`` → flax Dense dict."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T.copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).copy()
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]).copy(),
            "bias": _np(sd[f"{prefix}.bias"]).copy()}


def _stacked(sd, pattern, transform):
    """Collect ``pattern.format(i)`` for i = 0.. and stack."""
    out = []
    while pattern.format(len(out)) in sd:
        out.append(transform(_np(sd[pattern.format(len(out))])))
    if not out:
        raise KeyError(pattern)
    return np.stack(out)


def _gated_attention(sd, prefix):
    """reference ``Attention_Gated`` (`transformer.py:239`) → our
    AttentionGated/AttnNetGated Dense triple."""
    return {
        "Dense_0": _lin(sd, f"{prefix}.attention_V.0"),
        "Dense_1": _lin(sd, f"{prefix}.attention_U.0"),
        "Dense_2": _lin(sd, f"{prefix}.attention_weights"),
    }


# --------------------------------------------------------------------------
# per-arch converters: state_dict -> flax param tree
# --------------------------------------------------------------------------

def convert_acmil_ga(sd):
    """`transformer.py:291` ACMIL_GA (also ABMIL when the branch list is
    absent) → models/acmil.py tree (mapping proven by
    test_reference_parity.py::test_acmil_ga_parity)."""
    params = {
        "DimReduction_0": {"Dense_0": {
            "kernel": _np(sd["dimreduction.fc1.weight"]).T.copy()}},
        "AttentionGated_0": _gated_attention(sd, "attention"),
    }
    if "classifier.0.fc.weight" in sd:       # ACMIL_GA branch classifiers
        params["branch_w"] = _stacked(sd, "classifier.{}.fc.weight",
                                      lambda a: a.T.copy())
        params["branch_b"] = _stacked(sd, "classifier.{}.fc.bias",
                                      lambda a: a.copy())
        params["Classifier1fc_0"] = {
            "Dense_0": _lin(sd, "Slide_classifier.fc")}
    else:                                     # ABMIL
        params["Classifier1fc_0"] = {"Dense_0": _lin(sd, "classifier.fc")}
    return params


def convert_clam(sd):
    """`clam.py:85/211` CLAM_SB/MB → models/clam.py tree. The
    Attn_Net_Gated index inside ``attention_net`` shifts with the dropout
    flag, so it is located by key pattern."""
    m = None
    for k in sd:
        m = m or re.match(r"attention_net\.(\d+)\.attention_a\.0\.weight", k)
    if m is None:
        raise KeyError("no Attn_Net_Gated inside attention_net — "
                       "gate=False CLAM (Attn_Net) import is not supported")
    ang = f"attention_net.{m.group(1)}"
    params = {
        "Dense_0": _lin(sd, "attention_net.0"),
        "AttnNetGated_0": {
            "Dense_0": _lin(sd, f"{ang}.attention_a.0"),
            "Dense_1": _lin(sd, f"{ang}.attention_b.0"),
            "Dense_2": _lin(sd, f"{ang}.attention_c"),
        },
        "inst_w": _stacked(sd, "instance_classifiers.{}.weight",
                           lambda a: a.T.copy()),
        "inst_b": _stacked(sd, "instance_classifiers.{}.bias",
                           lambda a: a.copy()),
    }
    if "classifiers.weight" in sd:            # SB: one Linear(L, C)
        params["Dense_1"] = _lin(sd, "classifiers")
    else:                                     # MB: per-class Linear(L, 1)
        params["bag_w"] = _stacked(sd, "classifiers.{}.weight",
                                   lambda a: a[0].copy())
        params["bag_b"] = _stacked(sd, "classifiers.{}.bias",
                                   lambda a: a[0].copy())[:, ]
    return params


def convert_dsmil(sd):
    """`dsmil.py:88` MILNet (nonlinear=False — the generic trainer's
    build, `Step3_WSI_classification.py:129-131`)."""
    if "b_classifier.q.0.weight" in sd:
        raise NotImplementedError(
            "DSMIL nonlinear=True checkpoints are not supported (the "
            "generic trainer builds BClassifier(nonlinear=False))")
    n_class = sd["b_classifier.fcc.weight"].shape[0]
    return {
        "Dense_0": _lin(sd, "i_classifier.fc.0"),
        "Dense_1": _lin(sd, "b_classifier.q"),
        "fcc_w": _np(sd["b_classifier.fcc.weight"])
        .reshape(n_class, -1).copy(),
        "fcc_b": _np(sd["b_classifier.fcc.bias"]).copy(),
    }


def convert_ibmil(sd):
    """`ibmil.py:38` (phase-1 / no-confounder checkpoints)."""
    if any("confounder" in k for k in sd):
        raise NotImplementedError(
            "IBMIL confounder-phase checkpoints are not supported yet — "
            "import the phase-1 checkpoint and re-run the confounder "
            "phase through IBMIL_clustering.py")
    return {
        "DimReduction_0": {"Dense_0": {
            "kernel": _np(sd["dimreduction.fc1.weight"]).T.copy()}},
        "AttentionGated_0": _gated_attention(sd, "attention"),
        "Classifier1fc_0": {"Dense_0": _lin(sd, "classifier.fc")},
    }


def convert_lbmil(sd):
    return {
        "DimReduction_0": {"Dense_0": {
            "kernel": _np(sd["dimreduction.fc1.weight"]).T.copy()}},
        "cls_w": _np(sd["classifier.weight"]).T.copy(),
        "cls_b": _np(sd["classifier.bias"]).copy(),
    }


def convert_mean_max(sd):
    """`modules/mean_max.py` — head = Sequential(Linear, ReLU, [Dropout,]
    Linear); the two Linears are head.0 and the highest index."""
    idx = sorted({int(m.group(1)) for k in sd
                  for m in [re.match(r"head\.(\d+)\.weight", k)] if m})
    return {"Dense_0": _lin(sd, f"head.{idx[0]}"),
            "Dense_1": _lin(sd, f"head.{idx[-1]}")}


def _nystrom(sd, prefix):
    return {
        "Dense_0": {"kernel": _np(sd[f"{prefix}.to_qkv.weight"]).T.copy()},
        "res_conv": _np(sd[f"{prefix}.res_conv.weight"])[:, 0, :, 0].copy(),
        "Dense_1": _lin(sd, f"{prefix}.to_out.0"),
    }


def _ppeg(sd, prefix):
    """torch PPEG convs (proj=7x7, proj1=5x5, proj2=3x3 — identical naming
    in `transMIL.py` and `modules/emb_position.py:5`) → our PPEG params."""
    out = {}
    for name, conv in [("proj7", f"{prefix}.proj"),
                       ("proj5", f"{prefix}.proj1"),
                       ("proj3", f"{prefix}.proj2")]:
        out[name] = _np(sd[f"{conv}.weight"]).copy()
        out[name + "_b"] = _np(sd[f"{conv}.bias"]).copy()
    return out


def convert_transmil(sd):
    """`transMIL.py:48` → models/transmil.py (mapping proven by
    test_transmil_wrap_pad_whole_model_parity). NOTE: reference-trained
    TransMIL weights should be served with ``transmil_pad_mode: wrap``
    for exact parity (PARITY.md)."""
    def layer(prefix):
        return {"LayerNorm_0": _ln(sd, f"{prefix}.norm"),
                "NystromAttention_0": _nystrom(sd, f"{prefix}.attn")}

    return {
        "Dense_0": _lin(sd, "_fc1.0"),
        "cls_token": _np(sd["cls_token"]).copy(),
        "TransLayer_0": layer("layer1"),
        "PPEG_0": _ppeg(sd, "pos_layer"),
        "TransLayer_1": layer("layer2"),
        "LayerNorm_0": _ln(sd, "norm"),
        "Dense_1": _lin(sd, "_fc2"),
    }


def convert_mhim(sd):
    """`modules/mhim.py:36` MHIM — covers both the trained student and the
    '--model pure' teacher checkpoints (`Step3_MHIM:312-314`), with either
    backbone: SAttention (baseline='selfattn', `modules/satten.py:30`) or
    DAttention (baseline='attn', `modules/datten.py`). An imported 'pure'
    dir serves directly as our CLI's ``teacher_init``."""
    params = {"patch_to_emb": _lin(sd, "patch_to_emb.0"),
              "predictor": _lin(sd, "predictor")}
    if "online_encoder.cls_token" in sd:       # SAttention
        def layer(p):
            return {"LayerNorm_0": _ln(sd, f"{p}.norm"),
                    "NystromAttention_0": _nystrom(sd, f"{p}.attn")}

        params["SAttentionEncoder_0"] = {
            "cls_token": _np(sd["online_encoder.cls_token"]).copy(),
            "TransLayer_0": layer("online_encoder.layer1"),
            "PPEG_0": _ppeg(sd, "online_encoder.pos_embedding"),
            "TransLayer_1": layer("online_encoder.layer2"),
            "LayerNorm_0": _ln(sd, "online_encoder.norm"),
        }
    else:                                       # DAttention
        att = "online_encoder.attention.attention"
        idx = sorted({int(m.group(1)) for k in sd
                      for m in [re.match(re.escape(att) + r"\.(\d+)\.weight",
                                         k)] if m})
        params["DAttentionEncoder_0"] = {
            "Dense_0": _lin(sd, f"{att}.{idx[0]}"),
            "Dense_1": _lin(sd, f"{att}.{idx[-1]}"),
        }
    return params


def convert_acmil_mha(sd):
    """`transformer.py:129` ACMIL_MHA (arch 'mha' in the ACMIL script) →
    our single vmapped module with stacked-K params (mapping proven by
    test_acmil_mha_parity)."""
    def stack_lin(pat):
        return {"kernel": _stacked(sd, pat + ".weight",
                                   lambda a: a.T.copy()),
                "bias": _stacked(sd, pat + ".bias", lambda a: a.copy())}

    vm = {f"Dense_{i}": stack_lin(f"sub_attention.{{}}.{p}")
          for i, p in enumerate(("q_proj", "k_proj", "v_proj", "out_proj"))}
    vm["LayerNorm_0"] = {
        "scale": _stacked(sd, "sub_attention.{}.layer_norm.weight",
                          lambda a: a.copy()),
        "bias": _stacked(sd, "sub_attention.{}.layer_norm.bias",
                         lambda a: a.copy()),
    }
    return {
        "DimReduction_0": {"Dense_0": {
            "kernel": _np(sd["dimreduction.fc1.weight"]).T.copy()}},
        "q": _np(sd["q"]).copy(),
        "VmapMultiHeadAttention_0": vm,
        "branch_w": _stacked(sd, "classifier.{}.fc.weight",
                             lambda a: a.T.copy()),
        "branch_b": _stacked(sd, "classifier.{}.fc.bias",
                             lambda a: a.copy()),
        "BagAttention_0": {
            "Dense_0": _lin(sd, "bag_attention.v_proj"),
            "Dense_1": _lin(sd, "bag_attention.out_proj"),
            "LayerNorm_0": _ln(sd, "bag_attention.layer_norm"),
        },
        "Classifier1fc_0": {"Dense_0": _lin(sd, "Slide_classifier.fc")},
    }


def convert_mha_single(sd):
    """`transformer.py:86` MHA (the generic trainer's arch 'mha' →
    our 'mha_single'; mapping proven by test_mha_single_query_parity)."""
    return {
        "DimReduction_0": {"Dense_0": {
            "kernel": _np(sd["dimreduction.fc1.weight"]).T.copy()}},
        "q": _np(sd["q"]).copy(),
        "MultiHeadAttention_0": {
            "Dense_0": _lin(sd, "attention.q_proj"),
            "Dense_1": _lin(sd, "attention.k_proj"),
            "Dense_2": _lin(sd, "attention.v_proj"),
            "Dense_3": _lin(sd, "attention.out_proj"),
            "LayerNorm_0": _ln(sd, "attention.layer_norm"),
        },
        "Classifier1fc_0": {"Dense_0": _lin(sd, "classifier.fc")},
    }


def convert_attmil(sd):
    """`architecture/attmil.py:100` DAttention (arch 'attmil') and `:45`
    AttentionGated ('attmil_gated') — told apart by the gate's
    ``attention_c`` key."""
    if "attention_c.weight" in sd:
        return {"Dense_0": _lin(sd, "feature.0"),
                "Dense_1": _lin(sd, "attention_a.0"),
                "Dense_2": _lin(sd, "attention_b.0"),
                "Dense_3": _lin(sd, "attention_c"),
                "Dense_4": _lin(sd, "classifier.0")}
    # ungated: flax numbers by CONSTRUCTION order and the model builds
    # the outer 1-unit Dense before the inner tanh Dense
    # (models/attmil.py `XDense(1)(jnp.tanh(XDense(d_attn)(h)))`)
    return {"Dense_0": _lin(sd, "feature.0"),
            "Dense_1": _lin(sd, "attention.2"),
            "Dense_2": _lin(sd, "attention.0"),
            "Dense_3": _lin(sd, "classifier.0")}


def convert_bmil_vis(sd):
    """`architecture/bmil.py` probabilistic_MIL_Bayes_vis: Linear stem +
    Attn_Net_Gated (index inside ``attention_net`` shifts with the dropout
    flag, located by pattern, like CLAM) + LinearVDO head (weight/bias/
    log_alp, `linear_vdo.py`)."""
    m = None
    for k in sd:
        m = m or re.match(r"attention_net\.(\d+)\.attention_a\.0\.weight", k)
    if m is None:
        raise KeyError("no Attn_Net_Gated inside attention_net")
    ang = f"attention_net.{m.group(1)}"
    return {
        "Dense_0": _lin(sd, "attention_net.0"),
        "Dense_1": _lin(sd, f"{ang}.attention_a.0"),
        "Dense_2": _lin(sd, f"{ang}.attention_b.0"),
        "Dense_3": _lin(sd, f"{ang}.attention_c"),
        "LinearVDO_0": {
            "kernel": _np(sd["classifiers.weight"]).T.copy(),
            "bias": _np(sd["classifiers.bias"]).copy(),
            "log_alp": _np(sd["classifiers.log_alp"]).T.copy(),
        },
    }


def _ilra_mha(sd, prefix):
    ipw = _np(sd[f"{prefix}.multihead_attn.in_proj_weight"])
    ipb = _np(sd[f"{prefix}.multihead_attn.in_proj_bias"])
    d = ipw.shape[1]
    out = {
        "Dense_0": _lin(sd, f"{prefix}.fc_q"),
        "Dense_1": _lin(sd, f"{prefix}.fc_k"),
        "Dense_2": _lin(sd, f"{prefix}.fc_v"),
        "Dense_3": {"kernel": ipw[:d].T.copy(), "bias": ipb[:d].copy()},
        "Dense_4": {"kernel": ipw[d:2 * d].T.copy(),
                    "bias": ipb[d:2 * d].copy()},
        "Dense_5": {"kernel": ipw[2 * d:].T.copy(),
                    "bias": ipb[2 * d:].copy()},
        "Dense_6": _lin(sd, f"{prefix}.multihead_attn.out_proj"),
        "Dense_7": _lin(sd, f"{prefix}.fc_o"),
        "LayerNorm_0": _ln(sd, f"{prefix}.ln0"),
        "LayerNorm_1": _ln(sd, f"{prefix}.ln1"),
    }
    if f"{prefix}.gate.0.weight" in sd:
        out["Dense_8"] = _lin(sd, f"{prefix}.gate.0")
    return out


def convert_ilra(sd):
    params = {}
    i = 0
    while f"gab_blocks.{i}.latent" in sd:
        params[f"GAB_{i}"] = {
            "latent": _np(sd[f"gab_blocks.{i}.latent"]).copy(),
            "_MHA_0": _ilra_mha(sd, f"gab_blocks.{i}.project_forward"),
            "_MHA_1": _ilra_mha(sd, f"gab_blocks.{i}.project_backward"),
        }
        i += 1
    params["NLP_0"] = {"seeds": _np(sd["pooling.S"]).copy(),
                       "_MHA_0": _ilra_mha(sd, "pooling.mha")}
    params["Dense_0"] = _lin(sd, "classifier")
    return params


CONVERTERS = {
    "ga": convert_acmil_ga,
    "abmil": convert_acmil_ga,
    "clam_sb": convert_clam,
    "clam_mb": convert_clam,
    "dsmil": convert_dsmil,
    "ibmil": convert_ibmil,
    "lbmil": convert_lbmil,
    "meanmil": convert_mean_max,
    "maxmil": convert_mean_max,
    "transmil": convert_transmil,
    "ilra": convert_ilra,
    "mhim": convert_mhim,
    "pure": convert_mhim,
    "mha": convert_acmil_mha,
    "mha_single": convert_mha_single,
    "attmil": convert_attmil,
    "attmil_gated": convert_attmil,
    "bmil_vis": convert_bmil_vis,
}


# --------------------------------------------------------------------------
# checkpoint IO
# --------------------------------------------------------------------------

class Struct:
    """Unpickle stand-in for the reference's ``utils.utils.Struct``
    (`utils/utils.py:246`) — checkpoints pickle their config as one."""

    def __init__(self, *a, **kw):
        for d in a:
            self.__dict__.update(d)
        self.__dict__.update(kw)


def load_torch_checkpoint(path):
    """Load a reference ``checkpoint-*.pth``. The pickled ``config`` is a
    ``utils.utils.Struct`` — satisfied by a stub module so no reference
    code is needed."""
    import torch

    for name in ("utils", "utils.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["utils"].utils = sys.modules["utils.utils"]
    if not hasattr(sys.modules["utils.utils"], "Struct"):
        sys.modules["utils.utils"].Struct = Struct

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(ckpt, dict) or "model" not in ckpt:
        raise ValueError(f"{path} is not a reference save_model checkpoint "
                         "(expected a dict with a 'model' state_dict)")
    cfg = ckpt.get("config")
    cfg = dict(getattr(cfg, "__dict__", cfg or {}))
    return ckpt["model"], cfg, int(ckpt.get("epoch", -1))


def import_checkpoint(ckpt_path: str, out_dir: str, arch: str | None = None,
                      conf=None, tag: str = "best"):
    """Translate + write. Returns (conf, params). ``conf`` may be a
    pre-built Config; otherwise one is assembled from the checkpoint's
    saved config dict (+ ``arch`` override)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.checkpoint import CheckpointManager
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model

    sd, saved_cfg, epoch = load_torch_checkpoint(ckpt_path)
    if conf is None:
        saved_cfg = {k: v for k, v in saved_cfg.items()
                     if isinstance(v, (int, float, str, bool))}
        conf = Config.from_dict({"lr": 1e-4, "train_epoch": 1, **saved_cfg})
    if arch:
        conf.arch = arch
    if not getattr(conf, "arch", None):
        raise SystemExit("arch not recoverable from the checkpoint config; "
                         "pass --arch")
    if conf.arch not in CONVERTERS:
        raise SystemExit(f"no converter for arch {conf.arch!r} "
                         f"(supported: {sorted(CONVERTERS)})")
    params = jax.tree_util.tree_map(jnp.asarray, CONVERTERS[conf.arch](sd))

    # validate against a freshly initialised tree of the same model and
    # wrap in a full TrainState so --eval_only / --resume can restore it
    model, family = build_mil_model(conf)
    n = 64
    bag = Bag(feats=jnp.zeros((1, n, conf.D_feat), jnp.float32),
              mask=jnp.ones((1, n), bool),
              coords=jnp.zeros((1, n, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    state = create_train_state(model, conf, jax.random.PRNGKey(0), bag,
                               steps_per_epoch=1, family=family)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, state.params)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    if ref_shapes != got_shapes:
        raise SystemExit(
            "converted tree does not match the model's parameter shapes:\n"
            f"  model:     {ref_shapes}\n  converted: {got_shapes}\n"
            "check --arch and the checkpoint's D_feat/D_inner/n_class")
    state = state.replace(params=params)
    if hasattr(state, "teacher_params"):
        # MHIM: the reference loads the same checkpoint into the teacher
        # (`Step3_MHIM:340-356`); a fresh-init teacher would be noise
        state = state.replace(teacher_params=params)

    mgr = CheckpointManager(out_dir)
    mgr.save(tag, state, epoch, conf,
             metrics={"imported_from": 0.0})
    mgr.wait()
    print(f"imported {ckpt_path} (epoch {epoch}) -> "
          f"{out_dir}/checkpoint-{tag} [arch={conf.arch}]")
    return conf, params


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True,
                    help="reference checkpoint-*.pth")
    ap.add_argument("--out", required=True, help="acmil_tpu ckpt_dir")
    ap.add_argument("--arch", default=None,
                    help="override arch (else from the saved config)")
    ap.add_argument("--config", default=None,
                    help="optional YAML for model dims (else from the "
                         "saved config)")
    ap.add_argument("--tag", default="best", choices=["best", "last"])
    args = ap.parse_args(argv)
    conf = None
    if args.config:
        from acmil_tpu.config import Config
        conf = Config.from_yaml(args.config, {})
    import_checkpoint(args.ckpt, args.out, arch=args.arch, conf=conf,
                      tag=args.tag)


if __name__ == "__main__":
    main()
