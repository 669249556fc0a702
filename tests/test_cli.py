"""Integration tests for the Step3 CLI driver + checkpointing."""

import json
import os
import sys

import jax
import numpy as np
import pytest
import yaml

from acmil_tpu.cli.train import run_training
from acmil_tpu.config import Config
from acmil_tpu.data.h5io import write_feature_h5
from tests.conftest import make_synthetic_bags

pytestmark = pytest.mark.slow  # heavy lane: deselect with -m "not slow"


def _setup(tmp_path, arch="ga", epochs=2, **extra):
    slides = make_synthetic_bags(n_slides=40, d=32, seed=5)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    write_feature_h5(os.path.join(data_dir, "patch_feats_pretrain_medical_ssl.h5"),
                     slides)
    conf = Config(
        n_class=2, D_feat=32, D_inner=16, arch=arch, n_token=2,
        n_masked_patch=4, mask_drop=0.5, lr=2e-3, train_epoch=epochs,
        min_bucket=64, B=2, seed=0, data_dir=data_dir,
        ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        pretrain="medical_ssl",
    )
    # keep dims tiny (don't resolve from pretrain tag)
    conf.extra["split_dir"] = str(tmp_path / "nosplits")
    for k, v in extra.items():
        conf.extra[k] = v
    return conf


def test_run_training_acmil(tmp_path):
    conf = _setup(tmp_path, arch="ga", epochs=2)
    best = run_training(conf)
    assert "auc" in best and np.isfinite(best["auc"])
    # checkpoints written
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint-best.json"))
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint-last.json"))
    # metric log written
    lines = open(str(tmp_path / "logs" / "metrics.jsonl")).read().splitlines()
    assert any("perf/val_auc" in l for l in lines)


def test_run_training_dtfd(tmp_path):
    conf = _setup(tmp_path, arch="dtfd", epochs=1, numGroup=4, total_instance=4)
    best = run_training(conf)
    assert np.isfinite(best["auc"])


def test_checkpoint_roundtrip(tmp_path):
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.checkpoint import CheckpointManager
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model
    import jax.numpy as jnp

    conf = Config(n_class=2, D_feat=16, D_inner=8, arch="abmil", train_epoch=1)
    model, fam = build_mil_model(conf)
    bag = Bag(feats=jnp.ones((1, 64, 16)), mask=jnp.ones((1, 64), bool),
              coords=jnp.zeros((1, 64, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    state = create_train_state(model, conf, jax.random.PRNGKey(0), bag, 1)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save("best", state, epoch=3, conf=conf, metrics={"auc": 0.9})
    restored = mgr.restore("best", state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    meta = mgr.load_meta("best")
    assert meta["epoch"] == 3 and meta["metrics"]["auc"] == 0.9


def test_checkpoint_orphan_sidecar_recovery(tmp_path):
    """A hard kill between the async orbax commit and the sidecar
    promotion leaves `checkpoint-TAG.json.tmp` next to a committed
    checkpoint dir. A fresh CheckpointManager (empty pending list) must
    promote it on the next _sync so resume/adopt_checkpoint_config see
    the metadata; a tmp whose checkpoint dir never landed must NOT be
    promoted — and must be left in place, because this manager might be
    a concurrent reader racing a live writer whose async save is still
    in flight (ADVICE r2 + code-review r3)."""
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.checkpoint import CheckpointManager
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model
    import jax.numpy as jnp

    conf = Config(n_class=2, D_feat=16, D_inner=8, arch="abmil", train_epoch=1)
    model, fam = build_mil_model(conf)
    bag = Bag(feats=jnp.ones((1, 64, 16)), mask=jnp.ones((1, 64), bool),
              coords=jnp.zeros((1, 64, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    state = create_train_state(model, conf, jax.random.PRNGKey(0), bag, 1)
    ck = str(tmp_path / "ck")
    mgr = CheckpointManager(ck)
    mgr.save("best", state, epoch=5, conf=conf, metrics={"auc": 0.8})
    mgr.wait()
    # simulate the kill: demote the promoted sidecar back to .tmp
    best_json = os.path.join(ck, "checkpoint-best.json")
    os.replace(best_json, best_json + ".tmp")
    # and plant an orphan tmp for a save that never committed
    orphan = os.path.join(ck, "checkpoint-last.json.tmp")
    with open(orphan, "w") as f:
        json.dump({"epoch": 99}, f)

    mgr2 = CheckpointManager(ck)  # fresh process: empty pending list
    assert mgr2.exists("best")            # recovered via promotion
    assert mgr2.load_meta("best")["epoch"] == 5
    assert os.path.exists(best_json)
    assert not mgr2.exists("last")        # orphan NOT promoted ...
    assert os.path.exists(orphan)         # ... and left for its writer


def test_resume_training(tmp_path):
    """--resume restores epoch counter + full optimizer state."""
    conf = _setup(tmp_path, arch="abmil", epochs=2)
    run_training(conf)
    meta1 = json.load(open(str(tmp_path / "ckpt" / "checkpoint-last.json")))
    assert meta1["epoch"] == 1
    # extend to 4 epochs and resume
    conf.train_epoch = 4
    conf.extra["resume"] = True
    run_training(conf)
    meta2 = json.load(open(str(tmp_path / "ckpt" / "checkpoint-last.json")))
    assert meta2["epoch"] == 3


def test_mhim_teacher_init(tmp_path):
    """Pretrain 'pure', then init MHIM teacher from its checkpoint
    (Step3_MHIM teacher_init protocol)."""
    conf = _setup(tmp_path, arch="pure", epochs=1)
    conf.extra["mlp_dim"] = 32
    run_training(conf)
    pure_ckpt = conf.ckpt_dir

    conf2 = _setup(tmp_path / "m2", arch="mhim", epochs=1)
    conf2.extra.update(dict(mlp_dim=32, mask_ratio=0.2, mask_ratio_h=0.1,
                            teacher_init=pure_ckpt, init_stu_type="all"))
    best = run_training(conf2)
    assert "auc" in best


def test_predict_script(tmp_path, monkeypatch):
    import importlib.util

    conf = _setup(tmp_path, arch="ga", epochs=1)
    run_training(conf)

    spec = importlib.util.spec_from_file_location(
        "predict", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "predict.py"))
    mod = importlib.util.module_from_spec(spec)
    cfg = tmp_path / "p.yml"
    cfg.write_text(f"n_class: 2\ndataset: camelyon\nmin_bucket: 64\nB: 1\n"
                   f"D_feat: 32\nD_inner: 16\nseed: 0\n")
    out_csv = str(tmp_path / "preds.csv")
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--config", str(cfg), "--ckpt_dir", conf.ckpt_dir,
        "--features", os.path.join(conf.data_dir,
                                   "patch_feats_pretrain_medical_ssl.h5"),
        "--out_csv", out_csv])
    spec.loader.exec_module(mod)
    mod.main()
    lines = open(out_csv).read().splitlines()
    assert lines[0].startswith("slide_id,label,prob_0,prob_1,pred")
    assert len(lines) == 41  # 40 slides + header


def test_eval_only(tmp_path):
    conf = _setup(tmp_path, arch="abmil", epochs=1)
    run_training(conf)
    conf.extra["eval_only"] = True
    out = run_training(conf)
    assert "test_auc" in out and np.isfinite(out["test_auc"])


def test_mhim_student_init_fc(tmp_path):
    """init_stu_type='fc' copies ONLY the input projection from the
    teacher checkpoint (`Step3_MHIM:358-375` patch_to_emb branch)."""
    import jax.numpy as jnp
    import pytest
    from acmil_tpu.cli.train import init_teacher_student
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.engine.checkpoint import CheckpointManager
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model

    conf = _setup(tmp_path, arch="pure", epochs=1)
    conf.extra["mlp_dim"] = 32
    run_training(conf)
    pure_ckpt = conf.ckpt_dir
    raw = CheckpointManager(pure_ckpt).restore_raw("best")

    conf2 = _setup(tmp_path / "m2", arch="mhim", epochs=1)
    conf2.extra.update(dict(mlp_dim=32, mask_ratio=0.2, mask_ratio_h=0.1,
                            teacher_init=pure_ckpt, init_stu_type="fc"))
    model, fam = build_mil_model(conf2)
    bag = Bag(feats=jnp.ones((1, 64, 32)), mask=jnp.ones((1, 64), bool),
              coords=jnp.zeros((1, 64, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    state = create_train_state(model, conf2, jax.random.PRNGKey(1), bag, 1,
                               family=get_family(fam))
    fresh_emb = np.asarray(state.params["patch_to_emb"]["kernel"])
    fresh_pred = np.asarray(state.params["predictor"]["kernel"])
    tea_emb = np.asarray(raw["params"]["patch_to_emb"]["kernel"])
    assert not np.allclose(fresh_emb, tea_emb)

    state2 = init_teacher_student(state, conf2)
    # input projection copied from teacher, predictor untouched
    np.testing.assert_array_equal(
        np.asarray(state2.params["patch_to_emb"]["kernel"]), tea_emb)
    np.testing.assert_array_equal(
        np.asarray(state2.params["predictor"]["kernel"]), fresh_pred)
    # teacher params fully loaded
    np.testing.assert_array_equal(
        np.asarray(state2.teacher_params["predictor"]["kernel"]),
        np.asarray(raw["params"]["predictor"]["kernel"]))
    # unknown init type rejected
    conf2.extra["init_stu_type"] = "bogus"
    with pytest.raises(ValueError):
        init_teacher_student(state, conf2)


def test_run_training_scan_epoch(tmp_path):
    """--scan_epoch end-to-end through run_training (B=1 so train bags
    device-cache and the lax.scan drivers engage)."""
    conf = _setup(tmp_path, arch="ga", epochs=2)
    conf.B = 1
    conf.scan_epoch = True
    conf.extra["cache_train"] = True
    best = run_training(conf)
    assert "auc" in best and np.isfinite(best["auc"])
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint-best.json"))
