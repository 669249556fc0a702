"""Engine tests: metrics golden values, schedules, and the end-to-end
milestone — train ACMIL on synthetic separable bags and reach high AUC
(SURVEY.md §7 minimum slice, stand-in for the Camelyon16 parity run)."""

import jax
import numpy as np
import pytest

from acmil_tpu.data.h5io import build_hdf5_feat_dataset, write_feature_h5
from acmil_tpu.data.loader import BagLoader
from acmil_tpu.engine.metrics import auroc, classification_metrics, f1_macro
from acmil_tpu.engine.schedules import half_cosine_schedule
from acmil_tpu.engine.train import (
    create_train_state,
    evaluate,
    is_better,
    make_eval_step,
    make_train_step,
    train_one_epoch,
)
from acmil_tpu.models import build_mil_model
from tests.conftest import make_synthetic_bags


def test_auroc_golden():
    probs = np.array([[0.9, 0.1], [0.4, 0.6], [0.35, 0.65], [0.8, 0.2]])
    labels = np.array([0, 1, 1, 0])
    assert auroc(probs, labels) == 1.0
    labels2 = np.array([1, 0, 1, 0])
    assert auroc(probs, labels2) == 0.5


def test_auroc_ties():
    probs = np.array([[0.5, 0.5]] * 4)
    labels = np.array([0, 1, 0, 1])
    assert auroc(probs, labels) == 0.5


def test_f1_macro_golden():
    preds = np.array([0, 0, 1, 1, 1])
    labels = np.array([0, 1, 1, 1, 0])
    # class0: tp=1 fp=1 fn=1 -> 0.5 ; class1: tp=2 fp=1 fn=1 -> 2/3
    np.testing.assert_allclose(f1_macro(preds, labels, 2), (0.5 + 2 / 3) / 2)


def test_multiclass_auroc_macro():
    rs = np.random.RandomState(0)
    labels = rs.randint(0, 3, 300)
    logits = rs.randn(300, 3)
    logits[np.arange(300), labels] += 3.0
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    assert auroc(probs, labels) > 0.9


def test_half_cosine_schedule():
    sched = half_cosine_schedule(lr=1.0, min_lr=0.0, total_epochs=10,
                                 warmup_epochs=2, steps_per_epoch=10)
    assert float(sched(0)) == 0.0          # warmup start
    np.testing.assert_allclose(float(sched(10)), 0.5, rtol=1e-6)  # mid-warmup
    np.testing.assert_allclose(float(sched(20)), 1.0, rtol=1e-6)  # warmup end
    np.testing.assert_allclose(float(sched(60)), 0.5, rtol=1e-6)  # cosine mid
    assert float(sched(100)) < 1e-6


def test_is_better():
    assert is_better({"f1": 0.6, "auc": 0.8}, {})
    assert not is_better({"f1": 0.5, "auc": 0.5}, {"f1": 0.6, "auc": 0.8})


def test_is_better_selection_f1_micro():
    """micro-F1 ≡ accuracy for single-label tasks, so 'micro' scores
    acc + auc (torchmetrics-default rule of `Step3_ACMIL:279`)."""
    cur = {"f1": 0.5, "acc": 0.9, "auc": 0.8}
    best = {"f1": 0.8, "acc": 0.6, "auc": 0.8}
    assert not is_better(cur, best, "macro")   # 1.3 < 1.6 on macro-F1
    assert is_better(cur, best, "micro")       # 1.7 > 1.4 on acc
    with pytest.raises(ValueError):
        is_better(cur, best, "weighted")


@pytest.mark.parametrize(
    "arch",
    [pytest.param("ga", marks=pytest.mark.slow), "abmil"],  # abmil = fast smoke
)
def test_end_to_end_training(tmp_path, tiny_conf, arch):
    """The minimum end-to-end slice: bags → model → jit train → AUC."""
    slides = make_synthetic_bags(n_slides=40, d=32, seed=7)
    path = str(tmp_path / "feats.h5")
    write_feature_h5(path, slides)
    tiny_conf.split_dir = str(tmp_path / "nosplits")
    tiny_conf.arch = arch
    tiny_conf.train_epoch = 8
    tiny_conf.lr = 3e-3

    train_src, val_src, test_src = build_hdf5_feat_dataset(path, tiny_conf)
    train_loader = BagLoader(train_src, batch_size=2, shuffle=True,
                             min_bucket=64, seed=0, prefetch=0)
    test_loader = BagLoader(test_src, batch_size=2, min_bucket=64, prefetch=0)

    model, family = build_mil_model(tiny_conf)
    rng = jax.random.PRNGKey(tiny_conf.seed)
    example = next(iter(train_loader))
    state = create_train_state(model, tiny_conf, rng, example,
                               steps_per_epoch=len(train_loader))
    train_step = make_train_step(model, tiny_conf, family)
    eval_step = make_eval_step(model)

    first_loss = None
    for epoch in range(tiny_conf.train_epoch):
        state, stats = train_one_epoch(state, train_step, train_loader, rng, epoch)
        if first_loss is None:
            first_loss = stats["loss"]
    assert stats["loss"] < first_loss  # learning happened

    m = evaluate(state.params, eval_step, test_loader, tiny_conf.n_class)
    assert m["auc"] > 0.85, m
    assert set(m) >= {"acc", "auc", "f1", "loss"}


def test_classification_metrics_keys():
    probs = np.array([[0.7, 0.3], [0.2, 0.8]])
    labels = np.array([0, 1])
    m = classification_metrics(probs, labels)
    assert m["acc"] == 1.0 and m["auc"] == 1.0 and m["f1"] == 1.0


@pytest.mark.slow  # full MHIM step build; guards a constant, rarely regresses
def test_mhim_step_uses_reference_teacher_temperature():
    """The MHIM step must sharpen the teacher's soft targets with
    temp_t=0.1 (the reference CLI default,
    `Step3_WSI_classification_MHIM.py:72`) — NOT the module default 1.0.
    Guard: a step built with explicit temp_t=1.0 must produce a
    DIFFERENT cls_loss than the default-built step on identical state
    and bag (if both collapsed to the same temperature, the aux losses
    would match bit-for-bit)."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine import get_family
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model

    rs = np.random.RandomState(0)
    conf = Config(n_class=2, D_feat=24, D_inner=16, arch="mhim",
                  train_epoch=1, lr=1e-3)
    for k, v in dict(mlp_dim=32, baseline="attn", cl_alpha=0.5).items():
        setattr(conf, k, v)
    conf.extra["steps_per_epoch"] = 1
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    bag = Bag(feats=jnp.asarray(rs.randn(1, 48, 24), jnp.float32),
              mask=jnp.ones((1, 48), bool),
              coords=jnp.zeros((1, 48, 2), jnp.int32),
              label=jnp.asarray([1], jnp.int32))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, conf, rng, bag, 1, family=fam)

    _, aux_default = fam.make_step_body(model, conf)(state, bag, rng)

    import copy
    conf2 = copy.deepcopy(conf)
    conf2.temp_t = 1.0
    _, aux_t1 = fam.make_step_body(model, conf2)(state, bag, rng)

    assert float(aux_default["cls_loss"]) != float(aux_t1["cls_loss"])

    conf3 = copy.deepcopy(conf)
    conf3.temp_t = 0.1
    _, aux_01 = fam.make_step_body(model, conf3)(state, bag, rng)
    np.testing.assert_allclose(float(aux_default["cls_loss"]),
                               float(aux_01["cls_loss"]), rtol=1e-6)


def test_make_eval_step_threads_model_to_dtfd_fused_route():
    """engine.train._eval_outputs_fn passes the module to families whose
    fused route needs its hyperparameters (DTFD): with the gate pinned
    open, make_eval_step's probs match the ungated model.apply path."""
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import Config
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.train import make_eval_step
    from acmil_tpu.models import build_mil_model, fast

    rs = np.random.RandomState(5)
    conf = Config(n_class=2, D_feat=24, D_inner=16, arch="dtfd",
                  train_epoch=1, lr=1e-3)
    model, fam_name = build_mil_model(conf)
    bag = Bag(feats=jnp.asarray(rs.randn(1, 64, 24), jnp.float32),
              mask=jnp.asarray(rs.rand(1, 64) < 0.8),
              coords=jnp.zeros((1, 64, 2), jnp.int32),
              label=jnp.asarray([1], jnp.int32))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        bag.feats, bag.mask)["params"]

    plain = make_eval_step(model, family=fam_name, fused=False)(params, bag)
    min_s = fast.DTFD_FUSE_MIN_S
    fast.DTFD_FUSE_MIN_S = 0
    try:
        fused = make_eval_step(model, family=fam_name, fused=True)(params,
                                                                   bag)
    finally:
        fast.DTFD_FUSE_MIN_S = min_s
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-4, atol=2e-5)
