"""DeepZoom generator, ROI extraction side path, MHIM schedules."""

import os
import sys

import numpy as np
import pytest


def test_deepzoom_generator():
    from acmil_tpu.wsi.deepzoom import DeepZoomGenerator
    from acmil_tpu.wsi.synthetic import make_synthetic_slide

    slide = make_synthetic_slide(2048, 1024, seed=0)
    dz = DeepZoomGenerator(slide, tile_size=254, overlap=1)
    assert dz.level_dimensions[-1] == (2048, 1024)
    assert dz.level_dimensions[0] == (1, 1)
    # top level has >1 tile
    cols, rows = dz.level_tiles[-1]
    assert cols == 9 and rows == 5  # ceil(2048/254), ceil(1024/254)
    t = dz.get_tile(dz.level_count - 1, (0, 0))
    assert t.shape == (255, 255, 3)  # 254 + 1 overlap on right/bottom
    ref = slide.read_region((0, 0), 0, (255, 255))
    np.testing.assert_allclose(t.astype(int), ref.astype(int), atol=2)
    # interior tile has overlap on all sides
    t2 = dz.get_tile(dz.level_count - 1, (1, 1))
    assert t2.shape == (256, 256, 3)
    # tiny level
    t3 = dz.get_tile(0, (0, 0))
    assert t3.shape[2] == 3


@pytest.mark.slow  # script-level Step2 drive (r5 item 8: fast-lane trim)
def test_step2_roi_mode(tmp_path, monkeypatch):
    import cv2

    import Step2_feature_extract as s2

    roi = tmp_path / "roi"
    for cls in ("normal", "tumor"):
        d = roi / cls
        d.mkdir(parents=True)
        rs = np.random.RandomState(0 if cls == "normal" else 1)
        for i in range(3):
            img = rs.randint(0, 255, (64, 64, 3), np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)

    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "Step2_feature_extract.py", "--roi_dir", str(roi),
        "--output_dir", str(out), "--backbone", "resnet18",
        "--pretrain", "natural_supervised", "--batch_size", "4"])
    s2.main()
    cents = np.load(str(out / "roi_feats.npy"))
    assert cents.shape == (1, 512)  # classes beyond class 0
    assert np.isfinite(cents).all()


@pytest.mark.slow  # full MHIM schedule sweep; the engine-level MHIM step stays fast
def test_mhim_schedules_step(tiny_conf):
    import jax
    import jax.numpy as jnp

    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.train import create_train_state, make_train_step
    from acmil_tpu.models import build_mil_model

    tiny_conf.arch = "mhim"
    tiny_conf.train_epoch = 2
    tiny_conf.extra.update(dict(
        mask_ratio=0.2, mask_ratio_h=0.1, mask_ratio_hr=0.5,
        mm_sche=True, mrh_sche=True, steps_per_epoch=5, mlp_dim=32))
    model, fam = build_mil_model(tiny_conf)
    rs = np.random.RandomState(0)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 64, 32), jnp.float32),
              mask=jnp.ones((2, 64), bool),
              coords=jnp.zeros((2, 64, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    state = create_train_state(model, tiny_conf, jax.random.PRNGKey(0), bag,
                               5, family=fam)
    step = make_train_step(model, tiny_conf, fam)
    for _ in range(3):
        state, aux = step(state, bag, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    # teacher drifted toward student (EMA applied)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state.teacher_params)))
    assert diff > 0


def test_gather_across_hosts_single_process():
    from acmil_tpu.engine.metrics import gather_across_hosts

    p = np.random.rand(5, 2)
    l = np.arange(5)
    gp, gl = gather_across_hosts(p, l)
    np.testing.assert_array_equal(gp, p)
    np.testing.assert_array_equal(gl, l)


def test_h5_patch_batches(tmp_path):
    import h5py

    from acmil_tpu.data.patch_dataset import H5PatchBatches

    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 255, (10, 64, 64, 3), np.uint8)
    coords = rs.randint(0, 1000, (10, 2))
    p = str(tmp_path / "patches.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("coords", data=coords)
    src = H5PatchBatches(p, target_size=32, batch_size=4)
    assert len(src) == 3
    total = 0
    for batch, cds, n in src:
        assert batch.shape == (4, 32, 32, 3)
        total += n
    assert total == 10
