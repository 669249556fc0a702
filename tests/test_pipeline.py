"""Step1→Step2 pipeline integration on synthetic SPY slides (the full
preprocessing path through the native C++ reader + encoder engine)."""

import os
import sys

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: deselect with -m "not slow"


@pytest.fixture(scope="module")
def slide_dir(tmp_path_factory):
    from acmil_tpu.wsi.synthetic import write_synthetic_spy

    d = tmp_path_factory.mktemp("slides")
    for i, name in enumerate(["slide_a", "test_slide_b"]):
        write_synthetic_spy(str(d / f"{name}.spy"), width=1024, height=768,
                            seed=i, tumor=(i == 0))
    return str(d)


def test_step1_step2_pipeline(tmp_path, slide_dir, monkeypatch):
    import Step1_create_patches_fp as s1
    import Step2_feature_extract as s2

    save_dir = str(tmp_path / "step1")
    monkeypatch.setattr(sys, "argv", [
        "Step1_create_patches_fp.py", "--source", slide_dir,
        "--save_dir", save_dir, "--patch_size", "224", "--step_size", "224",
        "--a_t", "1", "--a_h", "1"])
    s1.main()

    patches = os.listdir(os.path.join(save_dir, "patches"))
    assert len(patches) == 2
    assert os.path.exists(os.path.join(save_dir, "process_list_autogen.csv"))
    assert len(os.listdir(os.path.join(save_dir, "masks"))) == 2
    with h5py.File(os.path.join(save_dir, "patches", patches[0])) as f:
        n_coords = len(f["coords"])
        assert n_coords > 0

    # label manifest
    csv = str(tmp_path / "labels.csv")
    with open(csv, "w") as f:
        f.write("slide_id,label\nslide_a,1\ntest_slide_b,0\n")

    out_dir = str(tmp_path / "feats")
    monkeypatch.setattr(sys, "argv", [
        "Step2_feature_extract.py", "--slide_dir", slide_dir,
        "--coords_dir", os.path.join(save_dir, "patches"),
        "--output_dir", out_dir, "--backbone", "resnet18",
        "--pretrain", "natural_supervised", "--batch_size", "16",
        "--label_csv", csv])
    s2.main()

    h5_path = os.path.join(out_dir,
                           "patch_feats_pretrain_natural_supervised.h5")
    with h5py.File(h5_path) as f:
        assert set(f.keys()) == {"slide_a", "test_slide_b"}
        g = f["slide_a"]
        assert g["feat"].dtype == np.float16
        assert g["feat"].shape[1] == 512       # resnet18 embed dim
        assert g["feat"].shape[0] == len(g["coords"])
        assert g.attrs["label"] == 1
        assert f["test_slide_b"].attrs["label"] == 0

    # the produced file is consumable by the Step3 data layer
    from acmil_tpu.config import Config
    from acmil_tpu.data import build_hdf5_feat_dataset

    conf = Config(dataset="camelyon", n_class=2, seed=0)
    conf.extra["split_dir"] = str(tmp_path / "none")
    tr, va, te = build_hdf5_feat_dataset(h5_path, conf)
    assert te.names == ["test_slide_b"]
    assert len(tr) + len(va) == 1


def test_step4_heatmap_script(tmp_path):
    """Step4 end-to-end at script level: train a tiny ACMIL checkpoint,
    write a matching synthetic slide, render heatmap overlays."""
    import subprocess
    import sys

    import h5py
    import yaml

    from acmil_tpu.cli.train import run_training
    from acmil_tpu.config import Config
    from acmil_tpu.data.h5io import write_feature_h5
    from acmil_tpu.wsi.native import write_spy
    from acmil_tpu.wsi.slide import ImageSlide
    from acmil_tpu.wsi.synthetic import make_synthetic_slide_image
    from tests.conftest import make_synthetic_bags

    slides = make_synthetic_bags(n_slides=12, d=32, seed=3)
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    write_feature_h5(
        os.path.join(data_dir, "patch_feats_pretrain_medical_ssl.h5"), slides)

    conf = Config(n_class=2, D_feat=32, D_inner=16, arch="ga", n_token=2,
                  n_masked_patch=0, mask_drop=0.0, lr=2e-3, train_epoch=1,
                  min_bucket=64, B=1, seed=0, data_dir=data_dir,
                  ckpt_dir=str(tmp_path / "ckpt"),
                  log_dir=str(tmp_path / "logs"), pretrain="medical_ssl")
    conf.extra["split_dir"] = str(tmp_path / "nosplits")
    run_training(conf)

    # one synthetic slide named after a test-split slide; coords in the
    # fixture are random within [0, 50000) — use a big-enough image scale
    test_name = next(n for n in slides if n.startswith("test_"))
    img, _ = make_synthetic_slide_image(1024, 768, seed=0, tumor=True)
    slide_dir = str(tmp_path / "slides")
    os.makedirs(slide_dir)
    s = ImageSlide(img)
    write_spy(os.path.join(slide_dir, test_name + ".spy"),
              [s._levels[i] for i in range(s.level_count)])

    yml = str(tmp_path / "c.yml")
    with open(yml, "w") as f:
        yaml.safe_dump({"n_class": 2, "D_feat": 32, "D_inner": 16,
                        "dataset": "camelyon", "pretrain": "medical_ssl",
                        "data_dir": data_dir, "min_bucket": 64,
                        "split_dir": str(tmp_path / "nosplits"),
                        "train_epoch": 1, "B": 1, "seed": 0}, f)

    out_dir = str(tmp_path / "heatmaps")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        ["/root/repo"] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    r = subprocess.run(
        [sys.executable, "/root/repo/Step4_visualize_heatmap_camelyon.py",
         "--config", yml, "--ckpt_dir", str(tmp_path / "ckpt"),
         "--slide_dir", slide_dir, "--output_dir", out_dir,
         "--patch_size", "128"],
        env=env, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    pngs = [f for f in os.listdir(out_dir)] if os.path.isdir(out_dir) else []
    assert any(f.startswith(test_name) for f in pngs), (pngs, r.stdout[-500:])


def test_step2_tensor_parallel_cli(tmp_path, slide_dir, monkeypatch):
    """Step2 with --mesh_model: the tensor-parallel trunk path, driven at
    CLI level on the virtual (data=2, model=4) mesh with an injected
    tiny-ViT encoder spec; features must match the single-device run."""
    import Step1_create_patches_fp as s1
    import Step2_feature_extract as s2
    from acmil_tpu.models.encoders import build as B
    from acmil_tpu.models.encoders.vit import ViT

    save_dir = str(tmp_path / "step1")
    monkeypatch.setattr(sys, "argv", [
        "Step1_create_patches_fp.py", "--source", slide_dir,
        "--save_dir", save_dir, "--patch_size", "224", "--step_size", "224",
        "--a_t", "1", "--a_h", "1"])
    s1.main()

    tiny = B.EncoderSpec(
        lambda dt: ViT(32, 32, 2, 8, img_size=224, dtype=jnp_f32(dt)),
        32, 224, B.HALF_MEAN, B.HALF_STD, "vit", depth=2)
    monkeypatch.setitem(B.ENCODER_SPECS, ("medical_ssl", "tiny-vit"), tiny)

    outs = {}
    for tag, extra in [("single", []),
                       ("tp", ["--mesh_model", "4", "--mesh_data", "2"])]:
        out_dir = str(tmp_path / f"feats_{tag}")
        monkeypatch.setattr(sys, "argv", [
            "Step2_feature_extract.py", "--slide_dir", slide_dir,
            "--coords_dir", os.path.join(save_dir, "patches"),
            "--output_dir", out_dir, "--backbone", "tiny-vit",
            "--pretrain", "medical_ssl", "--batch_size", "8"] + extra)
        s2.main()
        with h5py.File(os.path.join(
                out_dir, "patch_feats_pretrain_medical_ssl.h5")) as f:
            outs[tag] = {k: np.asarray(f[k]["feat"]) for k in f.keys()}

    assert set(outs["tp"]) == set(outs["single"]) and outs["tp"]
    for k in outs["tp"]:
        assert outs["tp"][k].shape[1] == 32
        np.testing.assert_allclose(
            outs["tp"][k].astype(np.float32),
            outs["single"][k].astype(np.float32), rtol=2e-2, atol=2e-3)


def jnp_f32(dt):
    """Step2 builds encoders in bf16; the tiny test trunk stays f32 so the
    single-device and TP runs compare at full precision on CPU."""
    import jax.numpy as jnp

    return jnp.float32
