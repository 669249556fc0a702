"""Step1→Step2 pipeline integration on synthetic SPY slides (the full
preprocessing path through the native C++ reader + encoder engine)."""

import os
import sys

import h5py
import numpy as np
import pytest


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
