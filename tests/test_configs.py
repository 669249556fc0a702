"""Config/splits/manifest surface parity (VERDICT r1 item #3).

Every reference YAML (`/root/reference/config/*.yml`) has a ported twin in
`config/`; the frozen camelyon splits (`splits/camelyon/split_{1..5}.json`,
242/27/129 protocol in split_1) and `dataset_csv/` manifests ship verbatim.
"""

import glob
import json
import os

import numpy as np
import pytest

from acmil_tpu.config import Config
from acmil_tpu.data.h5io import build_hdf5_feat_dataset, write_feature_h5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CONFIG_NAMES = [
    "bracs_config.yml",
    "bracs_medical_ssl_config.yml",
    "bracs_natural_supervised_config.yml",
    "camelyon17_config.yml",
    "camelyon17_medical_ssl_config.yml",
    "camelyon_config.yml",
    "camelyon_medical_ssl_config.yml",
    "camelyon_natural_supervised_config.yml",
    "huaxi_medical_ssl_config.yml",
    "lct_config.yml",
    "lct_medical_ssl_config.yml",
    "lct_natural_supervised_config.yml",
    "patch_classification_bracs_config.yml",
    "patch_classification_camelyon_config.yml",
]


def test_all_reference_configs_ported():
    shipped = {os.path.basename(p) for p in glob.glob(os.path.join(REPO, "config", "*.yml"))}
    missing = set(REFERENCE_CONFIG_NAMES) - shipped
    assert not missing, f"configs missing vs reference: {sorted(missing)}"


@pytest.mark.parametrize("name", REFERENCE_CONFIG_NAMES)
def test_config_roundtrips_and_resolves(name):
    conf = Config.from_yaml(os.path.join(REPO, "config", name))
    assert conf.n_class >= 2
    assert conf.D_feat > 0 and conf.D_inner > 0
    # dims must agree with the pretrain table (Step3_ACMIL.py:69-87)
    from acmil_tpu.config import PRETRAIN_DIMS

    if conf.pretrain in PRETRAIN_DIMS:
        assert (conf.D_feat, conf.D_inner) == PRETRAIN_DIMS[conf.pretrain]
    # the arch must build (default 'ga' when the YAML leaves it to the CLI)
    from acmil_tpu.models import build_mil_model

    conf.D_feat, conf.D_inner = 16, 8  # keep init cheap
    model, family = build_mil_model(conf)
    assert model is not None and isinstance(family, str)


def test_patch_classification_extras_roundtrip():
    conf = Config.from_yaml(
        os.path.join(REPO, "config", "patch_classification_camelyon_config.yml"))
    assert conf.extra["bs"] == 128
    assert conf.extra["class_weight"] == [1.0, 100.0]
    assert conf.extra["heatmap_arguments"]["cmap"] == "jet"
    assert "colorJitter" in conf.extra["train_transforms"]


def test_frozen_camelyon_splits_shipped():
    for i in range(1, 6):
        p = os.path.join(REPO, "splits", "camelyon", f"split_{i}.json")
        assert os.path.exists(p), p
    with open(os.path.join(REPO, "splits", "camelyon", "split_1.json")) as f:
        d = json.load(f)
    assert (len(d["train_names"]), len(d["val_names"]), len(d["test_names"])) == (
        242, 27, 129)


def test_dataset_csv_manifests_shipped():
    import pandas as pd

    bracs = pd.read_csv(os.path.join(REPO, "dataset_csv", "bracs.csv"))
    assert {"slide_id", "split_info", "label"} <= set(bracs.columns)
    cam = pd.read_csv(os.path.join(REPO, "dataset_csv", "camelyon16.csv"))
    assert {"case_id", "slide_id", "label"} <= set(cam.columns)


def test_camelyon_split_loads_frozen_protocol(tmp_path):
    """With split_dir pointed at the shipped splits/, the frozen 242/27/129
    protocol is used — not the random fallback (datasets.py:16-22)."""
    with open(os.path.join(REPO, "splits", "camelyon", "split_1.json")) as f:
        d = json.load(f)
    rs = np.random.RandomState(0)
    slides = {
        n: {"feat": rs.randn(4, 8).astype(np.float32),
            "coords": np.zeros((4, 2), np.int64),
            "label": int("tumor" in n)}
        for group in d.values() for n in group
    }
    h5 = str(tmp_path / "patch_feats_pretrain_medical_ssl.h5")
    write_feature_h5(h5, slides)

    conf = Config(dataset="camelyon", seed=1, n_class=2)
    conf.extra["split_dir"] = os.path.join(REPO, "splits")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # frozen path must NOT warn
        tr, va, te = build_hdf5_feat_dataset(h5, conf)
    assert (len(tr), len(va), len(te)) == (242, 27, 129)
    assert tr.names == d["train_names"]


def test_camelyon_random_fallback_warns_loudly(tmp_path):
    rs = np.random.RandomState(0)
    slides = {
        f"{p}slide_{i}": {"feat": rs.randn(4, 8).astype(np.float32),
                          "coords": np.zeros((4, 2), np.int64), "label": i % 2}
        for p in ("", "test_") for i in range(10)
    }
    h5 = str(tmp_path / "feats.h5")
    write_feature_h5(h5, slides)
    conf = Config(dataset="camelyon", seed=1, n_class=2)
    conf.extra["split_dir"] = str(tmp_path / "nosplits")
    with pytest.warns(UserWarning, match="NOT comparable"):
        build_hdf5_feat_dataset(h5, conf)
