"""Coverage for remaining branches: BRACS/LCT splits, MHIM vote fusion,
heatmap locality, profiler hooks."""

import os

import numpy as np
import pytest


def test_bracs_split_and_remap(tmp_path, tiny_conf):
    import pandas as pd

    from acmil_tpu.data.h5io import build_hdf5_feat_dataset, write_feature_h5

    rs = np.random.RandomState(0)
    slides = {}
    rows = []
    for i in range(12):
        name = f"b{i:02d}"
        slides[name] = {"feat": rs.randn(30, 8).astype(np.float32),
                        "coords": rs.randint(0, 100, (30, 2)),
                        "label": i % 7}                 # raw 7-class labels
        rows.append({"slide_id": name,
                     "split_info": ["train", "val", "test"][i % 3]})
    p = str(tmp_path / "f.h5")
    write_feature_h5(p, slides)
    csv = str(tmp_path / "bracs.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    tiny_conf.dataset = "bracs"
    tiny_conf.n_class = 3
    tiny_conf.extra["bracs_csv"] = csv
    tr, va, te = build_hdf5_feat_dataset(p, tiny_conf)
    assert len(tr) == len(va) == len(te) == 4
    # 7 -> 3 class remap (BRACS_3CLASS)
    labels = {tr[i]["label"] for i in range(len(tr))}
    assert labels <= {0, 1, 2}


def test_lct_split_and_remap(tmp_path, tiny_conf):
    from acmil_tpu.data.h5io import build_hdf5_feat_dataset, write_feature_h5

    rs = np.random.RandomState(1)
    slides = {f"l{i}": {"feat": rs.randn(20, 8).astype(np.float32),
                        "coords": rs.randint(0, 9, (20, 2)),
                        "label": i % 6} for i in range(20)}
    p = str(tmp_path / "f.h5")
    write_feature_h5(p, slides)
    tiny_conf.dataset = "lct"
    tiny_conf.n_class = 4
    tiny_conf.extra["split_dir"] = str(tmp_path / "none")
    tr, va, te = build_hdf5_feat_dataset(p, tiny_conf)
    assert len(tr) + len(va) + len(te) == 20
    labels = {tr[i]["label"] for i in range(len(tr))}
    assert labels <= {0, 1, 2, 3}


def test_mhim_vote_fusion():
    import jax.numpy as jnp

    from acmil_tpu.models.mhim import fuse_heads_vote

    # 2 heads, 8 patches: both heads agree patch 7 is top, disagree on 2nd
    attn = jnp.asarray(np.array([
        [[0.1, 0.2, 0.3, 0.1, 0.1, 0.1, 0.6, 0.9],
         [0.1, 0.7, 0.1, 0.1, 0.1, 0.1, 0.2, 0.95]]]))
    valid = jnp.ones((1, 8), bool)
    votes = np.asarray(fuse_heads_vote(attn, valid, frac=0.25))  # top-2/head
    assert votes[0, 7] == 2                 # unanimous
    assert votes[0, 6] == 1 and votes[0, 1] == 1
    assert votes[0, 0] == 0


def test_heatmap_hotspot_locality():
    from acmil_tpu.wsi.heatmap import vis_heatmap
    from acmil_tpu.wsi.synthetic import make_synthetic_slide

    slide = make_synthetic_slide(1024, 1024, seed=2)
    # a grid of patches; one corner gets all the attention
    coords = np.stack(np.meshgrid(np.arange(0, 1024, 128),
                                  np.arange(0, 1024, 128)), -1).reshape(-1, 2)
    scores = np.zeros(len(coords))
    scores[(coords[:, 0] < 256) & (coords[:, 1] < 256)] = 1.0
    img = vis_heatmap(slide, scores, coords, patch_size=(128, 128),
                      canvas_max=512, blur=False,
                      convert_to_percentiles=False)
    base = np.asarray(slide.read_region((0, 0), slide.level_count - 1,
                                        slide.level_dimensions[-1]))
    # red channel boost concentrated in the hot corner
    h, w = img.shape[:2]
    hot = img[: h // 4, : w // 4, 0].astype(int).mean()
    cold = img[h // 2:, w // 2:, 0].astype(int).mean()
    assert hot > cold + 10, (hot, cold)


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from acmil_tpu.utils.profiling import StepTimer, profile_trace

    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert os.path.isdir(str(tmp_path / "trace"))
    with profile_trace(None):   # no-op path
        pass
    t = StepTimer()
    dt = t.tick()
    assert dt >= 0


def test_mosaic_canvas(tmp_path):
    from acmil_tpu.wsi.stitch import MosaicCanvas

    mc = MosaicCanvas(patch_size=64, n=5, downscale=2, n_per_row=3)
    rs = np.random.RandomState(0)
    for _ in range(5):
        mc.paste(rs.randint(0, 255, (64, 64, 3), np.uint8))
    assert mc.canvas.shape == (2 * 32, 3 * 32, 3)
    with pytest.raises(IndexError):
        mc.paste(rs.randint(0, 255, (32, 32, 3), np.uint8))
    out = str(tmp_path / "m.png")
    mc.save(out)
    assert os.path.exists(out)
