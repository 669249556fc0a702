"""Tests for the long-tail parity components: augmentations, SAM,
annotations, smooth-top1-SVM, ROI sampling, Conv2dVDO, positional
embeddings, scale-space reads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmil_tpu.utils.augment import (data_split, five_scores, group_shuffle,
                                     k_fold_splits, patch_shuffle)


def test_group_shuffle_is_permutation():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(24.0).reshape(1, 12, 2)
    out = group_shuffle(rng, x, group=3)
    assert sorted(np.asarray(out[0, :, 0]).tolist()) == \
        sorted(np.asarray(x[0, :, 0]).tolist())
    # chunks of 4 stay contiguous
    vals = np.asarray(out[0, :, 0]).reshape(3, 4)
    diffs = np.diff(vals, axis=1)
    assert (diffs == 2).all()


def test_patch_shuffle_is_permutation():
    rng = jax.random.PRNGKey(1)
    x = jnp.arange(32.0).reshape(1, 16, 2)
    out = patch_shuffle(rng, x, group=2)
    assert sorted(np.asarray(out[0, :, 0]).tolist()) == \
        sorted(np.asarray(x[0, :, 0]).tolist())


def test_five_scores():
    labels = np.array([0, 0, 1, 1, 1, 0])
    scores = np.array([0.1, 0.2, 0.8, 0.9, 0.7, 0.3])
    acc, auc, prec, rec, f1 = five_scores(labels, scores)
    assert auc == 1.0 and acc == 1.0 and f1 == 1.0


def test_data_split_balance():
    items = list(range(100))
    labels = np.array([i % 2 for i in items])
    val, train = data_split(items, 0.2, labels=labels)
    assert len(val) == 20
    val_labels = [labels[i] for i in val]
    assert sum(val_labels) == 10  # balanced


def test_k_fold():
    folds = k_fold_splits(list(range(10)), k=5, seed=0)
    assert len(folds) == 5
    all_test = sorted(sum((t for _, t in folds), []))
    assert all_test == list(range(10))


def test_sam_step_trains(tiny_conf):
    from acmil_tpu.data.bags import Bag
    from acmil_tpu.engine.train import create_train_state, make_train_step
    from acmil_tpu.models import build_mil_model

    tiny_conf.arch = "abmil"
    tiny_conf.extra["use_sam"] = True
    model, fam = build_mil_model(tiny_conf)
    rs = np.random.RandomState(0)
    bag = Bag(feats=jnp.asarray(rs.randn(2, 64, 32), jnp.float32),
              mask=jnp.ones((2, 64), bool),
              coords=jnp.zeros((2, 64, 2), jnp.int32),
              label=jnp.asarray([0, 1], jnp.int32))
    state = create_train_state(model, tiny_conf, jax.random.PRNGKey(0), bag, 10)
    step = make_train_step(model, tiny_conf, fam)
    first = None
    for _ in range(20):
        state, aux = step(state, bag, jax.random.PRNGKey(0))
        first = first or float(aux["loss"])
    assert float(aux["loss"]) < first


def test_xml_annotations(tmp_path):
    from acmil_tpu.wsi.annotations import load_xml_annotations

    xml = """<?xml version="1.0"?>
    <ASAP_Annotations><Annotations>
      <Annotation Name="a1" Type="Polygon">
        <Coordinates>
          <Coordinate Order="0" X="100.5" Y="200.1"/>
          <Coordinate Order="1" X="300.0" Y="200.0"/>
          <Coordinate Order="2" X="300.0" Y="400.0"/>
          <Coordinate Order="3" X="100.0" Y="400.0"/>
        </Coordinates>
      </Annotation>
    </Annotations></ASAP_Annotations>"""
    p = tmp_path / "ann.xml"
    p.write_text(xml)
    conts = load_xml_annotations(str(p))
    assert len(conts) == 1
    assert conts[0].shape == (4, 1, 2)
    assert conts[0][0, 0, 0] == 100


def test_smooth_top1_svm():
    from acmil_tpu.ops.topk_svm import smooth_top1_svm_loss

    scores = jnp.array([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.array([0, 1])
    # confident & correct -> ~0 loss
    assert float(smooth_top1_svm_loss(scores, labels)) < 1e-3
    wrong = jnp.array([1, 0])
    assert float(smooth_top1_svm_loss(scores, wrong)) > 10.0
    # gradient exists
    g = jax.grad(lambda s: smooth_top1_svm_loss(s, labels))(scores)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sample_rois():
    from acmil_tpu.wsi.stitch import sample_rois

    rs = np.random.RandomState(0)
    scores = rs.rand(200)
    coords = rs.randint(0, 10000, (200, 2))
    top = sample_rois(scores, coords, k=5, mode="topk")
    assert len(top["sampled_coords"]) == 5
    assert top["sampled_scores"].min() > 0.9
    rng_s = sample_rois(scores, coords, k=5, mode="range_sample")
    assert ((rng_s["sampled_scores"] >= 0.45) &
            (rng_s["sampled_scores"] <= 0.55)).all()


def test_conv2d_vdo():
    from acmil_tpu.models.bmil import Conv2dVDO

    m = Conv2dVDO(features=4, kernel=3)
    x = jnp.ones((1, 8, 8, 2))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    det = m.apply(variables, x, deterministic=True)
    assert det.shape == (1, 8, 8, 4)
    out, muts = m.apply(variables, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["kl"])
    assert out.shape == det.shape
    assert np.isfinite(float(jax.tree_util.tree_leaves(muts["kl"])[0]))


def test_peg_sincos():
    from acmil_tpu.models.emb_position import PEG, SINCOS, sincos_2d

    x = jnp.ones((1, 16, 8))
    peg = PEG(8)
    v = peg.init(jax.random.PRNGKey(0), x, 4, 4)
    out = peg.apply(v, x, 4, 4)
    assert out.shape == x.shape
    sc = SINCOS(8)
    out2 = sc.apply({}, x, 4, 4)
    assert out2.shape == x.shape
    t = sincos_2d(8, 4, 4)
    assert t.shape == (16, 8)


def test_slide_scale_read():
    from acmil_tpu.wsi.slide import ImageSlide
    from acmil_tpu.wsi.synthetic import make_synthetic_slide_image

    img, _ = make_synthetic_slide_image(2048, 1024, seed=3)
    s = ImageSlide(img)
    r = s.read((0, 0), (512, 512), scale=0.25)
    assert r.shape == (128, 128, 3)
    wins = s.get_slide_window_info(1024, overlap_l0=0)
    assert (0, 0) in wins and len(wins) == 2


def test_mhim_pos_variants(tiny_conf):
    from acmil_tpu.models.mhim import SAttentionEncoder

    for pos in ("peg", "sincos", "none"):
        enc = SAttentionEncoder(dim=32, heads=4, pos=pos)
        x = jnp.ones((1, 64, 32))
        v = enc.init({"params": jax.random.PRNGKey(0)}, x)
        out = enc.apply(v, x)
        assert out.shape == (1, 32)


class TestSmoothTopkSVM:
    """k>1 machinery (`modules/topk/functional.py:46-72`) vs brute force."""

    @staticmethod
    def _brute_force(scores, labels, k, alpha, tau):
        """Direct subset enumeration of the Berrada et al. loss."""
        import itertools

        n, C = scores.shape
        out = []
        for i in range(n):
            y = int(labels[i])
            x = scores[i] / (k * tau)
            others = [j for j in range(C) if j != y]
            s_k = sum(np.exp(sum(x[list(A)]))
                      for A in itertools.combinations(others, k))
            s_km1 = sum(np.exp(sum(x[list(A)]))
                        for A in itertools.combinations(others, k - 1))
            pos = s_k * np.exp(alpha / tau) + s_km1 * np.exp(x[y])
            neg = s_km1 * np.exp(x[y])
            out.append(tau * (np.log(pos) - np.log(neg)))
        return float(np.mean(out))

    def test_matches_brute_force(self):
        import jax.numpy as jnp

        from acmil_tpu.ops.topk_svm import smooth_topk_svm_loss

        rs = np.random.RandomState(0)
        scores = rs.randn(5, 6).astype(np.float64) * 2
        labels = rs.randint(0, 6, 5)
        for k in (2, 3):
            for tau in (0.5, 1.0):
                got = float(smooth_topk_svm_loss(
                    jnp.asarray(scores), jnp.asarray(labels), k, 1.0, tau))
                want = self._brute_force(scores, labels, k, 1.0, tau)
                np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_k1_equals_top1_closed_form(self):
        import jax.numpy as jnp

        from acmil_tpu.ops.topk_svm import (smooth_top1_svm_loss,
                                            smooth_topk_svm_loss)

        rs = np.random.RandomState(1)
        scores = jnp.asarray(rs.randn(7, 4).astype(np.float32))
        labels = jnp.asarray(rs.randint(0, 4, 7))
        np.testing.assert_allclose(
            float(smooth_topk_svm_loss(scores, labels, 1, 1.0, 0.7)),
            float(smooth_top1_svm_loss(scores, labels, 1.0, 0.7)), rtol=1e-6)

    def test_grads_finite_and_hard_variant(self):
        import jax
        import jax.numpy as jnp

        from acmil_tpu.ops.topk_svm import (smooth_topk_svm_loss,
                                            topk_hard_svm_loss)

        rs = np.random.RandomState(2)
        scores = jnp.asarray(rs.randn(4, 8).astype(np.float32))
        labels = jnp.asarray(rs.randint(0, 8, 4))
        g = jax.grad(lambda s: smooth_topk_svm_loss(s, labels, 3))(scores)
        assert np.isfinite(np.asarray(g)).all()
        h = topk_hard_svm_loss(scores, labels, 3)
        assert np.isfinite(float(h)) and float(h) >= 0
        # smooth -> hard as tau -> 0
        sm = float(smooth_topk_svm_loss(scores, labels, 3, 1.0, 1e-3))
        np.testing.assert_allclose(sm, float(h), atol=1e-2)


def test_mlp_head_dino_parity():
    """MlpHeadDINO vs the reference torch implementation
    (`modules/mlp.py:22-52`), weights copied across."""
    import pytest
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.common import MlpHeadDINO

    in_dim, out_dim, hid, bot = 16, 10, 32, 8

    class TorchDINO(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = torch.nn.Sequential(
                torch.nn.Linear(in_dim, hid), torch.nn.GELU(),
                torch.nn.Linear(hid, bot))
            self.last = torch.nn.utils.weight_norm(
                torch.nn.Linear(bot, out_dim, bias=False))
            self.last.weight_g.data.fill_(1)

        def forward(self, x):
            x = self.mlp(x)
            x = torch.nn.functional.normalize(x, dim=-1, p=2)
            return self.last(x)

    tm = TorchDINO().eval()
    fm = MlpHeadDINO(out_dim=out_dim, nlayers=2, hidden_dim=hid,
                     bottleneck_dim=bot)
    rs = np.random.RandomState(0)
    x = rs.randn(4, in_dim).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    sd = tm.state_dict()
    params = {
        "Dense_0": {"kernel": jnp.asarray(sd["mlp.0.weight"].numpy().T),
                    "bias": jnp.asarray(sd["mlp.0.bias"].numpy())},
        "Dense_1": {"kernel": jnp.asarray(sd["mlp.2.weight"].numpy().T),
                    "bias": jnp.asarray(sd["mlp.2.bias"].numpy())},
        "last_v": jnp.asarray(sd["last.weight_v"].numpy().T),
        "last_g": jnp.asarray(sd["last.weight_g"].numpy().reshape(-1)),
    }
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # norm_last_layer freezes g
    g = jax.grad(lambda p: fm.apply({"params": p}, jnp.asarray(x)).sum())(params)
    assert float(np.abs(np.asarray(g["last_g"])).max()) == 0.0
    assert float(np.abs(np.asarray(g["last_v"])).max()) > 0.0


def test_mlp_head_shapes():
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.common import MlpHead

    m = MlpHead(hid_dim=8, out_dim=3)
    x = jnp.ones((2, 5, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 5, 3)


def test_spatial_corpus_structure(tmp_path):
    """The --task spatial head-to-head corpus (scripts/head_to_head.py)
    must keep the invariants the transmil/dsmil comparison leans on:
    raster-order coords, one label-deciding lesion blob per slide with
    its fraction inside the configured band, orthogonal class directions
    (type, not presence, decides the label), and core instances above
    the bulk."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "h2h_mod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "head_to_head.py"))
    h2h = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(h2h)

    d = 64
    slides, names = h2h.make_data_spatial(str(tmp_path), n_slides=12, d=d,
                                          frac=(0.20, 0.45), mag=(3.0, 4.0),
                                          core_k=5, core_mag=8.0)
    u = np.ones(d) / np.sqrt(d)
    v = np.tile([1.0, -1.0], d // 2) / np.sqrt(d)
    assert abs(float(u @ v)) < 1e-9
    labels = [slides[n]["label"] for n in sorted(slides)]
    assert sum(labels) == len(labels) // 2          # balanced
    for name in names:
        s = slides[name]
        feats, coords = s["feat"], s["coords"]
        n = len(feats)
        # raster order with 512px pitch
        g = int(np.ceil(np.sqrt(n)))
        assert (coords[:, 0] == (np.arange(n) % g) * 512).all()
        assert (coords[:, 1] == (np.arange(n) // g) * 512).all()
        # the lesion lives on the LABEL direction only (type, not
        # presence, decides the class). Projection noise is ~N(0, 1.22²)
        # (unit Gaussian + the low-rank background), so threshold at 2.5
        # where noise passes ~2% and the >=3-sigma blob passes wholesale.
        w = u if s["label"] else v
        proj = feats @ w
        other = feats @ (v if s["label"] else u)
        excess = (proj > 2.5).mean() - (other > 2.5).mean()
        assert 0.08 <= excess <= 0.55
        # 8-sigma cores only on the label direction
        assert proj.max() > 6.0
        assert (other > 5.0).sum() == 0
        # core instances above the bulk
        assert proj.max() > 6.0
    # H5 written in the reference schema
    assert os.path.exists(
        str(tmp_path) + "/data/patch_feats_pretrain_medical_ssl.h5")
