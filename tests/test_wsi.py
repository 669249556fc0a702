"""WSI layer tests: native SPY IO, segmentation, tiling, stitching,
heatmaps — against synthetic slides (SURVEY.md §4 test strategy)."""

import os

import numpy as np
import pytest

from acmil_tpu.wsi.slide import ImageSlide
from acmil_tpu.wsi.synthetic import make_synthetic_slide_image


@pytest.fixture(scope="module")
def synth():
    img, centers = make_synthetic_slide_image(2048, 1536, seed=1, tumor=True)
    return img, centers


@pytest.fixture(scope="module")
def image_slide(synth):
    return ImageSlide(synth[0])


def test_image_slide_pyramid(image_slide):
    s = image_slide
    assert s.level_count >= 2
    assert s.level_dimensions[0] == (2048, 1536)
    assert s.level_downsamples[0] == 1.0
    assert s.best_level_for_downsample(2.0) == 1
    r = s.read_region((100, 100), 0, (64, 64))
    assert r.shape == (64, 64, 3)
    # out-of-bounds is white
    r2 = s.read_region((2040, 1530), 0, (64, 64))
    assert (r2[20:, 20:] == 255).all()


def test_native_spy_roundtrip(tmp_path, synth, image_slide):
    from acmil_tpu.wsi.native import NativeSlide, write_spy

    img = synth[0]
    p = str(tmp_path / "s.spy")
    write_spy(p, [image_slide._levels[i]
                  for i in range(image_slide.level_count)])
    ns = NativeSlide(p)
    assert ns.level_count == image_slide.level_count
    assert ns.level_dimensions == list(image_slide.level_dimensions)
    r = ns.read_region((512, 300), 0, (256, 256))
    ref = img[300:556, 512:768]
    assert np.abs(r.astype(int) - ref.astype(int)).mean() < 4.0
    # region straddling edge: white fill
    r2 = ns.read_region((2000, 1400), 0, (256, 256))
    assert (r2[-50:, -50:] == 255).all()
    ns.close()


def test_native_raw_codec(tmp_path, image_slide):
    from acmil_tpu.wsi.native import NativeSlide, write_spy

    p = str(tmp_path / "raw.spy")
    write_spy(p, [image_slide._levels[-1]], codec="raw")
    ns = NativeSlide(p)
    lvl = image_slide._levels[-1]
    r = ns.read_region((0, 0), 0, (lvl.shape[1], lvl.shape[0]))
    np.testing.assert_array_equal(r, lvl)  # raw = lossless


def test_open_slide_factory_and_cache(tmp_path, image_slide):
    from acmil_tpu.wsi import clear_slide_cache, open_slide
    from acmil_tpu.wsi.native import write_spy

    p = str(tmp_path / "f.spy")
    write_spy(p, [image_slide._levels[i]
                  for i in range(image_slide.level_count)])
    s1 = open_slide(p)
    s2 = open_slide(p)
    assert s1 is s2  # LRU handle cache
    clear_slide_cache()


def test_segmentation_finds_tissue(image_slide):
    from acmil_tpu.wsi.segment import segment_tissue

    seg = segment_tissue(image_slide, a_t=1, a_h=1)
    assert len(seg.contours) >= 1
    total_area = sum(float(__import__("cv2").contourArea(c))
                     for c in seg.contours)
    w, h = image_slide.level_dimensions[seg.seg_level]
    assert 0.02 < total_area / (w * h) < 0.95


def test_tiling_inside_tissue(image_slide, synth):
    import cv2

    from acmil_tpu.wsi.segment import segment_tissue
    from acmil_tpu.wsi.tiling import tile_contours

    seg = segment_tissue(image_slide, a_t=1, a_h=1)
    res = tile_contours(image_slide, seg, patch_size=128, step_size=128)
    assert len(res.coords) > 5

    def tissue_frac(coords):
        img = synth[0]
        centers = coords + 64
        vals = img[np.clip(centers[:, 1], 0, img.shape[0] - 1),
                   np.clip(centers[:, 0], 0, img.shape[1] - 1)]
        return (vals.mean(axis=1) < 240).mean()

    # four_pt (easy) keeps bbox-edge patches whose center is off-tissue
    # but a shifted corner touches it (`use_padding=True` + any-corner,
    # WholeSlideImage.py:471-473 + util_classes.py:69) — so the
    # center-on-tissue fraction is only a majority, not ~1
    assert tissue_frac(res.coords) > 0.6, tissue_frac(res.coords)

    # the strict center predicate stays high
    res_c = tile_contours(image_slide, seg, patch_size=128, step_size=128,
                          contour_fn="center")
    assert len(res_c.coords) > 5
    assert tissue_frac(res_c.coords) > 0.85, tissue_frac(res_c.coords)
    # and the easy mode covers at least as much as the strict one
    assert len(res.coords) >= len(res_c.coords)


def test_coords_h5_roundtrip(tmp_path, image_slide):
    from acmil_tpu.wsi.segment import segment_tissue
    from acmil_tpu.wsi.tiling import load_coords_h5, save_coords_h5, tile_contours

    seg = segment_tissue(image_slide, a_t=1, a_h=1)
    res = tile_contours(image_slide, seg, patch_size=128, step_size=128)
    p = str(tmp_path / "c.h5")
    save_coords_h5(p, res, name="slideX")
    coords, labels, attrs = load_coords_h5(p)
    np.testing.assert_array_equal(coords, res.coords)
    assert attrs["patch_size"] == 128
    assert attrs["name"] == "slideX"


def test_tumor_labels(image_slide, synth):
    import cv2

    from acmil_tpu.wsi.segment import segment_tissue
    from acmil_tpu.wsi.tiling import tile_contours

    seg = segment_tissue(image_slide, a_t=1, a_h=1)
    plain = tile_contours(image_slide, seg, patch_size=128, step_size=128)
    # anchor the annotation on a patch we know was tiled
    cx, cy = plain.coords[len(plain.coords) // 2] + 64
    ann = np.array([[[cx - 200, cy - 200]], [[cx + 200, cy - 200]],
                    [[cx + 200, cy + 200]], [[cx - 200, cy + 200]]])
    res = tile_contours(image_slide, seg, patch_size=128, step_size=128,
                        annotations=[ann.astype(np.float64)])
    assert res.labels.sum() > 0
    pos = res.coords[res.labels == 1] + 64
    assert (np.abs(pos[:, 0] - cx) <= 300).all()
    assert (np.abs(pos[:, 1] - cy) <= 300).all()


def test_stitch_and_heatmap(image_slide):
    from acmil_tpu.wsi.heatmap import vis_heatmap
    from acmil_tpu.wsi.segment import segment_tissue
    from acmil_tpu.wsi.stitch import is_black_patch, is_white_patch, stitch_coords
    from acmil_tpu.wsi.tiling import tile_contours

    seg = segment_tissue(image_slide, a_t=1, a_h=1)
    res = tile_contours(image_slide, seg, patch_size=256, step_size=256)
    canvas = stitch_coords(image_slide, res.coords[:10], 256, canvas_max=512)
    assert canvas.shape[2] == 3

    scores = np.random.RandomState(0).rand(len(res.coords))
    hm = vis_heatmap(image_slide, scores, res.coords, patch_size=(256, 256),
                     canvas_max=512)
    assert hm.dtype == np.uint8 and hm.shape[2] == 3

    white = np.full((64, 64, 3), 255, np.uint8)
    assert is_white_patch(white) and not is_black_patch(white)
    assert is_black_patch(np.zeros((64, 64, 3), np.uint8))


def test_block_blend_matches_whole_image(image_slide):
    """Tiled live-read blending (`WholeSlideImage.py:770-810`) must equal
    the single-pass whole-image blend, for any block size."""
    from acmil_tpu.wsi.heatmap import block_blend

    lw, lh = image_slide.level_dimensions[0]
    rs = np.random.RandomState(0)
    colored = rs.randint(0, 255, (lh, lw, 3), np.uint8)
    cover = (rs.rand(lh, lw) < 0.5).astype(np.uint8)
    alpha = 0.4

    base = np.asarray(image_slide.read_region((0, 0), 0, (lw, lh)))[..., :3]
    import cv2

    expected = np.where(cover[..., None] > 0,
                        cv2.addWeighted(colored, alpha, base, 1 - alpha, 0),
                        base)
    for block in (96, 1024):
        out = block_blend(image_slide, colored, cover, 0, alpha,
                          block_size=block)
        np.testing.assert_array_equal(out, expected)


def test_vis_heatmap_full_resolution(image_slide):
    """Explicit vis_level renders at that level's full dimensions (no
    2048-px cap), block-blended; blank_canvas skips slide reads."""
    from acmil_tpu.wsi.heatmap import vis_heatmap
    from acmil_tpu.wsi.segment import segment_tissue
    from acmil_tpu.wsi.tiling import tile_contours

    seg = segment_tissue(image_slide, a_t=1, a_h=1)
    res = tile_contours(image_slide, seg, patch_size=256, step_size=256)
    scores = np.random.RandomState(0).rand(len(res.coords))

    lw, lh = image_slide.level_dimensions[0]
    hm = vis_heatmap(image_slide, scores, res.coords, patch_size=(256, 256),
                     vis_level=0, block_size=500)
    assert hm.shape == (lh, lw, 3)

    blank = vis_heatmap(image_slide, scores, res.coords,
                        patch_size=(256, 256), vis_level=0,
                        blank_canvas=True)
    assert blank.shape == (lh, lw, 3)
    # uncovered pixels on a blank canvas are pure white
    assert (blank[0, 0] == 255).all() or (hm[0, 0] == blank[0, 0]).all()


def test_tiling_small_contour_and_holes():
    """Regression: (a) a contour smaller than the patch footprint still
    yields candidates (reference use_padding=True, WholeSlideImage.py:471);
    (b) patches whose CENTER lies in a hole are excluded regardless of the
    4-point corner test (isInContours, WholeSlideImage.py:406-412)."""
    import numpy as np

    from acmil_tpu.wsi.segment import SegmentationResult
    from acmil_tpu.wsi.slide import ImageSlide
    from acmil_tpu.wsi.tiling import tile_contours

    img = np.full((800, 800, 3), 120, np.uint8)
    slide = ImageSlide(img)

    # (a) 100x100 tissue square, patch 128 > contour: previously zero
    small = np.array([[50, 50], [150, 50], [150, 150], [50, 150]],
                     np.float64).reshape(-1, 1, 2)
    seg = SegmentationResult(contours=[small], holes=[[]], seg_level=0,
                             downsample=1.0)
    res = tile_contours(slide, seg, patch_size=128, step_size=128,
                        mask_scale=1.0)
    assert len(res.coords) >= 1

    # (b) big square with a central hole: center-in-hole patches dropped
    big = np.array([[0, 0], [768, 0], [768, 768], [0, 768]],
                   np.float64).reshape(-1, 1, 2)
    hole = np.array([[256, 256], [512, 256], [512, 512], [256, 512]],
                    np.float64).reshape(-1, 1, 2)
    seg2 = SegmentationResult(contours=[big], holes=[[hole]], seg_level=0,
                              downsample=1.0)
    res2 = tile_contours(slide, seg2, patch_size=128, step_size=128,
                         mask_scale=1.0)
    centers = res2.coords + 64
    strictly_in_hole = ((centers[:, 0] > 256 + 8) & (centers[:, 0] < 512 - 8)
                        & (centers[:, 1] > 256 + 8) & (centers[:, 1] < 512 - 8))
    assert len(res2.coords) > 10
    assert not strictly_in_hole.any()


def test_load_coords_h5_normalizes_tuple_downsample(tmp_path):
    """Reference Step1 dumps store 'downsample' as (dx, dy)
    (WholeSlideImage.py:390); loading must scalarise it."""
    import h5py

    from acmil_tpu.wsi.tiling import load_coords_h5

    p = str(tmp_path / "ref.h5")
    with h5py.File(p, "w") as f:
        d = f.create_dataset("coords", data=np.zeros((3, 2), np.int64))
        d.attrs["downsample"] = np.array([2.0, 2.0])
        d.attrs["patch_size"] = 256
    _, _, attrs = load_coords_h5(p)
    assert attrs["downsample"] == 2.0
    assert int(attrs["patch_size"] * attrs["downsample"]) == 512


def test_truncated_spy_raises(tmp_path, image_slide):
    """A truncated .spy must raise OSError ('truncated or corrupt'), not
    feed garbage dims into the C++ allocator."""
    from acmil_tpu.wsi.native import NativeSlide, write_spy

    p = str(tmp_path / "t.spy")
    write_spy(p, [image_slide._levels[-1]])
    data = open(p, "rb").read()
    for cut in (6, 14, 30):
        open(p, "wb").write(data[:cut])
        with pytest.raises(OSError):
            NativeSlide(p)


def test_heatmap_overlay_matches_reference_vis_heatmap(tmp_path):
    """Numerical parity vs the REFERENCE `visHeatmap`
    (`wsi_core/WholeSlideImage.py:575-741`): accumulate + overlap-average +
    percentile normalisation + per-patch matplotlib colormap, compared
    pixel-wise on a blank canvas (alpha=1.0 isolates the pre-blend
    overlay; block blending itself is covered by the Step4 regression
    test). The reference module loads standalone with its native-reader
    imports stubbed (VERDICT r3 item 3)."""
    import importlib.util
    import sys
    import types

    import numpy as np

    REF = "/root/reference"

    # --- stub the reference's import graph (no native readers, no package
    # __init__ — it dlopens libkfbslide/openslide) ------------------------
    def _file_mod(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    created = []

    def _stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        created.append(name)
        return mod

    _stub("openslide", OpenSlide=object, open_slide=lambda p: None)
    _stub("skimage", color=None)
    _stub("skimage.color", rgb2hed=lambda x: x, hed2rgb=lambda x: x)
    _stub("utils")
    _stub("utils.file_utils", load_pkl=lambda p: None,
          save_pkl=lambda p, o: None)
    sys.modules["utils"].file_utils = sys.modules["utils.file_utils"]
    pkg = _stub("wsi_core")
    pkg.__path__ = [f"{REF}/wsi_core"]
    _stub("wsi_core.KfbSlide", kfbslide=types.ModuleType("kfbslide"))
    try:
        _file_mod("wsi_core.util_classes", f"{REF}/wsi_core/util_classes.py")
        _file_mod("wsi_core.wsi_utils", f"{REF}/wsi_core/wsi_utils.py")
        wsi_mod = _file_mod("wsi_core.WholeSlideImage",
                            f"{REF}/wsi_core/WholeSlideImage.py")

        # --- shared synthetic geometry: level-0 1024x768, render level 4x;
        # 32px level-0 patches on the aligned grid, one duplicated coord to
        # exercise the overlap-average path -------------------------------
        rs = np.random.RandomState(0)
        w0, h0, ps0, ds = 1024, 768, 32, 4.0
        gx, gy = np.meshgrid(np.arange(0, w0, ps0), np.arange(0, h0, ps0))
        coords = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.int64)
        keep = rs.rand(len(coords)) < 0.4
        coords = coords[keep]
        coords = np.concatenate([coords, coords[:5]])       # overlaps
        scores = rs.rand(len(coords)).astype(np.float64)

        ref_obj = wsi_mod.WholeSlideImage.__new__(wsi_mod.WholeSlideImage)
        ref_obj.level_downsamples = [(1.0, 1.0), (ds, ds)]
        ref_obj.level_dim = [(w0, h0), (int(w0 / ds), int(h0 / ds))]
        ref_obj.contours_tumor = None
        ref_img = ref_obj.visHeatmap(
            scores.copy(), coords.copy(), vis_level=1,
            patch_size=(ps0, ps0), blank_canvas=True, alpha=1.0,
            blur=False, segment=False, convert_to_percentiles=True,
            cmap="jet")
        ref_arr = np.asarray(ref_img)
    finally:
        for name in created:
            sys.modules.pop(name, None)
        for name in ("wsi_core.util_classes", "wsi_core.wsi_utils",
                     "wsi_core.WholeSlideImage"):
            sys.modules.pop(name, None)

    # --- ours ------------------------------------------------------------
    from acmil_tpu.wsi.heatmap import vis_heatmap

    class SlideStub:
        dimensions = (w0, h0)
        level_downsamples = [1.0, ds]
        level_dimensions = [(w0, h0), (int(w0 / ds), int(h0 / ds))]

        def best_level_for_downsample(self, t):
            return 1

        def read_region(self, loc, level, size):
            raise AssertionError("blank_canvas must not read the slide")

    our_arr = vis_heatmap(
        SlideStub(), scores.copy(), coords.copy(), patch_size=(ps0, ps0),
        vis_level=1, alpha=1.0, blur=False, convert_to_percentiles=True,
        cmap="jet", blank_canvas=True)

    assert our_arr.shape == ref_arr.shape
    diff = np.abs(our_arr.astype(int) - ref_arr.astype(int))
    # identical up to uint8 rounding at colormap quantisation boundaries
    # (our accumulator averages in f32, the reference in f64)
    assert (diff > 1).mean() == 0.0, (
        f"max diff {diff.max()}, >1 at {(diff > 1).mean():.4%} of pixels")
    assert (diff != 0).mean() < 0.01
