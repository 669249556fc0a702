"""Subprocess body for the dlopen backend tests (needs LD_LIBRARY_PATH set
at exec time, hence a fresh interpreter). Asserts OpenSlidePass and
KfbSlideNative (csrc/slideio.cpp) against the fake libraries' known
synthetic content, then exits 0."""

import os
import sys

import numpy as np


def expected_openslide_rgb(x, y, level, w, h):
    """Mirror fake_openslide.c's pixel function + slideio.cpp's
    premultiplied-BGRA -> RGB-over-white conversion."""
    ds = 1 if level == 0 else 2
    gx = x // ds + np.arange(w)[None, :]
    gy = y // ds + np.arange(h)[:, None]
    gx, gy = np.broadcast_arrays(gx, gy)
    a = np.where(gx % 3 == 0, 255, np.where(gx % 3 == 1, 128, 0))
    r = (gx + level) & 0xFF
    g = gy & 0xFF
    b = (gx ^ gy) & 0xFF
    pre = np.stack([r * a // 255, g * a // 255, b * a // 255], -1)
    out = np.empty((h, w, 3), np.uint8)
    full = a == 255
    none = a == 0
    part = ~(full | none)
    out[full] = np.stack([r, g, b], -1)[full]
    out[none] = 255
    unp = np.minimum(255, pre * 255 // np.maximum(a, 1)[..., None])
    out[part] = unp[part]
    return out


def check_openslide(tmp):
    from acmil_tpu.wsi.native import NativeSlide

    svs = os.path.join(tmp, "fake.svs")
    open(svs, "wb").close()
    s = NativeSlide(svs)
    assert s.level_count == 2
    assert s.level_dimensions == [(512, 384), (256, 192)]
    assert s.level_downsamples == [1.0, 2.0]
    for (x, y, level, w, h) in [(0, 0, 0, 64, 48), (100, 60, 0, 33, 17),
                                (64, 32, 1, 40, 20)]:
        got = s.read_region((x, y), level, (w, h))
        want = expected_openslide_rgb(x, y, level, w, h)
        np.testing.assert_array_equal(got, want)
    s.close()
    print("openslide pass OK")


def check_kfb(tmp):
    from acmil_tpu.wsi.native import NativeSlide

    kfb = os.path.join(tmp, "fake.kfb")
    open(kfb, "wb").close()
    s = NativeSlide(kfb)
    assert s.level_count == 2
    assert s.level_dimensions == [(600, 520), (300, 260)]

    def tile_color(level, tx, ty):
        return (10 + 37 * tx, 20 + 41 * ty, 60 + 90 * level)

    # a region crossing 4 tiles at level 0 and touching the ragged edge
    for level, (x0, y0, w, h) in [(0, (200, 200, 200, 120)),
                                  (0, (500, 480, 100, 40)),  # edge tiles
                                  (1, (100, 100, 250, 150))]:
        ds = 1 if level == 0 else 2
        got = s.read_region((x0 * ds, y0 * ds), level, (w, h))
        lw, lh = s.level_dimensions[level]
        exp = np.full((h, w, 3), 255, np.uint8)  # white where no tile
        gx = x0 + np.arange(w)[None, :]
        gy = y0 + np.arange(h)[:, None]
        inside = (gx < lw) & (gy < lh)
        tx, ty = gx // 256, gy // 256
        colors = np.stack(np.broadcast_arrays(
            10 + 37 * tx, 20 + 41 * ty,
            np.full_like(tx, 60 + 90 * level)), -1).astype(np.int32)
        # JPEG round-trip of constant-color tiles: small tolerance
        diff = np.abs(got.astype(np.int32) - colors)
        assert diff[np.broadcast_to(inside[..., None], diff.shape)].max() <= 4, \
            diff.max()
        outside = ~inside
        if outside.any():
            assert (got[outside] == 255).all()
    s.close()
    print("kfb pass OK")


if __name__ == "__main__":
    tmp = sys.argv[1]
    check_openslide(tmp)
    check_kfb(tmp)
    print("DLOPEN BACKENDS OK")
