"""Cover the dlopen slide backends (VERDICT r1 item 7).

``OpenSlidePass`` and ``KfbSlideNative`` in csrc/slideio.cpp target system
libraries this machine doesn't have, so we compile tiny C stubs exporting
the same ABIs (tests/fixtures/*.c), point ``LD_LIBRARY_PATH`` at them, and
drive the real C++ tile-assembly / BGRA->RGB code through NativeSlide in a
subprocess (the loader reads LD_LIBRARY_PATH at exec time).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: deselect with -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "fixtures")


def _compile(tmp):
    cc = "gcc"
    for src, out in [("fake_openslide.c", "libopenslide.so.1"),
                     ("fake_kfbslide.c", "libkfbslide.so")]:
        subprocess.run(
            [cc, "-shared", "-fPIC", "-O1", os.path.join(FIX, src),
             "-o", os.path.join(tmp, out)],
            check=True, capture_output=True, text=True)


def _write_kfb_tiles(tile_dir):
    """Constant-color 256px tiles (ragged at edges), per fake_kfbslide.c's
    pyramid: level 0 = 600x520, level 1 = 300x260."""
    import cv2

    os.makedirs(tile_dir, exist_ok=True)
    for level, (lw, lh) in [(0, (600, 520)), (1, (300, 260))]:
        for ty in range(0, lh, 256):
            for tx in range(0, lw, 256):
                w = min(256, lw - tx)
                h = min(256, lh - ty)
                color = (10 + 37 * (tx // 256), 20 + 41 * (ty // 256),
                         60 + 90 * level)
                tile = np.full((h, w, 3), color, np.uint8)
                ok, buf = cv2.imencode(
                    ".jpg", cv2.cvtColor(tile, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
                assert ok
                with open(os.path.join(
                        tile_dir, f"tile_{level}_{tx}_{ty}.jpg"), "wb") as f:
                    f.write(buf.tobytes())


def test_dlopen_backends_tile_assembly(tmp_path):
    # ensure libslideio.so exists before the subprocess (build is make-based)
    from acmil_tpu.wsi.native import get_lib

    get_lib()
    tmp = str(tmp_path)
    _compile(tmp)
    tile_dir = os.path.join(tmp, "tiles")
    _write_kfb_tiles(tile_dir)

    env = dict(os.environ)
    env["LD_LIBRARY_PATH"] = os.pathsep.join(
        p for p in [tmp, env.get("LD_LIBRARY_PATH", "")] if p)
    env["FAKE_KFB_TILE_DIR"] = tile_dir
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests",
                                      "dlopen_backend_check.py"), tmp],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "DLOPEN BACKENDS OK" in r.stdout
