"""ctypes bindings to the C++ slide-IO runtime (csrc/slideio.cpp).

The Python-visible replacement for the reference's two ctypes layers
(`wsi_core/KfbSlide/kfb_lowlevel.py`, `wsi_core/OtherSlide/openslide/
lowlevel.py`) — one wrapper over one native library handling SPY
containers, system OpenSlide formats and KFB.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import weakref
from typing import Optional, Sequence

import numpy as np

from acmil_tpu.wsi.slide import Slide

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_LIB_PATH = os.path.join(_CSRC, "libslideio.so")
_lib: Optional[C.CDLL] = None


def _build_lib() -> None:
    subprocess.run(["make", "-C", _CSRC], check=True,
                   capture_output=True, text=True)


def get_lib() -> C.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "slideio.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        _build_lib()
    lib = C.CDLL(_LIB_PATH)
    lib.sio_open.restype = C.c_void_p
    lib.sio_open.argtypes = [C.c_char_p]
    lib.sio_close.argtypes = [C.c_void_p]
    lib.sio_level_count.restype = C.c_int32
    lib.sio_level_count.argtypes = [C.c_void_p]
    lib.sio_level_dimensions.argtypes = [
        C.c_void_p, C.c_int32, C.POINTER(C.c_int64), C.POINTER(C.c_int64)]
    lib.sio_level_downsample.restype = C.c_double
    lib.sio_level_downsample.argtypes = [C.c_void_p, C.c_int32]
    lib.sio_best_level_for_downsample.restype = C.c_int32
    lib.sio_best_level_for_downsample.argtypes = [C.c_void_p, C.c_double]
    lib.sio_read_region.restype = C.c_int32
    lib.sio_read_region.argtypes = [
        C.c_void_p, C.POINTER(C.c_uint8), C.c_int64, C.c_int64, C.c_int32,
        C.c_int64, C.c_int64]
    lib.sio_get_error.restype = C.c_char_p
    lib.sio_create.restype = C.c_void_p
    lib.sio_create.argtypes = [C.c_char_p, C.c_int32, C.POINTER(C.c_uint32),
                               C.POINTER(C.c_uint32), C.c_uint32, C.c_uint32]
    lib.sio_write_tile.restype = C.c_int32
    lib.sio_write_tile.argtypes = [C.c_void_p, C.c_int32, C.c_uint32,
                                   C.c_uint32, C.POINTER(C.c_uint8)]
    lib.sio_finish.restype = C.c_int32
    lib.sio_finish.argtypes = [C.c_void_p]
    _lib = lib
    return lib


def _close_native(lib, handle):
    lib.sio_close(handle)


class NativeSlide(Slide):
    def __init__(self, path: str):
        lib = get_lib()
        self._lib = lib
        self._h = lib.sio_open(path.encode())
        if not self._h:
            raise OSError(
                f"slideio failed to open {path}: "
                f"{lib.sio_get_error().decode()}")
        # register IMMEDIATELY after the open succeeds: if any of the
        # metadata calls below raises (corrupt pyramid), the C handle
        # must still be closed — a finalizer registered at the end of
        # __init__ would leak it (code-review r3)
        self._fin = weakref.finalize(self, _close_native, lib, self._h)
        n = lib.sio_level_count(self._h)
        dims = []
        for i in range(n):
            w, h = C.c_int64(), C.c_int64()
            lib.sio_level_dimensions(self._h, i, C.byref(w), C.byref(h))
            dims.append((w.value, h.value))
        self.level_count = n
        self.level_dimensions = dims
        self.level_downsamples = [
            float(lib.sio_level_downsample(self._h, i)) for i in range(n)]
        self.properties = {}
        self.path = path
        # (finalizer instead of __del__: survives reference cycles and
        # exception tracebacks holding the slide, and never resurrects
        # self — it closes over only (lib, handle). ADVICE r2)

    def _handle(self):
        # guard: a NULL handle into the C ABI is a segfault, not an error
        if not self._h:
            raise RuntimeError(f"slide {self.path!r} is closed")
        return self._h

    def best_level_for_downsample(self, downsample: float) -> int:
        return int(self._lib.sio_best_level_for_downsample(
            self._handle(), float(downsample)))

    def read_region(self, location, level, size) -> np.ndarray:
        w, h = int(size[0]), int(size[1])
        out = np.empty((h, w, 3), np.uint8)
        ok = self._lib.sio_read_region(
            self._handle(), out.ctypes.data_as(C.POINTER(C.c_uint8)),
            int(location[0]), int(location[1]), int(level), w, h)
        if not ok:
            raise OSError(f"read_region failed: "
                          f"{self._lib.sio_get_error().decode()}")
        return out

    def close(self) -> None:
        fin = getattr(self, "_fin", None)
        if fin is not None and fin.alive:
            fin()            # runs _close_native exactly once
        self._h = None


def write_spy(path: str, levels: Sequence[np.ndarray], tile_size: int = 256,
              codec: str = "jpeg") -> None:
    """Write an image pyramid (list of RGB uint8 arrays, level 0 first) as
    a SPY container via the native writer."""
    lib = get_lib()
    n = len(levels)
    ws = (C.c_uint32 * n)(*[l.shape[1] for l in levels])
    hs = (C.c_uint32 * n)(*[l.shape[0] for l in levels])
    wtr = lib.sio_create(path.encode(), n, ws, hs, tile_size,
                         1 if codec == "jpeg" else 0)
    if not wtr:
        raise OSError(f"sio_create failed: {lib.sio_get_error().decode()}")
    for lvl, img in enumerate(levels):
        img = np.ascontiguousarray(img[..., :3], np.uint8)
        h, w = img.shape[:2]
        for ty in range((h + tile_size - 1) // tile_size):
            for tx in range((w + tile_size - 1) // tile_size):
                tile = np.ascontiguousarray(
                    img[ty * tile_size:(ty + 1) * tile_size,
                        tx * tile_size:(tx + 1) * tile_size])
                if not lib.sio_write_tile(
                        wtr, lvl, tx, ty,
                        tile.ctypes.data_as(C.POINTER(C.c_uint8))):
                    raise OSError("sio_write_tile failed")
    if not lib.sio_finish(wtr):
        raise OSError("sio_finish failed")
