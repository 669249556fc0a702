"""Stitching + patch quality filters.

Reference: `wsi_core/wsi_utils.py` — `StitchCoords:247` /
`DrawMapFromCoords:188` (downsampled mosaic of extracted patches for
visual QA), `isWhitePatch:10` / `isBlackPatch:17` filters, and
`to_percentiles:29`.
"""

from __future__ import annotations

import math
from typing import Tuple

import cv2
import numpy as np


def is_white_patch(patch: np.ndarray, sat_thresh: float = 5.0) -> bool:
    """Mostly-background patch: low mean saturation (`wsi_utils.py:10`)."""
    sat = cv2.cvtColor(patch, cv2.COLOR_RGB2HSV)[:, :, 1]
    return bool(sat.mean() < sat_thresh)


def is_black_patch(patch: np.ndarray, rgb_thresh: float = 40.0) -> bool:
    return bool(patch.mean() < rgb_thresh)


def to_percentiles(scores: np.ndarray) -> np.ndarray:
    """Rank-transform scores to [0, 100] (`wsi_utils.py:29`)."""
    from scipy.stats import rankdata

    return rankdata(scores, "average") / len(scores) * 100


def stitch_coords(slide, coords: np.ndarray, patch_size_l0: int,
                  canvas_max: int = 2048,
                  draw_grid: bool = True) -> np.ndarray:
    """Downsampled mosaic of the tiled patches (`StitchCoords`,
    `wsi_utils.py:247`)."""
    w0, h0 = slide.dimensions
    scale = min(canvas_max / w0, canvas_max / h0, 1.0)
    cw, ch = max(int(w0 * scale), 1), max(int(h0 * scale), 1)
    canvas = np.full((ch, cw, 3), 240, np.uint8)
    ps = max(int(patch_size_l0 * scale), 1)
    read_level = slide.best_level_for_downsample(1.0 / scale)
    lds = slide.level_downsamples[read_level]
    for (x, y) in np.asarray(coords):
        size_l = max(int(patch_size_l0 / lds), 1)
        patch = slide.read_region((int(x), int(y)), read_level,
                                  (size_l, size_l))
        patch = cv2.resize(patch, (ps, ps), interpolation=cv2.INTER_AREA)
        cx, cy = int(x * scale), int(y * scale)
        x2, y2 = min(cx + ps, cw), min(cy + ps, ch)
        canvas[cy:y2, cx:x2] = patch[: y2 - cy, : x2 - cx]
        if draw_grid:
            cv2.rectangle(canvas, (cx, cy), (x2, y2), (0, 0, 0), 1)
    return canvas
