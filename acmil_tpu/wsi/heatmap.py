"""Attention heatmap rendering (Step4).

Reference: `wsi_core/WholeSlideImage.py:575-810` (`visHeatmap`): accumulate
per-patch scores into an overlay with an overlap counter, average,
percentile-normalise, colormap per patch and alpha-blend onto the slide,
then `block_blending:770`.

TPU redesign (SURVEY.md §7 step 7): the accumulation loop
(`WholeSlideImage.py:664-676`) — a Python for-loop over patches in the
reference — becomes one ``jnp`` scatter-add of scores and counts into the
downsampled canvas on device; colormap + blending stay host-side cv2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from acmil_tpu.wsi.stitch import to_percentiles


def accumulate_scores(scores: np.ndarray, coords: np.ndarray,
                      patch_size_l0: int, canvas_wh: Tuple[int, int],
                      scale: float) -> np.ndarray:
    """Scatter-add patch scores into a [h, w] canvas, averaging overlaps —
    on device (`WholeSlideImage.py:664-690`)."""
    import jax
    import jax.numpy as jnp

    cw, ch = canvas_wh
    ps = max(int(patch_size_l0 * scale), 1)
    xs = (np.asarray(coords[:, 0]) * scale).astype(np.int32)
    ys = (np.asarray(coords[:, 1]) * scale).astype(np.int32)

    # Each patch covers a ps x ps block: scatter its score to every cell of
    # a ps-downsampled grid, then upsample. Work on the block grid so the
    # scatter is one op per patch, not ps^2. The grid exactly tiles the
    # canvas (gw*ps >= cw), so the nearest upsample stays block-aligned.
    gw, gh = -(-cw // ps), -(-ch // ps)
    bx = np.clip(xs // ps, 0, gw - 1)
    by = np.clip(ys // ps, 0, gh - 1)
    flat = jnp.asarray(by.astype(np.int64) * gw + bx)

    @jax.jit
    def scatter(sc, idx):
        acc = jnp.zeros(gh * gw, jnp.float32).at[idx].add(sc)
        cnt = jnp.zeros(gh * gw, jnp.float32).at[idx].add(1.0)
        return acc / jnp.maximum(cnt, 1.0), cnt

    acc, cnt = scatter(jnp.asarray(scores, jnp.float32), flat)
    grid = np.asarray(acc).reshape(gh, gw)
    cnt = np.asarray(cnt).reshape(gh, gw)
    canvas = cv2.resize(grid, (gw * ps, gh * ps),
                        interpolation=cv2.INTER_NEAREST)[:ch, :cw]
    cover = cv2.resize((cnt > 0).astype(np.uint8), (gw * ps, gh * ps),
                       interpolation=cv2.INTER_NEAREST)[:ch, :cw]
    return canvas, cover


def vis_heatmap(
    slide,
    scores: np.ndarray,
    coords: np.ndarray,
    patch_size: Tuple[int, int] = (512, 512),
    vis_level: Optional[int] = None,
    alpha: float = 0.4,
    blur: bool = True,
    convert_to_percentiles: bool = True,
    cmap: str = "jet",
    canvas_max: int = 2048,
) -> np.ndarray:
    """Render the attention overlay; returns an RGB uint8 image
    (`visHeatmap`, `WholeSlideImage.py:575`)."""
    scores = np.asarray(scores, np.float64).reshape(-1)
    if convert_to_percentiles:
        scores = to_percentiles(scores) / 100.0  # rank-normalise to [0, 1]

    w0, h0 = slide.dimensions
    if vis_level is None:
        scale = min(canvas_max / w0, canvas_max / h0, 1.0)
        read_level = slide.best_level_for_downsample(1.0 / scale)
    else:
        read_level = vis_level
        scale = 1.0 / slide.level_downsamples[read_level]
    lw, lh = slide.level_dimensions[read_level]
    base = slide.read_region((0, 0), read_level, (lw, lh))

    canvas, cover = accumulate_scores(scores, coords, patch_size[0],
                                      (lw, lh), scale)
    if blur:
        k = max(int(patch_size[0] * scale) // 2 * 2 + 1, 3)
        canvas = cv2.GaussianBlur(canvas, (k, k), 0)

    cm = getattr(cv2, f"COLORMAP_{cmap.upper()}", cv2.COLORMAP_JET)
    colored = cv2.applyColorMap((np.clip(canvas, 0, 1) * 255).astype(np.uint8), cm)
    colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)

    out = base.copy()
    m = cover > 0
    out[m] = (alpha * colored[m] + (1 - alpha) * base[m]).astype(np.uint8)
    return out
