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
    # ceil-scaling matches the reference exactly (`WholeSlideImage.py:643-644`:
    # np.ceil on both the patch size and the coords)
    ps = max(int(np.ceil(patch_size_l0 * scale)), 1)
    xs = np.ceil(np.asarray(coords[:, 0]) * scale).astype(np.int32)
    ys = np.ceil(np.asarray(coords[:, 1]) * scale).astype(np.int32)

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


def apply_colormap(canvas: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """Map [h, w] scores in [0, 1] to RGB uint8 the reference's way:
    matplotlib ``cmap(x) * 255 → uint8`` (`WholeSlideImage.py:728`).
    Falls back to the cv2 LUT when matplotlib is unavailable (visually
    identical for jet; the matplotlib path is bit-exact vs the
    reference)."""
    x = np.clip(canvas, 0.0, 1.0)
    try:
        from matplotlib import colormaps

        return (colormaps[cmap](x) * 255)[:, :, :3].astype(np.uint8)
    except Exception:
        cm = getattr(cv2, f"COLORMAP_{cmap.upper()}", cv2.COLORMAP_JET)
        colored = cv2.applyColorMap((x * 255).astype(np.uint8), cm)
        return cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)


def block_blend(slide, colored: np.ndarray, cover: np.ndarray,
                read_level: int, alpha: float, block_size: int = 1024,
                blank_canvas: bool = False,
                canvas_color: Tuple[int, int, int] = (255, 255, 255)
                ) -> np.ndarray:
    """Blend the colored overlay against the slide in live-read blocks
    (`WholeSlideImage.py:770-810`): covered pixels get
    ``alpha*overlay + (1-alpha)*slide``, everything else the raw slide —
    without ever holding a second full-level copy of the slide in RAM."""
    h, w = colored.shape[:2]
    ds = slide.level_downsamples[read_level]
    out = np.empty_like(colored)
    for ys in range(0, h, block_size):
        ye = min(h, ys + block_size)
        for xs in range(0, w, block_size):
            xe = min(w, xs + block_size)
            if blank_canvas:
                canvas = np.full((ye - ys, xe - xs, 3), canvas_color,
                                 np.uint8)
            else:
                canvas = slide.read_region(
                    (int(xs * ds), int(ys * ds)), read_level,
                    (xe - xs, ye - ys))
                canvas = np.asarray(canvas)[..., :3]
            blk = colored[ys:ye, xs:xe]
            cov = cover[ys:ye, xs:xe] > 0
            blended = cv2.addWeighted(blk, alpha, canvas, 1 - alpha, 0)
            out[ys:ye, xs:xe] = np.where(cov[..., None], blended, canvas)
    return out


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
    canvas_max: Optional[int] = 2048,
    blank_canvas: bool = False,
    block_size: int = 1024,
) -> np.ndarray:
    """Render the attention overlay; returns an RGB uint8 image
    (`visHeatmap`, `WholeSlideImage.py:575`).

    ``vis_level`` picks the render resolution (default: the level closest
    to 32x downsample, like the reference's ``vis_level=-1``); blending
    against the slide happens block-by-block with live ``read_region``
    (`block_blending:770`), so large levels never need a full second
    copy in RAM. ``canvas_max`` only bounds the *default* level choice —
    pass an explicit ``vis_level`` for full-resolution output.
    """
    scores = np.asarray(scores, np.float64).reshape(-1)
    if convert_to_percentiles:
        scores = to_percentiles(scores) / 100.0  # rank-normalise to [0, 1]

    w0, h0 = slide.dimensions
    if vis_level is None:
        # reference default: level closest to 32x downsample
        # (`WholeSlideImage.py:611-612`), additionally bounded by
        # canvas_max when set (round-1 behaviour, kept for small fixtures)
        target = 32.0
        if canvas_max:
            target = max(target, w0 / canvas_max, h0 / canvas_max)
        read_level = slide.best_level_for_downsample(target)
    else:
        read_level = vis_level
    scale = 1.0 / slide.level_downsamples[read_level]
    lw, lh = slide.level_dimensions[read_level]

    canvas, cover = accumulate_scores(scores, coords, patch_size[0],
                                      (lw, lh), scale)
    if blur:
        k = max(int(patch_size[0] * scale) // 2 * 2 + 1, 3)
        canvas = cv2.GaussianBlur(canvas, (k, k), 0)

    colored = apply_colormap(canvas, cmap)

    return block_blend(slide, colored, cover, read_level, alpha,
                       block_size=block_size, blank_canvas=blank_canvas)
