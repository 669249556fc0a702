#!/usr/bin/env python
"""Step1 — WSI tissue segmentation + grid tiling → coords H5.

Mirrors the reference `Step1_create_patches_fp.py` (`seg_and_patch:58`):
walk a slide directory, segment tissue, grid-tile contours, save coords H5
+ mask/stitch JPGs, with a per-slide CSV for progress/resume
(`batch_process_utils.py:18`; auto_skip at `Step1:111-114`; failures
marked and skipped, `Step1:118-122,202-215`).
"""

from __future__ import annotations

import argparse
import os
import time

import cv2
import numpy as np
import pandas as pd

from acmil_tpu.wsi.slide import SLIDE_EXTS


def walk_dir(source):
    out = []
    for root, _, files in os.walk(source):
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in SLIDE_EXTS:
                out.append(os.path.join(root, f))
    return out


def seg_and_patch(args):
    from acmil_tpu.wsi import open_slide
    from acmil_tpu.wsi.segment import segment_tissue, vis_wsi
    from acmil_tpu.wsi.stitch import stitch_coords
    from acmil_tpu.wsi.tiling import save_coords_h5, tile_contours

    patch_dir = os.path.join(args.save_dir, "patches")
    mask_dir = os.path.join(args.save_dir, "masks")
    stitch_dir = os.path.join(args.save_dir, "stitches")
    for d in (patch_dir, mask_dir, stitch_dir):
        os.makedirs(d, exist_ok=True)

    slides = walk_dir(args.source)
    csv_path = os.path.join(args.save_dir, "process_list_autogen.csv")
    if os.path.exists(csv_path):
        df = pd.read_csv(csv_path).set_index("slide_id")
    else:
        df = pd.DataFrame(index=[os.path.basename(s) for s in slides],
                          data={"status": "tbp", "process": 1})
        df.index.name = "slide_id"

    total_seg, total_patch = 0.0, 0.0
    for path in slides:
        sid = os.path.basename(path)
        name = os.path.splitext(sid)[0]
        h5_path = os.path.join(patch_dir, name + ".h5")
        if args.auto_skip and os.path.exists(h5_path):
            print(f"{sid}: exists, skipping")
            df.loc[sid, "status"] = "already_exist"
            continue
        try:
            slide = open_slide(path)
        except Exception as e:
            print(f"{sid}: failed to open ({e})")
            df.loc[sid, "status"] = "failed_open"
            df.to_csv(csv_path)
            continue
        t0 = time.time()
        try:
            seg = segment_tissue(slide, sthresh=args.sthresh,
                                 mthresh=args.mthresh, close=args.close,
                                 use_otsu=args.use_otsu, a_t=args.a_t,
                                 a_h=args.a_h, ref_patch_size=args.patch_size)
        except Exception as e:
            print(f"{sid}: failed segmentation ({e})")
            df.loc[sid, "status"] = "failed_seg"
            df.to_csv(csv_path)
            continue
        seg_t = time.time() - t0
        cv2.imwrite(os.path.join(mask_dir, name + ".jpg"),
                    cv2.cvtColor(vis_wsi(slide, seg), cv2.COLOR_RGB2BGR))

        t0 = time.time()
        res = tile_contours(slide, seg, patch_size=args.patch_size,
                            step_size=args.step_size,
                            contour_fn=args.contour_fn)
        patch_t = time.time() - t0
        save_coords_h5(h5_path, res, name=name)
        print(f"{sid}: {len(res.coords)} patches "
              f"(seg {seg_t:.2f}s, patch {patch_t:.2f}s)")

        if not args.no_stitch and len(res.coords):
            canvas = stitch_coords(slide, res.coords,
                                   int(args.patch_size *
                                       slide.level_downsamples[0]))
            cv2.imwrite(os.path.join(stitch_dir, name + ".jpg"),
                        cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        df.loc[sid, "status"] = "processed"
        df.to_csv(csv_path)
        total_seg += seg_t
        total_patch += patch_t
    # persist once more at the end: the auto-skip branch updates status
    # only in memory, so an all-skipped (or skip-tail) run would otherwise
    # leave the resume CSV stale or never written
    df.to_csv(csv_path)
    n = max(len(slides), 1)
    print(f"avg seg {total_seg / n:.2f}s, avg patch {total_patch / n:.2f}s")


def main():
    p = argparse.ArgumentParser("Step1: create patches (TPU stack)")
    p.add_argument("--source", required=True, help="slide directory")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--patch_size", type=int, default=512)
    p.add_argument("--step_size", type=int, default=512)
    p.add_argument("--sthresh", type=int, default=8)
    p.add_argument("--mthresh", type=int, default=7)
    p.add_argument("--close", type=int, default=4)
    p.add_argument("--use_otsu", action="store_true")
    p.add_argument("--a_t", type=float, default=100)
    p.add_argument("--a_h", type=float, default=16)
    p.add_argument("--contour_fn", default="four_pt",
                   choices=["four_pt", "four_pt_hard", "center", "basic"])
    p.add_argument("--auto_skip", action="store_true", default=True)
    p.add_argument("--no_auto_skip", dest="auto_skip", action="store_false")
    p.add_argument("--no_stitch", action="store_true")
    seg_and_patch(p.parse_args())


if __name__ == "__main__":
    main()
