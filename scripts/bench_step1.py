"""Step1 tiling throughput on a synthetic SPY corpus (VERDICT r2 item 9).

The reference fans its contour predicate over a 4-worker mp.Pool
(`wsi_core/WholeSlideImage.py:519-531`); our Step1 rasterises the contour
predicates vectorised on the host instead. This measures slides/min of
the ACTUAL CLI (`Step1_create_patches_fp.py`) end to end: C++ SPY decode,
HSV segmentation, grid tiling, coords H5, mask/stitch JPGs, CSV resume.

Usage: python scripts/bench_step1.py [--slides 12] [--size 8192x6144]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slides", type=int, default=12)
    ap.add_argument("--size", default="8192x6144")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    sys.path.insert(0, REPO)
    from acmil_tpu.wsi.synthetic import write_synthetic_spy

    work = tempfile.mkdtemp(prefix="step1_bench_")
    src = os.path.join(work, "slides")
    t0 = time.perf_counter()
    for i in range(args.slides):
        write_synthetic_spy(os.path.join(src, f"s{i:03d}.spy"),
                            width=w, height=h, seed=i, tumor=i % 2 == 0)
    gen_s = time.perf_counter() - t0

    out = os.path.join(work, "out")
    # (Step1 here always runs seg+patch+stitch; a_t/a_h lowered for the
    # small synthetic tissue areas, matching the verify-skill note)
    cmd = [sys.executable, os.path.join(REPO, "Step1_create_patches_fp.py"),
           "--source", src, "--save_dir", out, "--patch_size", "256",
           "--step_size", "256", "--a_t", "1", "--a_h", "1"]
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"Step1 failed:\n{r.stdout[-2000:]}\n"
                           f"{r.stderr[-2000:]}")
    n_h5 = len([f for f in os.listdir(os.path.join(out, "patches"))
                if f.endswith(".h5")])
    assert n_h5 == args.slides, (n_h5, args.slides)
    print(f"corpus: {args.slides} SPY slides {w}x{h} "
          f"(generation {gen_s:.1f}s, not counted)")
    print(f"Step1 wall: {wall:.1f}s -> "
          f"{args.slides / wall * 60:.1f} slides/min "
          f"({wall / args.slides:.2f} s/slide)")


if __name__ == "__main__":
    main()
