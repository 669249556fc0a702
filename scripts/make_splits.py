#!/usr/bin/env python
"""Generate frozen split JSONs (the reference ships
`splits/camelyon/split_{1..5}.json`; data files aren't copied — this
regenerates equivalent frozen splits from a feature H5).

Camelyon semantics (`datasets/datasets.py:16-31`): slides whose name
contains 'test' form the test set; the rest split 90/10 train/val.
"""

from __future__ import annotations

import argparse
import json
import os
import random

import h5py


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h5", required=True, help="feature H5 (group per slide)")
    p.add_argument("--out_dir", default="./splits/camelyon")
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    p.add_argument("--val_frac", type=float, default=0.1)
    args = p.parse_args()

    with h5py.File(args.h5, "r") as f:
        names = list(f.keys())
    test = sorted(n for n in names if "test" in n)
    train_val = sorted(n for n in names if "test" not in n)

    os.makedirs(args.out_dir, exist_ok=True)
    for seed in args.seeds:
        rng = random.Random(seed)
        tv = list(train_val)
        rng.shuffle(tv)
        n_val = max(1, int(len(tv) * args.val_frac))
        split = {"train_names": tv[n_val:], "val_names": tv[:n_val],
                 "test_names": test}
        out = os.path.join(args.out_dir, f"split_{seed}.json")
        with open(out, "w") as fh:
            json.dump(split, fh, indent=1)
        print(f"{out}: {len(split['train_names'])} train / "
              f"{len(split['val_names'])} val / {len(test)} test")


if __name__ == "__main__":
    main()
