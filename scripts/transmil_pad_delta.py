"""Quantify TransMIL zero-pad vs wrap-pad accuracy delta (VERDICT r2
item 8): train the same TransMIL twice on the same synthetic features —
once with the TPU-first masked zero-pad, once with the reference's
wrap-pad strict mode — and report best-epoch AUCs per seed.

Usage: python scripts/transmil_pad_delta.py [--work DIR] [--epochs 15]
       [--seeds 1,4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/transmil_pad_delta")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--seeds", default="1,4")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from acmil_tpu.data import write_feature_h5

    work = os.path.abspath(args.work)
    os.makedirs(f"{work}/data", exist_ok=True)
    rs = np.random.RandomState(0)
    slides = {}
    d = 128
    for i in range(200):
        n = int(rs.randint(200, 900))
        label = i % 2
        feats = rs.randn(n, d).astype(np.float32)
        if label:
            # TransMIL needs a clearly learnable task to compare pad
            # modes above chance: broad tumors at the conftest-style
            # >=6-sigma-clearing shift
            k = max(2, int(n * rs.uniform(0.05, 0.15)))
            idx = rs.choice(n, k, replace=False)
            feats[idx] += rs.uniform(4.5, 6.5) * np.ones(d) / np.sqrt(d)
        name = f"{'test_' if i >= 140 else ''}slide_{i:03d}"
        slides[name] = {"feat": feats,
                        "coords": rs.randint(0, 50000, size=(n, 2)),
                        "label": label}
    write_feature_h5(f"{work}/data/patch_feats_pretrain_medical_ssl.h5",
                     slides)
    names = sorted(slides)
    test_names = [n for n in names if n.startswith("test_")]
    rest = [n for n in names if not n.startswith("test_")]
    os.makedirs(f"{work}/splits/camelyon", exist_ok=True)
    for s in (int(x) for x in args.seeds.split(",")):
        with open(f"{work}/splits/camelyon/split_{s}.json", "w") as f:
            json.dump({"train_names": rest[24:], "val_names": rest[:24],
                       "test_names": test_names}, f)

    results = []
    for pad_mode in ("zero", "wrap"):
        cfg = f"""
dataset: camelyon
n_class: 2
pretrain: medical_ssl
D_feat: 128
D_inner: 128
arch: transmil
transmil_pad_mode: {pad_mode}
lr: 0.0002
min_lr: 0.000001
wd: 0.00001
train_epoch: {args.epochs}
warmup_epoch: 2
B: 1
min_bucket: 1024
data_dir: {work}/data
split_dir: {work}/splits
wandb_mode: disabled
"""
        cpath = f"{work}/cfg_{pad_mode}.yml"
        with open(cpath, "w") as f:
            f.write(cfg)
        for seed in (int(x) for x in args.seeds.split(",")):
            from acmil_tpu.cli.train import main as train_main

            best = train_main(["--config", cpath, "--seed", str(seed),
                               "--ckpt_dir",
                               f"{work}/ckpt_{pad_mode}_s{seed}"])
            row = {"pad_mode": pad_mode, "seed": seed,
                   "val_auc": best["auc"], "test_auc": best["test_auc"],
                   "test_f1": best["test_f1"]}
            results.append(row)
            print(json.dumps(row), flush=True)

    with open(f"{work}/pad_delta.json", "w") as f:
        json.dump(results, f, indent=2)
    for mode in ("zero", "wrap"):
        aucs = [r["test_auc"] for r in results if r["pad_mode"] == mode]
        print(f"{mode}: mean test AUC {np.mean(aucs):.4f} "
              f"(seeds: {['%.4f' % a for a in aucs]})")


if __name__ == "__main__":
    main()
