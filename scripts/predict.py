#!/usr/bin/env python
"""Batch inference: score every slide in a feature H5 with a trained
checkpoint → per-slide probability CSV (+ metrics when labels exist).

The serving-side complement to Step3 (the reference has no standalone
scoring entry point; its eval lives inside the training scripts)."""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from acmil_tpu.cli.train import load_conf
    from acmil_tpu.data import BagLoader
    from acmil_tpu.data.h5io import FeatureBagSource
    from acmil_tpu.engine import get_family, make_eval_step
    from acmil_tpu.engine.checkpoint import CheckpointManager
    from acmil_tpu.engine.metrics import classification_metrics
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model
    import h5py

    p = argparse.ArgumentParser("score slides with a trained MIL checkpoint")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--features", required=True, help="feature H5")
    p.add_argument("--out_csv", default="predictions.csv")
    p.add_argument("--arch", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--tag", default="best", choices=["best", "last"])
    args = p.parse_args()
    conf = load_conf(args)

    from acmil_tpu.engine.checkpoint import adopt_checkpoint_config

    ckpt = CheckpointManager(args.ckpt_dir)
    adopt_checkpoint_config(conf, args.ckpt_dir, tag=args.tag)

    from acmil_tpu.data.bags import pad_bag

    with h5py.File(args.features, "r") as f:
        names = list(f.keys())
    src = FeatureBagSource(args.features, names)

    model, family = build_mil_model(conf)
    fam = get_family(family)
    item0 = src[0]
    bag0 = pad_bag(item0["input"], item0["coords"], item0["label"],
                   min_bucket=conf.min_bucket, max_patches=conf.max_patches)
    state = create_train_state(model, conf, jax.random.PRNGKey(conf.seed),
                               bag0, 1, family=fam)
    state = ckpt.restore(args.tag, state)
    eval_step = make_eval_step(model, fam)

    rows = []
    for i, name in enumerate(names):
        item = src[i]
        bag = pad_bag(item["input"], item["coords"], item["label"],
                      min_bucket=conf.min_bucket, max_patches=conf.max_patches)
        probs = np.asarray(eval_step(state.params, bag))[0]
        rows.append((name, item["label"], *probs.tolist(),
                     int(probs.argmax())))

    with open(args.out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["slide_id", "label"]
                   + [f"prob_{c}" for c in range(conf.n_class)] + ["pred"])
        w.writerows(rows)
    print(f"{len(rows)} slides -> {args.out_csv}")

    labels = np.asarray([r[1] for r in rows])
    if len(set(labels.tolist())) > 1:
        probs = np.asarray([r[2:2 + conf.n_class] for r in rows])
        m = classification_metrics(probs, labels)
        print(f"auc {m['auc']:.4f} acc {m['acc']:.4f} f1 {m['f1']:.4f}")


if __name__ == "__main__":
    main()
