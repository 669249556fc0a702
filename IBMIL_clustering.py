#!/usr/bin/env python
"""IBMIL confounder clustering (phase 1.5).

Mirrors the reference `IBMIL_clustering.py`: load the phase-1 IBMIL
checkpoint, forward the train split to collect bag features, k-means
(k=8) them and save the centroid dictionary as
``datasets_deconf/{dataset}/train_bag_cls_agnostic_feats_proto_{k}_pretrain_{pretrain}_seed_{seed}.npy``
(`IBMIL_clustering.py:118-145`). faiss GPU k-means is replaced by the
on-device Lloyd iterations in :mod:`acmil_tpu.ops.kmeans`.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from acmil_tpu.cli.train import load_conf
from acmil_tpu.config import Config
from acmil_tpu.data import BagLoader, build_hdf5_feat_dataset
from acmil_tpu.engine.checkpoint import CheckpointManager
from acmil_tpu.engine.train import create_train_state
from acmil_tpu.models import build_mil_model
from acmil_tpu.ops.kmeans import build_confounder_prototypes
from acmil_tpu.utils import set_seed


def main():
    p = argparse.ArgumentParser("IBMIL confounder clustering (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--seed", type=int, default=None)  # None: YAML seed wins
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="phase-1 IBMIL checkpoint dir")
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--out_dir", type=str, default="datasets_deconf")
    args = p.parse_args()
    conf = load_conf(args)
    conf.arch = "ibmil"
    # recover the phase-1 training config from the checkpoint sidecar (the
    # Step4 pattern): the SEED picks the frozen split, so clustering with
    # a different seed than training would collect features over the wrong
    # train set. Explicit CLI values still win.
    from acmil_tpu.engine.checkpoint import adopt_checkpoint_config

    adopt_checkpoint_config(
        conf, args.ckpt_dir or conf.ckpt_dir,
        keys=("seed", "D_feat", "D_inner", "n_class", "pretrain",
              "dataset", "min_bucket", "max_patches"), cli_args=args)
    set_seed(conf.seed)

    model, family = build_mil_model(conf)
    feat_path = os.path.join(conf.data_dir,
                             f"patch_feats_pretrain_{conf.pretrain}.h5")
    train_src, _, _ = build_hdf5_feat_dataset(feat_path, conf)
    loader = BagLoader(train_src, conf.B, min_bucket=conf.min_bucket,
                       max_patches=conf.max_patches)

    rng = jax.random.PRNGKey(conf.seed)
    example = next(iter(loader))
    state = create_train_state(model, conf, rng, example, 1)
    ckpt = CheckpointManager(conf.ckpt_dir)
    if ckpt.exists("best"):
        state = ckpt.restore("best", state)
        print(f"loaded phase-1 checkpoint from {conf.ckpt_dir}")
    else:
        raise SystemExit(f"no checkpoint-best under {conf.ckpt_dir}; "
                         "train phase 1 first (Step3_WSI_classification_IBMIL.py)")

    @jax.jit
    def bag_feat(params, bag):
        out = model.apply({"params": params}, bag.feats, bag.mask,
                          deterministic=True)
        return out["bag_feat"]

    feats = []
    for bag in loader:
        f = np.asarray(bag_feat(state.params, bag))
        valid = np.asarray(bag.mask.any(axis=1))
        feats.append(f[valid])
    feats = np.concatenate(feats, axis=0).reshape(-1, conf.D_inner)
    print(f"collected {feats.shape[0]} bag features, clustering k={args.k}")

    protos = build_confounder_prototypes(feats, k=args.k, seed=66)
    out_dir = os.path.join(args.out_dir, conf.dataset)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(
        out_dir,
        f"train_bag_cls_agnostic_feats_proto_{args.k}_pretrain_"
        f"{conf.pretrain}_seed_{conf.seed}.npy")
    np.save(out, protos)
    print(f"saved confounder prototypes {protos.shape} -> {out}")


if __name__ == "__main__":
    main()
