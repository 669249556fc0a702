#!/usr/bin/env python
"""Step4 — attention heatmap rendering.

Mirrors the reference `Step4_visualize_heatmap_camelyon.py` (`main:50`):
load the trained MIL head, forward each test slide's feature bag, softmax
the branch attention, and overlay it on the slide via ``vis_heatmap``.
The attention pass runs through the fused Pallas path when the arch is
ga/abmil. (The reference's ``use_attention_mask`` kwarg crash at
`Step4:113` is fixed here — SURVEY §2.1.)
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acmil_tpu.cli.train import load_conf
    from acmil_tpu.data import BagLoader, build_hdf5_feat_dataset
    from acmil_tpu.data.bags import pad_bag
    from acmil_tpu.engine.checkpoint import CheckpointManager
    from acmil_tpu.engine.train import create_train_state
    from acmil_tpu.models import build_mil_model
    from acmil_tpu.ops.masked import masked_softmax
    from acmil_tpu.wsi import open_slide
    from acmil_tpu.wsi.slide import SLIDE_EXTS

    p = argparse.ArgumentParser("Step4: attention heatmaps (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--slide_dir", required=True)
    p.add_argument("--output_dir", default="./heatmaps")
    p.add_argument("--arch", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--patch_size", type=int, default=512)
    p.add_argument("--n_slides", type=int, default=-1)
    args = p.parse_args()
    conf = load_conf(args)

    # the checkpoint sidecar stores the exact training config
    # (engine/checkpoint.py) — rebuild the model with it so arch
    # hyperparams (n_token, ...) match the saved params
    from acmil_tpu.engine.checkpoint import adopt_checkpoint_config

    adopt_checkpoint_config(conf, args.ckpt_dir)

    model, family = build_mil_model(conf)
    feat_path = os.path.join(conf.data_dir,
                             f"patch_feats_pretrain_{conf.pretrain}.h5")
    _, _, test_src = build_hdf5_feat_dataset(feat_path, conf)
    if len(test_src.names) == 0:
        raise SystemExit(
            f"Step4: the test split is empty — no "
            f"'{conf.split_dir}/{conf.dataset}/split_{conf.seed}.json' was "
            "found and the random-split fallback assigns no test slides. "
            "Pass the --seed used for training so the same frozen split "
            "file is loaded."
        )

    rng = jax.random.PRNGKey(conf.seed)
    item0 = test_src[0]
    bag0 = pad_bag(item0["input"], item0["coords"], item0["label"],
                   min_bucket=conf.min_bucket, max_patches=conf.max_patches)
    state = create_train_state(model, conf, rng, bag0, 1, family=family)
    ckpt = CheckpointManager(conf.ckpt_dir)
    state = ckpt.restore("best", state)

    @jax.jit
    def attn_fn(params, feats, mask):
        out = model.apply({"params": params}, feats, mask, deterministic=True)
        if isinstance(out, tuple):          # acmil: (sub, slide, attn)
            a = out[2]
        elif isinstance(out, dict):
            a = out["attn"]
        else:
            raise ValueError("model emits no attention")
        if a.ndim == 4:                     # [B,H,K,N] -> mean heads
            a = a.mean(axis=1)
        probs = masked_softmax(a, mask[:, None, :]).mean(axis=1)  # [B, N]
        return probs

    os.makedirs(args.output_dir, exist_ok=True)
    names = test_src.names[: args.n_slides if args.n_slides > 0 else None]
    from acmil_tpu.wsi.heatmap import vis_heatmap

    for name in names:
        item = test_src[test_src.names.index(name)]
        bag = pad_bag(item["input"], item["coords"], item["label"],
                      min_bucket=conf.min_bucket, max_patches=conf.max_patches)
        probs = np.asarray(attn_fn(state.params, bag.feats, bag.mask))[0]
        n = int(bag.mask.sum())
        # reference scaling: softmax attention x N x zoom (Step4:117-118)
        scores = probs[:n] * n

        slide_path = None
        for ext in SLIDE_EXTS:
            cand = os.path.join(args.slide_dir, name + ext)
            if os.path.exists(cand):
                slide_path = cand
                break
        if slide_path is None:
            print(f"{name}: slide not found, skipping")
            continue
        slide = open_slide(slide_path)
        img = vis_heatmap(slide, scores, np.asarray(bag.coords[0, :n]),
                          patch_size=(args.patch_size, args.patch_size))
        out = os.path.join(args.output_dir, f"{name}_heatmap.png")
        cv2.imwrite(out, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        print(f"{name}: heatmap -> {out}")


if __name__ == "__main__":
    main()
