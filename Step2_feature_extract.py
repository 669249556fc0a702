#!/usr/bin/env python
"""Step2 — patch feature extraction → feature-bag H5.

Mirrors the reference `Step2_feature_extract.py` (`extract_feature:35`,
main `:124-172`): for every slide with Step1 coords, run the patch encoder
over batched patch pixels and write one H5 group per slide with ``feat``
(float16), ``coords`` and a ``label`` attribute — the exact schema the
Step3 trainers consume.

TPU redesign: batches are static-shape uint8 arrays fed through a
double-buffered host thread; normalisation happens on device in bf16 and
is fused into the encoder's first conv; features come back fp16. No
hardcoded ``cuda:2`` (`Step2:19`, SURVEY §7 known-bugs).
"""

from __future__ import annotations

import argparse
import os
import time

import h5py
import numpy as np


def extract_slide_features(model, variables, spec, slide, coords,
                           patch_size_l0, patch_level, batch_size=256,
                           embed=None):
    from acmil_tpu.data.patch_dataset import SlidePatchBatches
    from acmil_tpu.models.encoders.build import encoder_feature_fn

    if embed is None:
        # uint8 batch -> fp16 features; params enter as device-resident
        # jit ARGUMENTS. Callers looping over slides should build this
        # ONCE via encoder_feature_fn and pass it in — every fresh
        # closure is a fresh jit instance whose executable reloads
        # through the compile relay (~8s; BENCH_NOTES.md)
        embed = encoder_feature_fn(model, variables, spec)

    src = SlidePatchBatches(slide, coords, patch_size_l0, patch_level,
                            target_size=spec.img_size, batch_size=batch_size)
    feats = []
    n_done = 0
    for imgs, _, n in src:
        out = np.asarray(embed(imgs))
        feats.append(out[:n])
        n_done += n
    return np.concatenate(feats) if feats else np.zeros((0, spec.embed_dim),
                                                        np.float16)


def extract_roi_features(model, variables, spec, roi_dir, output_dir,
                         batch_size=64):
    """ROI-centroid side path (`Step2_feature_extract.py:75-120` in the
    reference): ImageFolder-style class subdirectories of ROI crops →
    per-class mean feature centroids saved as ``roi_feats.npy``."""
    import cv2
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.encoders.build import encoder_feature_fn

    classes = sorted(d for d in os.listdir(roi_dir)
                     if os.path.isdir(os.path.join(roi_dir, d)))

    embed = encoder_feature_fn(model, variables, spec, out_dtype=jnp.float32)

    feats, labels = [], []
    for ci, cls in enumerate(classes):
        cdir = os.path.join(roi_dir, cls)
        files = sorted(f for f in os.listdir(cdir)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        for i in range(0, len(files), batch_size):
            chunk = files[i:i + batch_size]
            imgs = np.zeros((batch_size, spec.img_size, spec.img_size, 3),
                            np.uint8)
            for j, fname in enumerate(chunk):
                img = cv2.cvtColor(cv2.imread(os.path.join(cdir, fname)),
                                   cv2.COLOR_BGR2RGB)
                imgs[j] = cv2.resize(img, (spec.img_size, spec.img_size))
            out = np.asarray(embed(jnp.asarray(imgs)), np.float32)[:len(chunk)]
            feats.append(out)
            labels.extend([ci] * len(chunk))
    feats = np.concatenate(feats)
    labels = np.asarray(labels)
    # per-class centroids, skipping class 0 like the reference (`:116-119`)
    centroids = np.stack([feats[labels == c].mean(axis=0)
                          for c in range(1, len(classes))])
    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(output_dir, "roi_feats.npy")
    np.save(out, centroids)
    print(f"roi centroids {centroids.shape} -> {out}")
    return centroids


def main():
    from acmil_tpu.config import Config
    from acmil_tpu.models.encoders import build_encoder
    from acmil_tpu.wsi import open_slide
    from acmil_tpu.wsi.slide import SLIDE_EXTS
    from acmil_tpu.wsi.tiling import load_coords_h5

    p = argparse.ArgumentParser("Step2: feature extraction (TPU)")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--slide_dir", default=None)
    p.add_argument("--coords_dir", default=None,
                   help="Step1 save_dir/patches with per-slide coord H5s")
    p.add_argument("--output_dir", required=True)
    # default=None so YAML config values survive the merge (Config's own
    # defaults are ViT-S/16 / medical_ssl)
    p.add_argument("--backbone", default=None)
    p.add_argument("--pretrain", default=None)
    p.add_argument("--pretrain_weights", default="",
                   help="local torch checkpoint to convert")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--label_csv", default=None,
                   help="CSV with slide_id,label columns")
    p.add_argument("--roi_dir", default=None,
                   help="ImageFolder-style ROI crops: extract per-class "
                        "centroid features instead of slide bags")
    p.add_argument("--mesh_data", type=int, default=None,
                   help="shard extraction batches over N devices "
                        "(shard_map over the batch axis; 0 = single chip)")
    p.add_argument("--mesh_model", type=int, default=None,
                   help="tensor-parallel degree for the trunk: shard "
                        "attention heads + MLP hidden over N devices "
                        "(Megatron TP, ViT trunks only; composes with "
                        "--mesh_data as a (data, model) mesh)")
    args = p.parse_args()

    overrides = {k: v for k, v in vars(args).items() if v is not None}
    conf = (Config.from_yaml(args.config, overrides) if args.config
            else Config.from_dict(overrides))
    conf.resolve_dims()
    batch_size = int(getattr(conf, "batch_size", 0) or 256)
    mesh_data = int(getattr(conf, "mesh_data", 0) or 0)
    mesh_model = int(getattr(conf, "mesh_model", 0) or 0)

    import jax

    model, spec, variables = build_encoder(conf)
    if variables is None:
        rng = jax.random.PRNGKey(0)
        dummy = np.zeros((1, spec.img_size, spec.img_size, 3), np.float32)
        variables = model.init(rng, dummy)
    else:
        rng = jax.random.PRNGKey(0)
        dummy = np.zeros((1, spec.img_size, spec.img_size, 3), np.float32)
        init_vars = model.init(rng, dummy)
        # graft converted encoder weights over the random init (head stays)
        merged = dict(init_vars)
        params = dict(init_vars["params"])
        params["encoder"] = variables["params"]["encoder"]
        merged["params"] = params
        if "batch_stats" in variables:
            merged["batch_stats"] = variables["batch_stats"]
        variables = merged

    if args.roi_dir:
        extract_roi_features(model, variables, spec, args.roi_dir,
                             args.output_dir, batch_size)
        return
    if not args.slide_dir or not args.coords_dir:
        raise SystemExit("--slide_dir and --coords_dir are required "
                         "(or use --roi_dir)")

    labels = {}
    if args.label_csv:
        import pandas as pd

        df = pd.read_csv(args.label_csv)
        labels = dict(zip(df["slide_id"].astype(str), df["label"]))

    coord_files = sorted(f for f in os.listdir(args.coords_dir)
                         if f.endswith(".h5"))
    if not coord_files:
        # check before building the embed closure: encoder_feature_fn
        # device-puts the full encoder param tree (seconds through the
        # relay link, GBs for UNI/GigaPath) — pointless on a typo'd dir
        raise SystemExit(
            f"no coord .h5 files in {args.coords_dir!r} — Step1 writes "
            "them under <save_dir>/patches/")

    from acmil_tpu.models.encoders.build import encoder_feature_fn

    if mesh_model > 1:
        # Megatron TP for the trunk (GigaPath/UNI class): heads + MLP
        # hidden sharded 1/tp per chip, two activation all-reduces per
        # layer over the innermost ('model') ICI axis; composes with
        # data parallelism on the outer axis (parallel/tp.py)
        from acmil_tpu.parallel.tp import make_tp_mesh, tp_encoder_feature_fn

        mesh = make_tp_mesh(data=max(mesh_data, 1), model=mesh_model)
        embed = tp_encoder_feature_fn(model, variables, spec, mesh)
    else:
        mesh = None
        if mesh_data:
            from acmil_tpu.parallel import make_mesh

            mesh = make_mesh(data=mesh_data, seq=1)
        embed = encoder_feature_fn(model, variables, spec, mesh=mesh)  # shared jit
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir,
                            f"patch_feats_pretrain_{conf.pretrain}.h5")
    with h5py.File(out_path, "a") as fout:
        for cf in coord_files:
            name = os.path.splitext(cf)[0]
            if name in fout:
                print(f"{name}: exists, skipping")
                continue
            slide_path = None
            for ext in SLIDE_EXTS:
                cand = os.path.join(args.slide_dir, name + ext)
                if os.path.exists(cand):
                    slide_path = cand
                    break
            if slide_path is None:
                print(f"{name}: slide not found, skipping")
                continue
            coords, _, attrs = load_coords_h5(os.path.join(args.coords_dir, cf))
            if len(coords) == 0:
                print(f"{name}: no patches, skipping")
                continue
            slide = open_slide(slide_path)
            t0 = time.time()
            patch_size_l0 = int(attrs.get("patch_size", 512) *
                                attrs.get("downsample", 1.0))
            feats = extract_slide_features(
                model, variables, spec, slide, coords, patch_size_l0,
                int(attrs.get("patch_level", 0)), batch_size,
                embed=embed)
            dt = time.time() - t0
            g = fout.create_group(name)
            g.create_dataset("feat", data=feats.astype(np.float16))
            g.create_dataset("coords", data=coords)
            g.attrs["label"] = int(labels.get(name, 0))
            print(f"{name}: {len(feats)} patches in {dt:.1f}s "
                  f"({len(feats) / max(dt, 1e-9):.0f} patches/s)")
    print(f"features -> {out_path}")


if __name__ == "__main__":
    main()
