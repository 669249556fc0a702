"""Encoder factory + preprocessing constants.

Mirrors `build_model` (`models.py:191-206`) dispatch on
``(pretrain, backbone)`` and the eval-transform normalisation constants
(`datasets/dataset_h5.py:20-37`: ImageNet mean/std for pretrained
encoders, 0.5/0.5 otherwise; CLIP uses its own constants).

Weights load from a local torch checkpoint (``conf.pretrain_weights``);
no-egress environments fall back to random init with a warning (feature
*pipeline* still runs end to end).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from acmil_tpu.models.encoders.resnet import resnet18, resnet50
from acmil_tpu.models.encoders.vit import ViT

IMAGENET_MEAN, IMAGENET_STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
HALF_MEAN, HALF_STD = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
CLIP_MEAN, CLIP_STD = ((0.48145466, 0.4578275, 0.40821073),
                       (0.26862954, 0.26130258, 0.27577711))


@dataclass
class EncoderSpec:
    builder: object
    embed_dim: int
    img_size: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    converter: str   # 'vit' | 'resnet'
    depth: int = 12


ENCODER_SPECS = {
    # (pretrain, backbone) keys follow models.py:191-206
    ("medical_ssl", "ViT-S/16"): EncoderSpec(
        lambda dt: ViT(16, 384, 12, 6, dtype=dt), 384, 224,
        HALF_MEAN, HALF_STD, "vit"),
    ("natural_supervised", "ViT-B/16"): EncoderSpec(
        lambda dt: ViT(16, 768, 12, 12, dtype=dt), 768, 224,
        IMAGENET_MEAN, IMAGENET_STD, "vit"),
    ("natural_ssl", "ViT-S/16"): EncoderSpec(
        lambda dt: ViT(16, 768, 12, 12, dtype=dt), 768, 224,
        IMAGENET_MEAN, IMAGENET_STD, "vit"),
    ("natural_supervised", "Resnet18"): EncoderSpec(
        lambda dt: resnet18(dt), 512, 224, IMAGENET_MEAN, IMAGENET_STD,
        "resnet"),
    ("natural_supervised", "resnet18"): EncoderSpec(
        lambda dt: resnet18(dt), 512, 224, IMAGENET_MEAN, IMAGENET_STD,
        "resnet"),
    ("natural_supervised", "Resnet50"): EncoderSpec(
        lambda dt: resnet50(dt), 2048, 224, IMAGENET_MEAN, IMAGENET_STD,
        "resnet"),
    ("medical_ssl", "Resnet50"): EncoderSpec(
        lambda dt: resnet50(dt), 2048, 224, HALF_MEAN, HALF_STD, "resnet"),
    # DINO ResNet50 (`models.py:208-210`: natural_ssl + Resnet50 — the
    # dino_resnet50 checkpoint is a torchvision-layout RN50 trunk)
    ("natural_ssl", "Resnet50"): EncoderSpec(
        lambda dt: resnet50(dt), 2048, 224, IMAGENET_MEAN, IMAGENET_STD,
        "resnet"),
    # Lunit pathology DINO ViT-S/8 (`models.py:117-121` DINO_p8 registry)
    ("medical_ssl", "ViT-S/8"): EncoderSpec(
        lambda dt: ViT(8, 384, 12, 6, dtype=dt), 384, 224,
        HALF_MEAN, HALF_STD, "vit"),
    # UNI (Mahmood-lab): DINOv2 ViT-L/16 with layerscale, 1024-d
    # (`Step3_WSI_classification_ACMIL.py:82-84` D_feat row)
    ("UNI", "ViT-L/16"): EncoderSpec(
        lambda dt: ViT(16, 1024, 24, 16, layerscale=True, dtype=dt), 1024,
        224, IMAGENET_MEAN, IMAGENET_STD, "vit", depth=24),
    # GigaPath tile encoder: DINOv2 ViT-G/16 (timm vit_giant_patch14_dinov2
    # at patch 16): 1536-d, depth 40, SwiGLU-packed MLP, layerscale
    # (`Step3_WSI_classification_ACMIL.py:85-87` D_feat row)
    ("GigaPath", "ViT-G/16"): EncoderSpec(
        lambda dt: ViT(16, 1536, 40, 24, mlp_ratio=16.0 / 3.0, act="swiglu",
                       layerscale=True, dtype=dt), 1536, 224,
        IMAGENET_MEAN, IMAGENET_STD, "vit", depth=40),
    ("path-clip-L-336", "ViT-L/336"): EncoderSpec(
        lambda dt: ViT(14, 1024, 24, 16, img_size=336, proj_dim=768,
                       pre_norm=True, act="quick_gelu", dtype=dt), 768, 336,
        CLIP_MEAN, CLIP_STD, "clip_vit", depth=24),
    ("openai-clip-L-336", "ViT-L/336"): EncoderSpec(
        lambda dt: ViT(14, 1024, 24, 16, img_size=336, proj_dim=768,
                       pre_norm=True, act="quick_gelu", dtype=dt), 768, 336,
        CLIP_MEAN, CLIP_STD, "clip_vit", depth=24),
}


# pretrains that imply the encoder no matter what cfg.backbone says
PRETRAIN_ONLY = {
    "tailored_sl": ("medical_ssl", "ViT-S/16"),   # models.py:213-214
    "UNI": ("UNI", "ViT-L/16"),
    "GigaPath": ("GigaPath", "ViT-G/16"),
}


class CustomModel(nn.Module):
    """Encoder + linear head with ``return_feature``
    (`models.py:164-179`)."""

    encoder: nn.Module
    n_class: int

    @nn.compact
    def __call__(self, images, return_feature: bool = True):
        feat = self.encoder(images)
        logits = nn.Dense(self.n_class, name="head")(feat)
        if return_feature:
            return logits, feat
        return logits


def build_encoder(conf, dtype=jnp.bfloat16, fast: bool = True):
    """Returns (model, spec, params_or_None).

    Params are converted from ``conf.pretrain_weights`` when given;
    otherwise None (caller initialises randomly). ``fast=True`` uses the
    bf16 attention softmax for ViTs (inference-only, ~13% faster; see
    BENCH_NOTES.md).
    """
    key = (conf.pretrain, conf.backbone)
    spec = ENCODER_SPECS.get(key)
    if spec is None and conf.pretrain in PRETRAIN_ONLY:
        # these pretrains pick the encoder regardless of cfg.backbone
        # (`models.py:213-214`: tailored_sl -> DINO_p16 ViT-S; UNI/GigaPath
        # have exactly one published trunk each)
        spec = ENCODER_SPECS[PRETRAIN_ONLY[conf.pretrain]]
    if spec is None:
        raise ValueError(f"unknown encoder {key}; have {sorted(ENCODER_SPECS)}")
    encoder = spec.builder(dtype)
    if fast and isinstance(encoder, ViT) and dtype == jnp.bfloat16:
        # packed fused MHA (no head-relayout HBM traffic, f32 softmax in
        # VMEM): 1.5-1.7x the attention subgraph on ViT-B/CLIP-L
        # (BENCH_NOTES.md); ViT-S additionally upgrades to the whole-layer
        # kernel inside encoder_feature_fn
        encoder = encoder.clone(softmax_f32=False, attn_impl="fused")
    model = CustomModel(encoder=encoder, n_class=conf.n_class)

    variables = None
    wpath = getattr(conf, "pretrain_weights", "")
    if wpath:
        from acmil_tpu.models.encoders import convert as C

        sd = C.load_torch_checkpoint(wpath)
        if spec.converter == "vit":
            enc_params = C.convert_vit(sd, depth=spec.depth)
            variables = {"params": {"encoder": enc_params}}
        elif spec.converter == "clip_vit":
            enc_params = C.convert_clip_vit(sd, depth=spec.depth)
            variables = {"params": {"encoder": enc_params}}
        else:
            enc_params, stats = C.convert_resnet(
                sd, stage_sizes=encoder.stage_sizes)
            variables = {"params": {"encoder": enc_params},
                         "batch_stats": {"encoder": stats}}
    else:
        warnings.warn(
            f"no pretrain_weights given for {key}: encoder is randomly "
            "initialised (no network egress; supply a local torch checkpoint)")
    return model, spec, variables


def preprocess(images_u8, spec: EncoderSpec, dtype=jnp.bfloat16):
    """uint8 [B, H, W, 3] → normalised [B, S, S, 3] (eval_transforms,
    dataset_h5.py:20-37). Resize happens host-side; this is the on-device
    scale+normalise, fused by XLA into the first conv."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(spec.mean)
    std = jnp.asarray(spec.std)
    return ((x - mean) / std).astype(dtype)


def _device_put_arrays(tree):
    """device_put real array leaves; pass ShapeDtypeStructs through
    (tests probe routing with jax.eval_shape trees)."""
    return jax.tree_util.tree_map(
        lambda a: a if isinstance(a, jax.ShapeDtypeStruct)
        else jax.device_put(a), tree)


def _shard_batch(run, mesh, data_axis: str = "data"):
    """Data-parallel wrapper for an (params, images) -> feats step.

    pjit cannot partition a ``pallas_call`` by sharding propagation, so
    multi-chip extraction shard_maps the whole per-batch computation over
    the batch axis (embarrassingly parallel — no collectives; SURVEY §7
    step 5). The batch is padded up to a multiple of the mesh size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[data_axis]
    sharded = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(data_axis)), out_specs=P(data_axis),
        check_vma=False))

    def wrapped(params, images):
        b = images.shape[0]
        b_full = (b + n_dev - 1) // n_dev * n_dev
        if b_full != b:
            images = jnp.concatenate(
                [images, jnp.zeros((b_full - b,) + images.shape[1:],
                                   images.dtype)])
        return sharded(params, images)[:b]

    return wrapped


def encoder_feature_fn(model, variables, spec: EncoderSpec, fast: bool = True,
                       out_dtype=jnp.float16, mesh=None):
    """Feature-extraction closure for the Step2 engine: uint8 image batch
    -> fp16 features.

    Routes plain-GELU ViT trunks whose layers fit VMEM (ViT-S family)
    through the layer-fused Pallas path (ops/vit_layer.py; ~2x the
    unfused throughput on v5e — BENCH_NOTES.md), everything else through
    ``model.apply``. Output matches `CustomModel.forward(return_feature=
    True)`'s feature tensor (`models.py:164-179`).

    Params enter the jitted graph as ARGUMENTS, device-put once —
    closing over them would embed ~100 MB of constants in the HLO, and
    every fresh closure would re-trace/re-compile a constant-laden
    program (25s+ through a remote-compile relay, BENCH_NOTES.md).

    With ``mesh``, the whole step is shard_mapped over the mesh's 'data'
    axis for pod-scale extraction (the Pallas path cannot be partitioned
    by pjit sharding propagation).
    """

    enc = model.encoder
    if fast and isinstance(enc, ViT):
        # every ViT trunk routes through the tiered fast path
        # (encoders/fast.py): whole-layer fusion (ViT-S), attn-half
        # fusion + XLA MLP (ViT-B / UNI), packed-MHA XLA layer
        # (CLIP-L / GigaPath)
        from acmil_tpu.models.encoders.fast import vit_encode

        enc_params = _device_put_arrays(variables["params"]["encoder"])

        def run(params, images_u8):
            x = preprocess(images_u8, spec, dtype=enc.dtype)
            return vit_encode(params, x, patch=enc.patch,
                              depth=enc.depth, heads=enc.heads,
                              dtype=enc.dtype, act=enc.act,
                              pre_norm=enc.pre_norm,
                              proj_dim=enc.proj_dim).astype(out_dtype)

        run = (_shard_batch(run, mesh) if mesh is not None
               else jax.jit(run))

        def feat_fn(images_u8):
            return run(enc_params, jnp.asarray(images_u8))

        return feat_fn

    dev_vars = _device_put_arrays(variables)
    dtype = getattr(enc, "dtype", jnp.float32)

    def run_apply(vs, images_u8):
        x = preprocess(images_u8, spec, dtype=dtype)
        _, feat = model.apply(vs, x, return_feature=True)
        return feat.astype(out_dtype)

    run_apply = (_shard_batch(run_apply, mesh) if mesh is not None
                 else jax.jit(run_apply))

    def feat_fn(images_u8):
        return run_apply(dev_vars, jnp.asarray(images_u8))

    return feat_fn
