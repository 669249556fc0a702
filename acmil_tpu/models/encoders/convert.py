"""torch → flax weight conversion for the encoder zoo.

Converts state dicts of the reference's encoders (`models.py`:
timm/DINO ViTs, torchvision-style ResNet18/50, Lunit SSL trunks) into the
parameter trees of :mod:`vit` / :mod:`resnet`. This image has no network
egress, so weights come from local ``.pth``/``.torch`` files.

Conventions: torch Linear [out, in] → flax kernel [in, out]; torch Conv
[out, in, kh, kw] → flax [kh, kw, in, out]; qkv stays fused (our
SelfAttention uses one fused qkv Dense, like timm).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def _lin(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T,
            **({"bias": _t(sd[f"{name}.bias"])} if f"{name}.bias" in sd else {})}


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _conv(sd, name):
    out = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _bn(sd, name):
    params = {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}
    stats = {"mean": _t(sd[f"{name}.running_mean"]),
             "var": _t(sd[f"{name}.running_var"])}
    return params, stats


def convert_vit(state_dict: Dict, depth: int = 12) -> Dict:
    """timm/DINO ViT state dict → flax ViT params."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    p: Dict = {
        "cls_token": _t(sd["cls_token"])[0][None] if _t(sd["cls_token"]).ndim == 3
        else _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "mlp": {"Dense_0": _lin(sd, f"{b}.mlp.fc1"),
                    "Dense_1": _lin(sd, f"{b}.mlp.fc2")},
        }
        # DINOv2-style layerscale (UNI ViT-L, GigaPath ViT-G tile encoder);
        # timm and facebookresearch/dinov2 both name these ls{1,2}.gamma
        if f"{b}.ls1.gamma" in sd:
            blk["ls1"] = _t(sd[f"{b}.ls1.gamma"])
            blk["ls2"] = _t(sd[f"{b}.ls2.gamma"])
        p[f"block{i}"] = blk
    return p


def convert_resnet(state_dict: Dict, stage_sizes=(2, 2, 2, 2)) -> Tuple[Dict, Dict]:
    """torchvision ResNet state dict → (params, batch_stats)."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: Dict = {"conv1": _conv(sd, "conv1")}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    bottleneck = any(".conv3." in k for k in sd)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
            for ci, cname in enumerate(convs, 1):
                blk_p[cname] = _conv(sd, f"{t}.{cname}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                blk_p["down_conv"] = _conv(sd, f"{t}.downsample.0")
                blk_p["down_bn"], blk_s["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = blk_p
            stats[f] = blk_s
    return params, stats


def convert_clip_vit(state_dict: Dict, depth: int = 24) -> Dict:
    """OpenAI/open_clip visual tower state dict → flax ViT params
    (for the `path-clip-L-336` / `openai-clip-L-336` encoders,
    `Step3_WSI_classification_ACMIL.py:79-81` feature families).

    open_clip layout: ``visual.conv1`` (bias-free patch embed),
    ``class_embedding``, ``positional_embedding``, ``ln_pre``,
    ``transformer.resblocks.N.{ln_1, attn.in_proj_*, attn.out_proj,
    ln_2, mlp.c_fc, mlp.c_proj}``, ``ln_post``, ``proj``.
    """
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in state_dict.items() if not k.startswith("text")}
    dim = _t(sd["class_embedding"]).reshape(-1).shape[0]
    p: Dict = {
        "cls_token": _t(sd["class_embedding"]).reshape(1, 1, dim),
        "pos_embed": _t(sd["positional_embedding"]).reshape(1, -1, dim),
        "patch_embed": {
            "kernel": _t(sd["conv1.weight"]).transpose(2, 3, 1, 0),
            "bias": np.zeros((dim,), np.float32),  # CLIP conv1 is bias-free
        },
        "norm_pre": _ln(sd, "ln_pre"),
        "norm": _ln(sd, "ln_post"),
        "proj_out": {"kernel": _t(sd["proj"])},
    }
    for i in range(depth):
        b = f"transformer.resblocks.{i}"
        p[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}.ln_1"),
            "norm2": _ln(sd, f"{b}.ln_2"),
            "attn": {
                "qkv": {"kernel": _t(sd[f"{b}.attn.in_proj_weight"]).T,
                        "bias": _t(sd[f"{b}.attn.in_proj_bias"])},
                "proj": _lin(sd, f"{b}.attn.out_proj"),
            },
            "mlp": {"Dense_0": _lin(sd, f"{b}.mlp.c_fc"),
                    "Dense_1": _lin(sd, f"{b}.mlp.c_proj")},
        }
    return p


def load_torch_checkpoint(path: str) -> Dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "teacher", "student"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
    return obj
