"""Per-trunk extraction MFU: measured TFLOP/s vs the v5e bf16 peak.

VERDICT r3 item 4: "near roofline" must be a number. For each encoder
trunk the reference's Step2 serves (`/root/reference/models.py:191`,
`Step2_feature_extract.py:35-67`) this measures chained end-to-end
throughput through the tiered fast path (encoders/fast.py) and divides
analytic useful FLOPs (logical token count, no padding) by the chip's
bf16 peak.

Run on the real TPU: `python scripts/bench_mfu.py [--trunks vit_s,...]`.
Prints one JSON line per trunk; paste the table into BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from acmil_tpu.models.encoders.fast import vit_encode
from acmil_tpu.models.encoders.vit import ViT

V5E_BF16_PEAK_TFLOPS = 197.0  # one v5e chip, bf16 MXU peak


def vit_flops_per_image(img: int, patch: int, dim: int, depth: int,
                        hidden: int, act: str, proj_dim=None) -> float:
    """Useful (logical) FLOPs per image, 2*MACs convention."""
    n = (img // patch) ** 2 + 1
    f = 2 * n * dim * (patch * patch * 3)          # patch embed
    per_layer = (
        2 * n * dim * 3 * dim                      # qkv
        + 2 * n * n * dim                          # q·k (all heads)
        + 2 * n * n * dim                          # p·v
        + 2 * n * dim * dim                        # out proj
    )
    if act == "swiglu":
        per_layer += 2 * n * dim * 2 * hidden + 2 * n * hidden * dim
    else:
        per_layer += 4 * n * dim * hidden
    f += depth * per_layer
    if proj_dim:
        f += 2 * dim * proj_dim
    return float(f)


TRUNKS = {
    # name -> (ctor kwargs, img, patch, batch, act)
    "vit_s16": (dict(patch=16, dim=384, depth=12, heads=6), 224, 512),
    "vit_b16": (dict(patch=16, dim=768, depth=12, heads=12), 224, 128),
    "uni_vitl16": (dict(patch=16, dim=1024, depth=24, heads=16,
                        layerscale=True), 224, 64),
    "clip_l336": (dict(patch=14, dim=1024, depth=24, heads=16,
                       img_size=336, proj_dim=768, pre_norm=True,
                       act="quick_gelu"), 336, 32),
    "gigapath_vitg16": (dict(patch=16, dim=1536, depth=40, heads=24,
                             mlp_ratio=16.0 / 3.0, act="swiglu",
                             layerscale=True), 224, 32),
}


def bench_trunk(name: str, reps: int = 3):
    kw, img, batch = TRUNKS[name]
    kw = dict(kw)
    patch = kw.pop("patch")
    dim, depth, heads = kw.pop("dim"), kw.pop("depth"), kw.pop("heads")
    act = kw.get("act", "gelu")
    proj_dim = kw.get("proj_dim")
    pre_norm = kw.get("pre_norm", False)
    mlp_ratio = kw.pop("mlp_ratio", 4.0)
    dt = jnp.bfloat16
    m = ViT(patch, dim, depth, heads, dtype=dt, mlp_ratio=mlp_ratio, **kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, img, img, 3), dt)
    params = jax.device_put(m.init(rng, x[:1])["params"])

    @jax.jit
    def step(params, x):
        f = vit_encode(params, x, patch=patch, depth=depth, heads=heads,
                       dtype=dt, act=act, pre_norm=pre_norm,
                       proj_dim=proj_dim)
        return x * (1.0 + 0.0 * f.mean().astype(dt)), f

    def chain(k):
        xx, f = x, None
        t0 = time.perf_counter()
        for _ in range(k):
            xx, f = step(params, xx)
        float(f[0, 0].astype(jnp.float32))
        return time.perf_counter() - t0

    chain(2)  # compile + warm
    per = [(chain(10) - chain(3)) / 7 for _ in range(reps)]
    sec = float(np.median(per))
    tput = batch / sec
    hidden = int(dim * mlp_ratio) if act != "swiglu" else int(
        dim * mlp_ratio / 2 + 0.5)
    # swiglu hidden: timm SwiGLUPacked at ratio 16/3 gives hidden=4096 for
    # GigaPath (D=1536): packed Dense emits 2*hidden
    if name == "gigapath_vitg16":
        hidden = 4096
    fl = vit_flops_per_image(img, patch, dim, depth, hidden, act, proj_dim)
    tflops = fl * tput / 1e12
    mfu = tflops / V5E_BF16_PEAK_TFLOPS
    print(json.dumps({
        "metric": f"extraction_mfu_{name}",
        "patches_per_s": round(tput, 1),
        "gflop_per_image": round(fl / 1e9, 1),
        "tflops": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(mfu, 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trunks", default=",".join(TRUNKS))
    args = ap.parse_args()
    for t in args.trunks.split(","):
        bench_trunk(t.strip())


if __name__ == "__main__":
    main()
