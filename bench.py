"""Headline benchmark: fused ACMIL_GA per-slide MIL inference latency.

Target (BASELINE.md): < 5 ms/slide on TPU for the flagship head over a
real-scale bag (16k patches, D_feat=384 — the medical_ssl ViT-S config).

Methodology: the axon relay acks ``block_until_ready`` before device
compute finishes, so single-call timing only measures dispatch. We chain
K iterations with a hard data dependency (the bag output is folded back
into the feature matrix, forcing each iteration to wait for the previous)
and difference two chain lengths, syncing with a host readback. The
number therefore *includes* one extra full HBM rewrite of the feature
matrix per iteration — it is an upper bound on true per-slide latency.

Prints one JSON line; ``vs_baseline`` > 1.0 means faster than the 5 ms
target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from acmil_tpu.config import Config
    from acmil_tpu.models import build_mil_model
    from acmil_tpu.models.fast import acmil_ga_infer

    conf = Config(n_class=2, D_feat=384, D_inner=128, arch="ga",
                  n_token=5, n_masked_patch=10, mask_drop=0.6)
    model, _ = build_mil_model(conf)

    n_pad, d = 16384, conf.D_feat
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (n_pad, d), jnp.float32)
    mask = jnp.arange(n_pad) < 14000
    params = model.init({"params": rng}, feats[None], mask[None])["params"]

    @jax.jit
    def step(f):
        sub, slide, attn = acmil_ga_infer(params, f, mask, chunk=2048)
        # hard dependency: next iteration's features depend on this slide's
        # output, so the chain cannot pipeline/DCE
        return f * (1.0 + 0.0 * slide[0]), slide

    def run_chain(k):
        f = feats
        slide = None
        t0 = time.perf_counter()
        for _ in range(k):
            f, slide = step(f)
        _ = float(slide[0])          # host readback forces completion
        return time.perf_counter() - t0

    _ = run_chain(2)  # warm/compile
    k0, k1 = 32, 256
    diffs = []
    for _ in range(3):
        t0, t1 = run_chain(k0), run_chain(k1)
        diffs.append((t1 - t0) / (k1 - k0) * 1e3)
    ms = max(float(np.median(diffs)), 1e-6)

    baseline_ms = 5.0  # BASELINE.md: <5 ms/slide MIL inference target
    print(json.dumps({
        "metric": "acmil_ga_fused_inference_latency_16k_patches",
        "value": round(ms, 4),
        "unit": "ms/slide",
        "vs_baseline": round(baseline_ms / ms, 3),
    }))


if __name__ == "__main__":
    main()
