"""Headline benchmark: ACMIL_GA per-slide MIL inference latency.

Target (BASELINE.md): < 5 ms/slide on TPU for the flagship head over a
real-scale bag (16k patches, D_feat=384 — the medical_ssl ViT-S config).
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

    conf = Config(n_class=2, D_feat=384, D_inner=128, arch="ga",
                  n_token=5, n_masked_patch=10, mask_drop=0.6)
    model, _ = build_mil_model(conf)

    n_pad, d = 16384, conf.D_feat
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (1, n_pad, d), jnp.float32)
    mask = jnp.arange(n_pad)[None, :] < 14000
    params = model.init({"params": rng}, feats, mask)["params"]

    @jax.jit
    def fwd(params, feats, mask):
        sub, slide, attn = model.apply({"params": params}, feats, mask,
                                       deterministic=True)
        return slide, attn

    # warmup / compile
    jax.block_until_ready(fwd(params, feats, mask))

    n_iter = 50
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, feats, mask))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)

    baseline_ms = 5.0  # BASELINE.md: <5 ms/slide MIL inference target
    print(json.dumps({
        "metric": "acmil_ga_inference_latency_16k_patches",
        "value": round(ms, 4),
        "unit": "ms/slide",
        "vs_baseline": round(baseline_ms / ms, 3),
    }))


if __name__ == "__main__":
    main()
