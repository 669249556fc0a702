"""CLAM/DSMIL/DTFD fused-pooling bench: fused kernel vs plain XLA graph.

VERDICT r3 item 2's "done" line: show the win at 16k-64k bags for the
newly routed heads (CLAM_SB/MB through ops/attn_pool.py with the h-bias,
DSMIL's bag head through ops/dsmil_pool.py, DTFD's per-pseudo-bag
pooling through the identity-w1 kernel route). Run on the real TPU; one
JSON line per (head, n, path) → BENCH_NOTES.md. DTFD also benches the
TRAIN step (value_and_grad) — the fused one-pass backward is where the
GA-structured heads win earliest.

Methodology: chained data-dependent iterations with inner fori_loop
amortising relay dispatch (see bench.py docstring).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from acmil_tpu.config import Config
from acmil_tpu.data.bags import Bag
from acmil_tpu.engine import get_family
from acmil_tpu.models import build_mil_model, fast

# measure the kernel at every N, not just past the production threshold
fast.FUSE_MIN_N = 0
fast.DTFD_FUSE_MIN_S = 0  # production default is OFF (measured negative)


def _chain_ms(step, x0, inner, k0=4, k1=24, reps=3):
    def chain(k):
        x, out = x0, None
        t0 = time.perf_counter()
        for _ in range(k):
            x, out = step(x)
        float(out.reshape(-1)[0])
        return time.perf_counter() - t0

    chain(2)
    per = [(chain(k1) - chain(k0)) / (k1 - k0) for _ in range(reps)]
    return float(np.median(per)) * 1e3 / inner


def bench_head(arch: str, n_pad: int, d: int = 384, inner: int = 32):
    conf = Config(n_class=2, D_feat=d, D_inner=128, arch=arch,
                  lr=1e-3, train_epoch=1)
    conf.extra["droprate"] = 0.0
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (1, n_pad, d), jnp.float32)
    mask = jnp.arange(n_pad)[None] < int(n_pad * 0.9)
    params = model.init({"params": rng}, feats, mask)["params"]
    bag = Bag(feats=feats, mask=mask,
              coords=jnp.zeros((1, n_pad, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))

    import inspect

    eval_kw = {}
    if "model" in inspect.signature(fam.eval_outputs).parameters:
        eval_kw["model"] = model

    results = {}
    for fused in (True, False):
        @jax.jit
        def step(f, fused=fused):
            def body(_, carry):
                f, _o = carry
                out = fam.eval_outputs(model.apply, params,
                                       bag.replace(feats=f), fused=fused,
                                       **eval_kw)
                probs = fam.probs(out)
                return f * (1.0 + 0.0 * probs[0, 0]), probs

            return jax.lax.fori_loop(
                0, inner, body, (f, jnp.zeros((1, 2), f.dtype)))

        ms = _chain_ms(step, feats, inner)
        results[fused] = ms
        print(json.dumps({
            "metric": f"{arch}_eval_{'fused' if fused else 'xla'}_{n_pad}",
            "value": round(ms, 4), "unit": "ms/slide"}), flush=True)
    print(json.dumps({
        "metric": f"{arch}_fused_speedup_{n_pad}",
        "value": round(results[False] / results[True], 2),
        "unit": "x"}), flush=True)


def bench_train(arch: str, n_pad: int, d: int = 384, inner: int = 8):
    """Train-step (value_and_grad) fused vs unfused — family routing."""
    from acmil_tpu.engine.train import _conf_dict

    conf = Config(n_class=2, D_feat=d, D_inner=128, arch=arch,
                  lr=1e-3, train_epoch=1)
    conf.extra["droprate"] = 0.0
    model, fam_name = build_mil_model(conf)
    fam = get_family(fam_name)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (1, n_pad, d), jnp.float32)
    mask = jnp.arange(n_pad)[None] < int(n_pad * 0.9)
    params = model.init({"params": rng}, feats, mask)["params"]
    bag = Bag(feats=feats, mask=mask,
              coords=jnp.zeros((1, n_pad, 2), jnp.int32),
              label=jnp.zeros((1,), jnp.int32))
    valid = mask.any(axis=1)

    results = {}
    for fused in (True, False):
        conf.extra["fused_train"] = fused
        conf_d = _conf_dict(fam, conf)
        assert conf_d.get("fused", False) == fused

        def loss_fn(params, f):
            out = fam.train_outputs(model.apply, params,
                                    bag.replace(feats=f),
                                    {"stkim": rng, "dropout": rng}, conf_d)
            loss, _ = fam.loss(out, bag, valid, conf_d)
            return loss

        @jax.jit
        def step(f):
            def body(_, carry):
                f, _o = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, f)
                g0 = jax.tree_util.tree_leaves(grads)[0]
                return f * (1.0 + 0.0 * loss), loss[None, None] + 0.0 * g0.reshape(-1)[0]

            return jax.lax.fori_loop(
                0, inner, body, (f, jnp.zeros((1, 1), f.dtype)))

        ms = _chain_ms(step, feats, inner)
        results[fused] = ms
        print(json.dumps({
            "metric": f"{arch}_train_{'fused' if fused else 'xla'}_{n_pad}",
            "value": round(ms, 4), "unit": "ms/slide"}), flush=True)
    print(json.dumps({
        "metric": f"{arch}_train_fused_speedup_{n_pad}",
        "value": round(results[False] / results[True], 2),
        "unit": "x"}), flush=True)


def main():
    archs = sys.argv[1:] or ["clam_sb", "clam_mb", "dsmil", "dtfd"]
    for arch in archs:
        for n in (16384, 65536):
            bench_head(arch, n)
            if arch == "dtfd":
                bench_train(arch, n)


if __name__ == "__main__":
    main()
