"""Shared Step3 training driver.

The reference splits training across five near-identical scripts
(`Step3_WSI_classification{,_ACMIL,_DTFD,_IBMIL,_MHIM}.py`) that differ in
model construction and loss wiring; here those differences live in the
model registry + family protocol, and this one driver provides the whole
Step3 surface: YAML+CLI config, dataset/loader setup, per-epoch train +
val/test eval, wandb-compatible logging, best/last checkpoints on
val F1+AUC, and optional data-parallel mesh.
"""

from __future__ import annotations

import argparse
import os
from pprint import pprint

import jax
import numpy as np

from acmil_tpu.config import Config
from acmil_tpu.data import BagLoader, build_hdf5_feat_dataset
from acmil_tpu.engine import (create_train_state, evaluate, evaluate_scanned,
                              family_supports_scan, get_family,
                              make_eval_step, make_scan_eval_step,
                              make_scan_train_step, make_train_step,
                              train_one_epoch, train_one_epoch_scanned)
from acmil_tpu.engine.checkpoint import CheckpointManager, save_best_and_last
from acmil_tpu.models import build_mil_model
from acmil_tpu.utils import MetricLogger, MetricsWriter, set_seed


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, required=True, help="YAML config")
    p.add_argument("--seed", type=int, default=None)
    # default=None everywhere below: a non-None argparse default would
    # clobber the YAML value in load_conf's merge (Config supplies the
    # real defaults)
    p.add_argument("--wandb_mode", default=None,
                   choices=["offline", "online", "disabled"])
    p.add_argument("--arch", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--min_bucket", type=int, default=None)
    p.add_argument("--max_patches", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--train_epoch", type=int, default=None)
    p.add_argument("--B", type=int, default=None)
    p.add_argument("--n_shot", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel devices (0 = single device)")
    p.add_argument("--pod", action="store_true",
                   help="multi-host pod: jax.distributed.initialize() then "
                        "a DCN x ICI (data, seq) mesh over all processes "
                        "(parallel/mesh.py::make_pod_mesh)")
    p.add_argument("--scan_epoch", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="drive epochs with lax.scan over device-resident "
                        "shape groups: one dispatch per group instead of "
                        "one per bag (bags must fit HBM; on a mesh the "
                        "groups shard over the data axis). NOTE: the "
                        "shuffle is bucket-blocked — bags of one pad "
                        "bucket train contiguously each epoch, a "
                        "curriculum-like length-position correlation the "
                        "per-bag loop does not have (BENCH_NOTES.md)")
    p.add_argument("--resume", action="store_true",
                   help="resume from checkpoint-last in ckpt_dir (full "
                        "optimizer state; the reference saved but never "
                        "reloaded it)")
    p.add_argument("--eval_only", "--eval-only", action="store_true",
                   help="skip training; evaluate checkpoint-best on val+test")
    return p


def load_conf(args) -> Config:
    overrides = {k: v for k, v in vars(args).items()
                 if k != "config" and v is not None}
    conf = Config.from_yaml(args.config, overrides)
    return conf


def init_teacher_student(state, conf):
    """MHIM teacher initialisation from a pretrained 'pure' checkpoint
    (`Step3_MHIM:340-375`: teacher_init + init_stu_type none|fc|all).

    'fc' copies only the input projection into the student
    (`Step3_MHIM:358-375` loads just model.patch_to_emb); 'all' copies
    every matching parameter; 'none' leaves the fresh student untouched.
    """
    teacher_init = getattr(conf, "teacher_init", "")
    if not (teacher_init and hasattr(state, "teacher_params")):
        return state
    import jax.numpy as jnp

    tmgr = CheckpointManager(teacher_init)
    tag = "best" if tmgr.exists("best") else "last"
    raw = tmgr.restore_raw(tag)
    loaded_params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
    state = state.replace(teacher_params=loaded_params)
    stu_type = str(getattr(conf, "init_stu_type", "none"))
    if stu_type == "all":
        state = state.replace(params=loaded_params)
    elif stu_type == "fc":
        params = dict(state.params)
        params["patch_to_emb"] = loaded_params["patch_to_emb"]
        state = state.replace(params=params)
    elif stu_type != "none":
        raise ValueError(f"init_stu_type must be none|fc|all, got {stu_type!r}")
    print(f"teacher initialised from {teacher_init} ({tag}), "
          f"student init: {stu_type}")
    return state


def run_training(conf: Config, extra_config: dict | None = None) -> dict:
    set_seed(conf.seed)
    writer = MetricsWriter(mode=conf.wandb_mode, log_dir=conf.log_dir,
                           config={**conf.to_dict(), **(extra_config or {})})
    print("Used config:")
    pprint(conf.to_dict())

    feat_path = os.path.join(
        conf.data_dir, f"patch_feats_pretrain_{conf.pretrain}.h5")
    train_src, val_src, test_src = build_hdf5_feat_dataset(feat_path, conf)

    mesh = None
    if bool(getattr(conf, "pod", False)):
        from acmil_tpu.parallel import init_distributed, make_pod_mesh

        init_distributed()
        mesh = make_pod_mesh(seq=1)
    elif getattr(conf, "mesh_data", 0):
        from acmil_tpu.parallel import make_mesh

        mesh = make_mesh(data=int(conf.mesh_data), seq=1)
    elif getattr(conf, "mesh_shape", None):
        from acmil_tpu.parallel import make_mesh

        mesh = make_mesh(data=int(conf.mesh_shape.get("data", 1)),
                         seq=int(conf.mesh_shape.get("seq", 1)))

    # fp16 on the wire (features are stored fp16 anyway); eval loaders keep
    # their batches resident on device across epochs
    kw = dict(min_bucket=conf.min_bucket, max_patches=conf.max_patches,
              mesh=mesh, dtype=np.float16)
    # Train bags cache on device too when they fit comfortably in HBM:
    # re-transferring every bag each epoch through the host link costs
    # ~40s/epoch at Camelyon16 scale vs <1s of actual compute
    # (BENCH_NOTES.md). With B=1 (the reference protocol) replaying cached
    # single-bag batches in a fresh random order IS shuffled training;
    # with B>1 batch composition would freeze, so it stays off unless
    # forced via cache_train.
    # size by PADDED bucket lengths — cached bags live on device at their
    # bucketed shape (up to 2x the raw length), so raw bytes under-count
    from acmil_tpu.data.bags import bucket_length

    feat_bytes = sum(
        bucket_length(n, conf.min_bucket, conf.max_patches)
        for n in train_src.lengths()) * conf.D_feat * 2
    # model first: the cache decision below needs to know whether this
    # family can actually take the scan-epoch path (mesh passes heads
    # with shard_map'd internals their mesh, e.g. TransMIL's seq-sharded
    # Nystrom)
    model, family = build_mil_model(conf, mesh=mesh)
    fam = get_family(family)
    # mesh runs: the cache shards over the data axis, so the HBM budget
    # scales with it; B>1 (frozen within-batch composition on replay) is
    # accepted ONLY where scan epochs will really run, where B = #data
    # shards by design — a family with a custom un-scannable step (no
    # make_step_body) falls back to the per-bag loop, where a frozen
    # B>1 cache would silently degrade shuffling
    n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    scan_supported = family_supports_scan(fam)
    cache_ok = conf.B == 1 or (
        mesh is not None and bool(getattr(conf, "scan_epoch", False))
        and scan_supported)
    cache_train = bool(conf.extra.get(
        "cache_train", cache_ok and feat_bytes < n_data * 6 * 2 ** 30))
    train_loader = BagLoader(train_src, conf.B, shuffle=True, drop_last=True,
                             seed=conf.seed, cache_device=cache_train, **kw)
    val_loader = BagLoader(val_src, conf.B, cache_device=True, **kw)
    test_loader = BagLoader(test_src, conf.B, cache_device=True, **kw)
    rng = jax.random.PRNGKey(conf.seed)
    steps_per_epoch = max(len(train_loader), 1)
    conf.extra.setdefault("steps_per_epoch", steps_per_epoch)
    example = next(iter(BagLoader(train_src, conf.B, **kw)))
    state = create_train_state(model, conf, rng, example, steps_per_epoch,
                               family=fam)
    if mesh is not None:
        from acmil_tpu.parallel import shard_params

        state = shard_params(state, mesh)

    fused_opt_in = bool(conf.extra.get("fused_train", True))
    if mesh is not None and fused_opt_in:
        # a bare pallas_call can't consume sharded operands, so mesh runs
        # route pooling through the shard_map'd fused kernel instead
        # (ops/attn_pool.py::sharded_gated_attn_pool_grad)
        print("fused_train: mesh run — pooling via the sharded fused kernel")
    train_step = make_train_step(model, conf, fam, mesh=mesh)
    # `fused_train: false` opts eval out of the fused kernels too — the
    # flag exists to bisect a suspected kernel bug, which must cover
    # val/test as well (code-review r3)
    eval_step = make_eval_step(model, fam, fused=fused_opt_in, mesh=mesh)

    # lax.scan epochs: one dispatch per shape group instead of one per bag
    # (per-bag dispatch dominates epoch time on relay-attached chips —
    # BENCH_NOTES.md). Requires device-resident train bags (sharded over
    # the data axis on a mesh); families with custom step structure
    # (MHIM) fall back.
    scan_train = scan_eval = None
    if bool(getattr(conf, "scan_epoch", False)):
        if not cache_train:
            print("scan_epoch: train bags are not device-cached (B>1, "
                  "cache_train: false, or features exceed the HBM gate); "
                  "using the per-bag loop")
        else:
            scan_train = make_scan_train_step(model, conf, fam, mesh=mesh)
            if scan_train is not None:
                scan_eval = make_scan_eval_step(model, fam,
                                                fused=fused_opt_in, mesh=mesh)
            else:
                print(f"scan_epoch: family '{family}' has a custom train "
                      "step; using the per-bag loop")

    def run_eval(params, loader):
        if scan_eval is not None:
            return evaluate_scanned(params, scan_eval, loader, conf.n_class)
        return evaluate(params, eval_step, loader, conf.n_class)

    state = init_teacher_student(state, conf)

    ckpt = CheckpointManager(conf.ckpt_dir)

    if bool(getattr(conf, "eval_only", False)):
        tag = "best" if ckpt.exists("best") else "last"
        state = ckpt.restore(tag, state)
        val_m = run_eval(state.params, val_loader)
        test_m = run_eval(state.params, test_loader)
        print(f"[eval-only, {tag}] val auc {val_m['auc']:.4f} "
              f"f1 {val_m['f1']:.4f} | test auc {test_m['auc']:.4f} "
              f"f1 {test_m['f1']:.4f}")
        writer.finish()
        out = dict(val_m)
        out.update({f"test_{k}": v for k, v in test_m.items()})
        return out

    best: dict = {}
    start_epoch = 0
    if bool(getattr(conf, "resume", False)) and ckpt.exists("last"):
        state = ckpt.restore("last", state)
        meta = ckpt.load_meta("last")
        start_epoch = int(meta.get("epoch", -1)) + 1
        if ckpt.exists("best"):
            # restore the best-so-far record too, or the first resumed
            # epoch would overwrite checkpoint-best with a worse model
            bmeta = ckpt.load_meta("best")
            best = dict(bmeta.get("metrics", {}))
            best["epoch"] = int(bmeta.get("epoch", -1))
        print(f"resumed from epoch {start_epoch - 1} "
              f"(step {int(state.step)}, best so far: {best or 'none'})")

    try:
        for epoch in range(start_epoch, conf.train_epoch):
            logger = MetricLogger()
            if scan_train is not None:
                state, stats = train_one_epoch_scanned(
                    state, scan_train, train_loader, rng, epoch, logger,
                    interleave=int(getattr(conf, "scan_interleave", 1)))
            else:
                state, stats = train_one_epoch(state, train_step, train_loader,
                                               rng, epoch, logger)
            if not np.isfinite(stats.get("loss", 0.0)):
                # failure detection: surface divergence instead of burning
                # the remaining epochs (reference has none, SURVEY §5.3)
                raise RuntimeError(
                    f"non-finite training loss at epoch {epoch}: {stats}")
            print(f"Epoch [{epoch}] {logger}")
            writer.log({f"train/{k}": v for k, v in stats.items()},
                       commit=False)

            val_m = run_eval(state.params, val_loader)
            test_m = run_eval(state.params, test_loader)
            print(f"  val  auc {val_m['auc']:.4f} acc {val_m['acc']:.4f} "
                  f"f1 {val_m['f1']:.4f} loss {val_m['loss']:.4f}")
            print(f"  test auc {test_m['auc']:.4f} acc {test_m['acc']:.4f} "
                  f"f1 {test_m['f1']:.4f} loss {test_m['loss']:.4f}")
            writer.log({f"perf/val_{k}": v for k, v in val_m.items()},
                       commit=False)
            writer.log({f"perf/test_{k}": v for k, v in test_m.items()})

            prev_best_epoch = best.get("epoch")
            best = save_best_and_last(ckpt, state, epoch, conf, val_m, best)
            if best.get("epoch") == epoch and prev_best_epoch != epoch:
                best.update({f"test_{k}": v for k, v in test_m.items()})
    finally:
        # commit the final async checkpoint even when training aborts
        # (non-finite loss, eval failure) — that checkpoint is exactly the
        # state needed to debug the abort (ADVICE r2)
        ckpt.wait()
    print("Results on best epoch:")
    print(best)
    writer.finish()
    return best


def main(argv=None, description="TPU WSI MIL training", defaults=None):
    parser = base_parser(description)
    if defaults:
        parser.set_defaults(**defaults)
    args = parser.parse_args(argv)
    conf = load_conf(args)
    return run_training(conf)


if __name__ == "__main__":
    main()
