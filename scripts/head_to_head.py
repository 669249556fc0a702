"""Head-to-head training parity: the ACTUAL torch reference vs acmil_tpu.

VERDICT r2 item 3: real Camelyon16 data cannot exist in this environment,
so the strongest obtainable protocol-parity evidence is running the
reference's own training scripts (`Step3_WSI_classification_ACMIL.py`
for abmil/acmil, `Step3_WSI_classification_DTFD.py` for the two-tier
two-optimizer protocol; CPU) and this repo's CLI on IDENTICAL synthetic
feature H5 + frozen split + config, and comparing best-epoch metrics.

The reference's missing deps (timm/torchmetrics/wandb/torchvision) are
satisfied by minimal shims (scripts/refshims) — the shims only cover
what the feature-bag training path touches.

Recipes: abmil, acmil (ACMIL script); dtfd (two-tier two-optimizer
script); clam, transmil, ilra, dsmil (generic script); mhim (the
two-stage MHIM protocol: pure pretrain -> teacher-init fc student).

Usage:
    python scripts/head_to_head.py [--work DIR] [--epochs N]
        [--recipes abmil,acmil] [--seeds 1,4]

Prints one JSON line per (recipe, framework, seed) and a summary table;
writes head_to_head.json into the work dir.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIMS = os.path.join(REPO, "scripts", "refshims")


def make_data(work: str, n_slides: int = 140, d: int = 384, seed: int = 0):
    """Synthetic separable-but-not-trivial WSI feature bags in the
    reference H5 schema (`Step2_feature_extract.py:164-167`): a per-slide
    random tumor fraction makes some positives easy and some hard, so
    trained models land at AUC ~0.85-0.98 where differences are visible
    (a fully separable task saturates both frameworks at 1.0)."""
    sys.path.insert(0, REPO)
    from acmil_tpu.data import write_feature_h5

    rs = np.random.RandomState(seed)
    slides = {}
    for i in range(n_slides):
        n = int(rs.randint(200, 1200))
        label = i % 2
        feats = rs.randn(n, d).astype(np.float32)
        if label:
            # graded difficulty: tumor fraction and shift vary per slide.
            # Fractions of 2-10% mirror Camelyon16 macro-tumors — enough
            # patches that STKIM (drop top-10) does not erase the
            # evidence, which the paper's recipe assumes.
            k = max(2, int(n * rs.uniform(0.02, 0.10)))
            idx = rs.choice(n, k, replace=False)
            shift = rs.uniform(2.2, 3.6)
            feats[idx] += shift * np.ones(d) / np.sqrt(d)
        name = f"{'test_' if i >= int(n_slides * 0.7) else ''}slide_{i:03d}"
        slides[name] = {"feat": feats,
                        "coords": rs.randint(0, 50000, size=(n, 2)),
                        "label": label}
    os.makedirs(f"{work}/data", exist_ok=True)
    write_feature_h5(f"{work}/data/patch_feats_pretrain_medical_ssl.h5",
                     slides)
    return slides, sorted(slides)


def make_data_spatial(work: str, n_slides: int = 140, d: int = 384,
                      seed: int = 0, frac=(0.20, 0.45), mag=(3.0, 4.0),
                      core_k: int = 5, core_mag: float = 8.0):
    """Spatially-structured corpus for the heads whose inductive bias the
    default task cannot reward (VERDICT r4 'what's weak' #1): on the
    mean-shift task with i.i.d. tumor indices both frameworks' TransMIL
    and DSMIL sit at chance, so their head-to-head was parity-of-failure.

    Structure (per slide):
    - patches on a raster-scan grid (row-major coords, 512px pitch) —
      the order Step1/Step2 produce on real WSIs, which is what makes
      TransMIL's sequence->square-grid reshape + PPEG convs
      (`architecture/transMIL.py:60-91`) see 2-D tumor blobs as
      contiguous runs;
    - a smooth low-rank background field shared by neighbouring patches
      (8x8-cell latent), so local context carries information;
    - ONE elliptical lesion blob per slide covering ``frac`` of the
      patches (defaults 20-45% — Camelyon macro-metastases reach this
      range, and the r5 sweep showed the torch heads need it to learn
      within the reference's epoch budget):
      tumor direction u on positive slides, an equally-strong benign
      direction v (u.v=0) on negatives — presence of *an* outlier blob
      is uninformative, its TYPE must be classified (so DSMIL's
      critical-instance head `architecture/dsmil.py:62-85` has to rank
      instances by class evidence, not by norm);
    - the blob-core patches get an 8-sigma shift (above the
      max-order-statistic of ~1k Gaussian patches), giving the
      instance-level max a real critical instance to find.

    Default knobs are the r5 sweep's operating point (v2,
    /root/h2h_sweep): the TORCH reference reaches test AUC 0.99
    (transmil) / 0.86 (dsmil) at 30 epochs lr 2e-4, so the head-to-head
    finally measures both heads where the reference actually learns
    (the r4 comparison sat at chance on the default task).
    """
    sys.path.insert(0, REPO)
    from acmil_tpu.data import write_feature_h5

    rs = np.random.RandomState(seed)
    u = np.ones(d) / np.sqrt(d)
    v = np.tile([1.0, -1.0], d // 2) / np.sqrt(d)  # orthogonal to u
    slides = {}
    for i in range(n_slides):
        n = int(rs.randint(300, 1000))
        g = int(np.ceil(np.sqrt(n)))
        label = i % 2
        rows, cols = np.divmod(np.arange(n), g)        # raster order
        coords = np.stack([cols * 512, rows * 512], axis=-1)
        feats = rs.randn(n, d).astype(np.float32)
        # smooth background: one 8-dim latent per 8x8-patch cell
        cell = (rows // 8) * ((g + 7) // 8) + (cols // 8)
        lat = rs.randn(int(cell.max()) + 1, 8) @ rs.randn(8, d) / np.sqrt(8)
        feats += 0.7 * lat[cell].astype(np.float32)
        # one elliptical blob; direction decides the label
        f = rs.uniform(*frac)
        rad = np.sqrt(f * n / np.pi)
        cy, cx = rs.uniform(rad, g - rad, size=2)
        ecc = rs.uniform(0.6, 1.6)
        dist2 = ((rows - cy) * ecc) ** 2 + ((cols - cx) / ecc) ** 2
        blob = dist2 < rad ** 2
        direction = u if label else v
        m = rs.uniform(*mag, size=n)
        core = np.argsort(dist2)[:core_k]
        m[core] = core_mag
        feats[blob] += (m[blob, None] * direction[None, :]).astype(
            np.float32)
        name = f"{'test_' if i >= int(n_slides * 0.7) else ''}slide_{i:03d}"
        slides[name] = {"feat": feats, "coords": coords, "label": label}
    os.makedirs(f"{work}/data", exist_ok=True)
    write_feature_h5(f"{work}/data/patch_feats_pretrain_medical_ssl.h5",
                     slides)
    return slides, sorted(slides)


def write_split(work: str, names, seed: int):
    test_names = [n for n in names if n.startswith("test_")]
    rest = [n for n in names if not n.startswith("test_")]
    rs = np.random.RandomState(1234)
    rs.shuffle(rest)
    n_val = max(len(rest) // 5, 3)
    split = {"train_names": rest[n_val:], "val_names": rest[:n_val],
             "test_names": test_names}
    os.makedirs(f"{work}/splits/camelyon", exist_ok=True)
    with open(f"{work}/splits/camelyon/split_{seed}.json", "w") as f:
        json.dump(split, f)


def write_config(work: str, epochs: int, lr: float = 1e-4) -> str:
    cfg = f"""
dataset: camelyon
n_class: 2
pretrain: medical_ssl
D_feat: 384
D_inner: 128
lr: {lr}
min_lr: 0.000001
wd: 0.00001
train_epoch: {epochs}
warmup_epoch: 2
B: 1
n_worker: 0
pin_memory: false
n_shot: -1
n_token: 1
data_dir: {work}/data
split_dir: {work}/splits
wandb_mode: disabled
min_bucket: 2048
feat_d: 384
patch_size: 512
"""
    path = f"{work}/cfg.yml"
    with open(path, "w") as f:
        f.write(cfg)
    return path


RECIPES = {
    # recipe -> (reference script, reference CLI flags, our-side YAML
    # overrides). abmil/acmil are the ACMIL script's arch=ga with
    # n_token/n_masked_patch/mask_drop (reference README.md:51-58);
    # dtfd exercises the reference's SEPARATE two-tier two-optimizer
    # protocol (`Step3_WSI_classification_DTFD.py:131-148`).
    # selection_f1 matches each reference script's best-epoch rule: the
    # ACMIL/DTFD/MHIM scripts rely on torchmetrics' default micro-F1
    # (≡ accuracy for single-label), the generic trainer passes
    # average='macro' (`engine.py:213`) — see engine/train.py::is_better.
    "abmil": ("Step3_WSI_classification_ACMIL.py",
              ["--arch", "ga", "--n_token", "1", "--n_masked_patch", "0",
               "--mask_drop", "0.0"],
              {"arch": "ga", "n_token": 1, "n_masked_patch": 0,
               "mask_drop": 0.0, "selection_f1": "micro"}),
    "acmil": ("Step3_WSI_classification_ACMIL.py",
              ["--arch", "ga", "--n_token", "5", "--n_masked_patch", "10",
               "--mask_drop", "0.6"],
              {"arch": "ga", "n_token": 5, "n_masked_patch": 10,
               "mask_drop": 0.6, "selection_f1": "micro"}),
    "dtfd": ("Step3_WSI_classification_DTFD.py",
             ["--numGroup", "4", "--total_instance", "4"],
             {"arch": "dtfd", "numGroup": 4, "total_instance": 4,
              "grad_clipping": 5, "selection_f1": "micro"}),
    # generic script, CLAM_SB with the instance-clustering loss active
    # (w_loss 0.7: `engine.py:101` total = w*bag + (1-w)*instance; the
    # script's CLI default 1.0 would disable the instance term)
    "clam": ("Step3_WSI_classification.py",
             ["--arch", "clam_sb", "--w_loss", "0.7"],
             {"arch": "clam_sb", "w_loss": 0.7}),
    # generic script, plain-CE recipes (`Step3_WSI_classification.py:118-144`):
    # transmil exercises the Nystrom/PPEG stack (and, on the reference
    # side, the wrap-pad semantics — `architecture/transMIL.py:63-66`),
    # ilra the iterative low-rank attention blocks (ILRA(..., ln=True)),
    # dsmil the dual-stream 0.5*max-instance + 0.5*bag CE
    # (`engine.py:41-47`, mirrored by our dsmil family). NOTE: the
    # reference's dsmil branch also reads conf.n_token for a diversity
    # term (`engine.py:51-54`) that no stock config defines — the base
    # config here sets n_token: 1, which empties that loop on both
    # sides (the generic script's argparse has no --n_token flag).
    # min_bucket 256 (vs the shared 2048): the torch reference runs
    # each bag at its natural length, while a 2048 floor pads every
    # 200-1200-patch bag to 2048 Nystrom tokens — pure CPU waste on the
    # h2h box (padding is mask-inert; tests/test_model_zoo.py). Buckets
    # then track bag length like the reference does.
    "transmil": ("Step3_WSI_classification.py", ["--arch", "transmil"],
                 {"arch": "transmil", "min_bucket": 256}),
    "ilra": ("Step3_WSI_classification.py", ["--arch", "ilra"],
             {"arch": "ilra"}),
    "dsmil": ("Step3_WSI_classification.py", ["--arch", "dsmil"],
              {"arch": "dsmil"}),
    # remaining generic-trainer archs (`Step3_WSI_classification.py:120-146`):
    # mha = the single-query MutiHeadAttention baseline
    # (`architecture/transformer.py:86` — our registry calls it
    # mha_single; our 'mha' is the ACMIL script's ACMIL_MHA), mean/max
    # the modules/mean_max.py heads, bmil_spvis the variational-dropout
    # spatial head whose KL terms ride the engine's bmil loss branch
    # (`engine.py:66-98`). min_bucket 256 for bmil_spvis for the same
    # CPU-waste reason as transmil (its grid scatter + VDO layers run
    # per padded row).
    "mha": ("Step3_WSI_classification.py", ["--arch", "mha"],
            {"arch": "mha_single"}),
    "meanmil": ("Step3_WSI_classification.py", ["--arch", "meanmil"],
                {"arch": "meanmil"}),
    "maxmil": ("Step3_WSI_classification.py", ["--arch", "maxmil"],
               {"arch": "maxmil"}),
    "bmil_spvis": ("Step3_WSI_classification.py", ["--arch", "bmil_spvis"],
                   {"arch": "bmil_spvis", "min_bucket": 256}),
    # two-phase IBMIL protocol (`Step3_WSI_classification_IBMIL.py` +
    # `IBMIL_clustering.py`): phase-1 plain attention train, k=8
    # confounder dictionary over train bag features, phase-2 retrain
    # with --c_path. Handled by run_*_ibmil below.
    "ibmil": (None, None, None),
    # cross-framework teacher hand-off: torch stage-A 'pure' checkpoint
    # imported via scripts/import_torch_checkpoint.py seeds OUR student;
    # the torch side trains its student from the SAME teacher weights,
    # making the pair share the strongest possible common starting point.
    "mhim_xt": (None, None, None),
    # two-stage MHIM protocol (`Step3_WSI_classification_MHIM.py`):
    # stage A pretrains the 'pure' baseline, stage B trains the MHIM
    # student with the stage-A best checkpoint as teacher and
    # init_stu_type=fc (`Step3_MHIM:340-375`). Both stages use the
    # script's coupled-L2 Adam (`Step3_MHIM:380`). Handled by
    # run_*_mhim below, not the generic runners.
    "mhim": (None, None, None),
}

# reference MHIM-script CLI defaults the h2h relies on
# (`Step3_MHIM:24-54`): baseline attn, masking h=0.1/hr=0.5, losses
# cls_alpha=1.0 cl_alpha=0.1, teacher temp 0.1, EMA mm=0.9999. Our side
# mirrors them explicitly (our module defaults differ where the
# reference class defaults differ from its CLI defaults).
MHIM_OURS_SHARED = {"baseline": "attn", "mlp_dim": 128, "dropout": 0.25,
                    "selection_f1": "micro"}
MHIM_OURS_STAGE_B = {"arch": "mhim", "mask_ratio": 0.0, "mask_ratio_l": 0.0,
                     "mask_ratio_h": 0.1, "mask_ratio_hr": 0.5,
                     "cls_alpha": 1.0, "cl_alpha": 0.1, "temp_t": 0.1,
                     "mm": 0.9999, "init_stu_type": "fc"}


def _run_ref_script(work: str, cfg: str, seed: int, script: str,
                    flags: list, shim_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([SHIMS, REF])
    env["WANDB_SHIM_DIR"] = shim_dir
    env["HDF5_USE_FILE_LOCKING"] = "FALSE"
    cmd = [sys.executable, f"{REF}/{script}",
           "--config", cfg, "--seed", str(seed),
           "--pretrain", "medical_ssl"] + flags
    out = subprocess.run(cmd, cwd=work, env=env, capture_output=True,
                         text=True, timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-4000:]}")
    # parse the final "Results on best epoch:" dict
    lines = out.stdout.strip().splitlines()
    for i, l in enumerate(lines):
        if l.startswith("Results on best epoch"):
            best = ast.literal_eval(lines[i + 1])
            return {"val_auc": best["val_auc"], "val_f1": best["val_f1"],
                    "val_acc": best["val_acc"] / 100.0,
                    "test_auc": best["test_auc"], "test_f1": best["test_f1"],
                    "test_acc": best["test_acc"] / 100.0,
                    "epoch": best["epoch"]}
    raise RuntimeError(f"no best-epoch line in reference stdout:\n"
                       f"{out.stdout[-2000:]}")


def run_reference(work: str, cfg: str, recipe: str, seed: int) -> dict:
    if recipe == "mhim":
        return run_reference_mhim(work, cfg, seed)
    if recipe == "mhim_xt":
        return run_reference_mhim_xt(work, cfg, seed)
    if recipe == "ibmil":
        return run_reference_ibmil(work, cfg, seed)
    script, ref_flags, _ = RECIPES[recipe]
    return _run_ref_script(work, cfg, seed, script, ref_flags,
                           shim_dir=f"{work}/ref_{recipe}_s{seed}")


def run_reference_ibmil(work: str, cfg: str, seed: int) -> dict:
    """Drive the reference's full two-phase IBMIL protocol. Phase 1:
    `Step3_WSI_classification_IBMIL.py` without --c_path (plain gated
    attention, `:157,211`). Clustering: `IBMIL_clustering.py` loads the
    phase-1 best checkpoint from the CWD-relative path it hardcodes
    (`./saved_models/ds_{dataset}_{pretrain}_arch_ibmil/{seed}/`,
    `IBMIL_clustering.py:192-195`), forwards the train split, and saves
    the k=8 centroid dictionary under `./datasets_deconf/` (`:140-145`);
    its faiss GPU k-means runs on the numpy shim (refshims/faiss).
    Phase 2: same script with --c_path, which resolves the npy by the
    naming convention at `Step3_IBMIL:70-71`. The phase-2 best-epoch
    metrics are the protocol's result."""
    root1 = f"{work}/ref_ibmil1_s{seed}"
    _run_ref_script(work, cfg, seed, "Step3_WSI_classification_IBMIL.py",
                    [], shim_dir=f"{root1}/run")
    ckpt = f"{root1}/saved_models/checkpoint-best.pth"
    if not os.path.exists(ckpt):
        raise RuntimeError(f"phase-1 IBMIL checkpoint missing: {ckpt}")
    dst = f"{work}/saved_models/ds_camelyon_medical_ssl_arch_ibmil/{seed}"
    os.makedirs(dst, exist_ok=True)
    shutil.copyfile(ckpt, f"{dst}/checkpoint-best.pth")

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([SHIMS, REF])
    env["HDF5_USE_FILE_LOCKING"] = "FALSE"
    out = subprocess.run(
        [sys.executable, f"{REF}/IBMIL_clustering.py",
         "--config", cfg, "--seed", str(seed)],
        cwd=work, env=env, capture_output=True, text=True, timeout=3600)
    npy = (f"{work}/datasets_deconf/camelyon/train_bag_cls_agnostic_feats_"
           f"proto_8_pretrain_medical_ssl_seed_{seed}.npy")
    if out.returncode != 0 or not os.path.exists(npy):
        raise RuntimeError(f"reference IBMIL clustering failed:\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-4000:]}")
    return _run_ref_script(work, cfg, seed,
                           "Step3_WSI_classification_IBMIL.py", ["--c_path"],
                           shim_dir=f"{work}/ref_ibmil2_s{seed}/run")


def run_reference_mhim(work: str, cfg: str, seed: int) -> dict:
    """Stage A: `--model pure` pretrain (best ckpt lands in the per-run
    saved_models dir the script derives from wandb's run dir,
    `Step3_MHIM:262-264`). Stage B: `--model mhim --init_stu_type fc`
    with the stage-A checkpoint as teacher. The stage-B best-epoch
    metrics are the protocol's result (the reference evaluates the
    STUDENT each epoch, `Step3_MHIM:392-394`)."""
    pure_root = f"{work}/ref_mhimpure_s{seed}"
    _run_ref_script(work, cfg, seed, "Step3_WSI_classification_MHIM.py",
                    ["--model", "pure"], shim_dir=f"{pure_root}/run")
    ckpt = f"{pure_root}/saved_models/checkpoint-best.pth"
    if not os.path.exists(ckpt):
        raise RuntimeError(f"stage-A pure checkpoint missing: {ckpt}")
    return _run_ref_script(
        work, cfg, seed, "Step3_WSI_classification_MHIM.py",
        ["--model", "mhim", "--teacher_init", ckpt,
         "--init_stu_type", "fc"],
        shim_dir=f"{work}/ref_mhim_s{seed}/run")


def run_reference_mhim_xt(work: str, cfg: str, seed: int) -> dict:
    """Stage-B student re-run from the work dir's EXISTING torch stage-A
    teacher (trained by a prior `mhim` invocation, or trained here if
    absent) — the torch half of the shared-teacher pair."""
    pure_root = f"{work}/ref_mhimpure_s{seed}"
    ckpt = f"{pure_root}/saved_models/checkpoint-best.pth"
    if not os.path.exists(ckpt):
        _run_ref_script(work, cfg, seed, "Step3_WSI_classification_MHIM.py",
                        ["--model", "pure"], shim_dir=f"{pure_root}/run")
    return _run_ref_script(
        work, cfg, seed, "Step3_WSI_classification_MHIM.py",
        ["--model", "mhim", "--teacher_init", ckpt,
         "--init_stu_type", "fc"],
        shim_dir=f"{work}/ref_mhimxt_s{seed}/run")


def run_ours_mhim_xt(work: str, cfg: str, seed: int,
                     platform: str | None = None) -> dict:
    """Our student seeded from the IMPORTED torch stage-A teacher
    (scripts/import_torch_checkpoint.py --arch pure -> cli teacher_init,
    `Step3_MHIM:340-375` semantics) — the interop the importer exists
    for. Requires the torch side to have run first (resume order in
    main() guarantees it)."""
    ckpt = f"{work}/ref_mhimpure_s{seed}/saved_models/checkpoint-best.pth"
    if not os.path.exists(ckpt):
        raise RuntimeError(f"torch stage-A teacher missing: {ckpt}")
    imported = f"{work}/imported_pure_s{seed}"
    icfg = f"{work}/cfg_import_pure.yml"
    with open(cfg) as f:
        base = f.read()
    with open(icfg, "w") as f:
        f.write(base + "\narch: pure\n" + "".join(
            f"{k}: {v}\n" for k, v in MHIM_OURS_SHARED.items()))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"       # translation needs no TPU
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, "/root/.axon_site", env.get("PYTHONPATH", "")])
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/import_torch_checkpoint.py",
         "--ckpt", ckpt, "--out", imported, "--arch", "pure",
         "--config", icfg],
        cwd=work, env=env, capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"teacher import failed:\n{out.stdout[-1500:]}\n"
                           f"{out.stderr[-3000:]}")
    overrides = {**MHIM_OURS_SHARED, **MHIM_OURS_STAGE_B,
                 "teacher_init": imported}
    return _run_ours_cli(work, cfg, overrides, f"cfg_mhimxt_s{seed}", seed,
                         f"{work}/ours_mhimxt_s{seed}", platform)


def _run_ours_cli(work: str, cfg: str, overrides: dict, cfg_name: str,
                  seed: int, ckpt_dir: str,
                  platform: str | None = None) -> dict:
    env = dict(os.environ)
    if platform == "cpu":
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        # the fused Pallas pooling only interprets (slowly) off-TPU; the
        # unfused graph is step-equivalent (test_attn_pool.py fused↔unfused
        # equality tests), so CPU h2h runs train on it
        overrides = {**overrides, "fused_train": False}
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, "/root/.axon_site", env.get("PYTHONPATH", "")])
    # recipe hyperparams ride via a YAML-override file
    cfg2 = f"{work}/{cfg_name}.yml"
    with open(cfg) as f:
        base = f.read()
    with open(cfg2, "w") as f:
        f.write(base + "".join(f"\n{k}: {v}" for k, v in overrides.items())
                + "\n")
    code = f"""
import json, sys
sys.path.insert(0, {REPO!r})
from acmil_tpu.cli.train import main
best = main(["--config", {cfg2!r}, "--seed", "{seed}",
             "--ckpt_dir", {ckpt_dir!r},
             "--scan_epoch"])
print("H2H_RESULT " + json.dumps(best))
"""
    out = subprocess.run([sys.executable, "-c", code], cwd=work, env=env,
                         capture_output=True, text=True, timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(f"our run failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-4000:]}")
    for l in out.stdout.splitlines():
        if l.startswith("H2H_RESULT "):
            best = json.loads(l[len("H2H_RESULT "):])
            return {"val_auc": best["auc"], "val_f1": best["f1"],
                    "val_acc": best["acc"], "test_auc": best["test_auc"],
                    "test_f1": best["test_f1"], "test_acc": best["test_acc"],
                    "epoch": best["epoch"]}
    raise RuntimeError(f"no result line in our stdout:\n{out.stdout[-2000:]}")


def run_ours(work: str, cfg: str, recipe: str, seed: int,
             platform: str | None = None) -> dict:
    if recipe == "mhim":
        return run_ours_mhim(work, cfg, seed, platform)
    if recipe == "mhim_xt":
        return run_ours_mhim_xt(work, cfg, seed, platform)
    if recipe == "ibmil":
        return run_ours_ibmil(work, cfg, seed, platform)
    _, _, overrides = RECIPES[recipe]
    return _run_ours_cli(work, cfg, overrides, f"cfg_{recipe}", seed,
                         f"{work}/ours_{recipe}_s{seed}", platform)


def run_ours_ibmil(work: str, cfg: str, seed: int,
                   platform: str | None = None) -> dict:
    """Mirror of run_reference_ibmil through our CLI: phase-1 arch=ibmil
    train, our `IBMIL_clustering.py` (XLA Lloyd k-means, seed 66 like the
    reference's `reduce`, `IBMIL_clustering.py:128`), phase-2 with
    `c_path` pointing at the saved prototypes. selection_f1=micro: the
    IBMIL script uses torchmetrics' default like ACMIL
    (`Step3_IBMIL:246`)."""
    p1 = f"{work}/ours_ibmil1_s{seed}"
    base = {"arch": "ibmil", "selection_f1": "micro"}
    _run_ours_cli(work, cfg, base, "cfg_ibmil1", seed, p1, platform)

    env = dict(os.environ)
    if platform == "cpu":
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, "/root/.axon_site", env.get("PYTHONPATH", "")])
    deconf = f"{work}/ours_deconf_s{seed}"
    out = subprocess.run(
        [sys.executable, f"{REPO}/IBMIL_clustering.py",
         "--config", f"{work}/cfg_ibmil1.yml", "--ckpt_dir", p1,
         "--out_dir", deconf],
        cwd=work, env=env, capture_output=True, text=True, timeout=3600)
    npy = (f"{deconf}/camelyon/train_bag_cls_agnostic_feats_proto_8_"
           f"pretrain_medical_ssl_seed_{seed}.npy")
    if out.returncode != 0 or not os.path.exists(npy):
        raise RuntimeError(f"our IBMIL clustering failed:\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-4000:]}")
    return _run_ours_cli(work, cfg, {**base, "c_path": [npy]},
                         f"cfg_ibmil2_s{seed}", seed,
                         f"{work}/ours_ibmil2_s{seed}", platform)


def run_ours_mhim(work: str, cfg: str, seed: int,
                  platform: str | None = None) -> dict:
    """Mirror of run_reference_mhim through our CLI: 'pure' pretrain,
    then arch=mhim with teacher_init pointing at the stage-A checkpoint
    dir and init_stu_type=fc (cli/train.py::init_teacher_student)."""
    pure_ckpt = f"{work}/ours_mhimpure_s{seed}"
    _run_ours_cli(work, cfg, {"arch": "pure", **MHIM_OURS_SHARED},
                  "cfg_mhimpure", seed, pure_ckpt, platform)
    overrides = {**MHIM_OURS_SHARED, **MHIM_OURS_STAGE_B,
                 "teacher_init": pure_ckpt}
    return _run_ours_cli(work, cfg, overrides, f"cfg_mhim_s{seed}", seed,
                         f"{work}/ours_mhim_s{seed}", platform)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/head_to_head")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="shared optimizer lr written into the matched "
                         "config (part of the resume key: re-invoking an "
                         "existing --work with a new lr re-runs)")
    ap.add_argument("--recipes", default="abmil,acmil")
    ap.add_argument("--seeds", default="1,4")
    ap.add_argument("--ours-platform", default=None,
                    help="force 'cpu' for our runs (default: real TPU)")
    ap.add_argument("--task", default="default",
                    choices=("default", "spatial"),
                    help="synthetic corpus: 'default' (i.i.d. mean-shift "
                         "tumor) or 'spatial' (raster-grid lesion blobs "
                         "for transmil/dsmil; use a separate --work)")
    args = ap.parse_args()

    work = os.path.abspath(args.work)
    os.makedirs(work, exist_ok=True)
    make = make_data_spatial if args.task == "spatial" else make_data
    slides, names = make(work)
    seeds = [int(s) for s in args.seeds.split(",")]
    for s in seeds:
        write_split(work, names, s)
    cfg = write_config(work, args.epochs, args.lr)

    # resumable: completed runs live in head_to_head.jsonl and are
    # skipped. The key includes epochs AND lr so a re-invocation with a
    # different budget or learning rate re-runs instead of mixing stale
    # rows into the parity table; rows from other (epochs, lr) settings
    # are kept in the log but excluded from this invocation's summary.
    # (lr is None in pre-r4 rows, which ran at the 1e-4 default — treat
    # those as 1e-4 so old logs keep resuming.)
    log = f"{work}/head_to_head.jsonl"
    prior = []
    if os.path.exists(log):
        with open(log) as f:
            prior = [json.loads(l) for l in f if l.strip()]
    done = {(r["recipe"], r["seed"], r["framework"], r.get("epochs"),
             r.get("lr", 1e-4) or 1e-4, r.get("task", "default"))
            for r in prior}
    results = [r for r in prior if r.get("epochs") == args.epochs
               and (r.get("lr", 1e-4) or 1e-4) == args.lr
               and r.get("task", "default") == args.task]

    def record(r):
        results.append(r)
        with open(log, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)

    for recipe in args.recipes.split(","):
        for seed in seeds:
            if (recipe, seed, "torch-reference", args.epochs,
                    args.lr, args.task) not in done:
                ref = run_reference(work, cfg, recipe, seed)
                ref.update(recipe=recipe, seed=seed, epochs=args.epochs,
                           lr=args.lr, task=args.task,
                           framework="torch-reference")
                record(ref)
            if (recipe, seed, "acmil_tpu", args.epochs, args.lr,
                    args.task) not in done:
                ours = run_ours(work, cfg, recipe, seed,
                                platform=args.ours_platform)
                ours.update(recipe=recipe, seed=seed, epochs=args.epochs,
                            lr=args.lr, task=args.task,
                            framework="acmil_tpu")
                record(ours)

    with open(f"{work}/head_to_head.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n{'recipe':8} {'seed':4} {'framework':16} "
          f"{'val_auc':8} {'test_auc':8} {'test_f1':8}")
    for r in results:
        print(f"{r['recipe']:8} {r['seed']:<4} {r['framework']:16} "
              f"{r['val_auc']:<8.4f} {r['test_auc']:<8.4f} "
              f"{r['test_f1']:<8.4f}")


if __name__ == "__main__":
    main()
