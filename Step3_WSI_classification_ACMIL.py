#!/usr/bin/env python
"""Step3 — ACMIL training (flagship entry point).

CLI surface mirrors the reference `Step3_WSI_classification_ACMIL.py`
(README.md:50-58 run commands work unchanged):

    python Step3_WSI_classification_ACMIL.py --config config/camelyon_medical_ssl_config.yml \
        --arch ga --n_token 5 --n_masked_patch 10 --mask_drop 0.6 --seed 4
"""

from acmil_tpu.cli.train import base_parser, load_conf, run_training


def main():
    p = base_parser("ACMIL WSI classification (TPU)")
    p.add_argument("--n_token", type=int, default=None)
    p.add_argument("--n_masked_patch", type=int, default=None)
    p.add_argument("--mask_drop", type=float, default=None)
    p.set_defaults(arch=None)
    args = p.parse_args()
    conf = load_conf(args)
    if conf.arch not in ("ga", "mha"):
        conf.arch = "ga"
    if args.seed is None:
        conf.seed = 4  # reference default for ACMIL runs (README.md:51-58)
    run_training(conf)


if __name__ == "__main__":
    main()
