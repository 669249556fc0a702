#!/usr/bin/env python
"""Step3 — DTFD-MIL training (two-tier pseudo-bag distillation).

Mirrors the reference `Step3_WSI_classification_DTFD.py` CLI (`:46-50`);
the two-optimizer/retain_graph loop is a single jit step with
stop-gradient tiers (see `acmil_tpu.models.dtfd`).
"""

from acmil_tpu.cli.train import base_parser, load_conf, run_training


def main():
    p = base_parser("DTFD-MIL WSI classification (TPU)")
    p.add_argument("--numGroup", type=int, default=4)
    p.add_argument("--total_instance", type=int, default=4)
    p.add_argument("--distill", type=str, default="MaxMinS",
                   choices=["MaxMinS", "MaxS", "AFS"])
    p.add_argument("--grad_clipping", type=float, default=5.0)
    args = p.parse_args()
    conf = load_conf(args)
    conf.arch = "dtfd"
    run_training(conf)


if __name__ == "__main__":
    main()
