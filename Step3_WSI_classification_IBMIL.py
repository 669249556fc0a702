#!/usr/bin/env python
"""Step3 — IBMIL training (interventional bag MIL).

Two-phase protocol mirroring the reference `Step3_WSI_classification_IBMIL.py`:
phase 1 trains the plain attention model (no --c_path); then
`IBMIL_clustering.py` builds the confounder dictionary; phase 2 re-trains
with --c_path pointing at the saved prototypes (`:70-71`).
"""

from acmil_tpu.cli.train import base_parser, load_conf, run_training


def main():
    p = base_parser("IBMIL WSI classification (TPU)")
    p.add_argument("--c_path", nargs="+", default=None,
                   help="confounder prototype .npy path(s) (phase 2)")
    p.add_argument("--c_learn", action="store_true",
                   help="make the confounder dictionary trainable")
    p.add_argument("--confounder_merge", default="cat",
                   choices=["cat", "add", "sub"])
    args = p.parse_args()
    conf = load_conf(args)
    conf.arch = "ibmil"
    run_training(conf)


if __name__ == "__main__":
    main()
