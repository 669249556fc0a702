#!/usr/bin/env python
"""Step3 — generic MIL trainer (TransMIL / CLAM / DSMIL / BMIL / ABMIL /
MHA / ILRA / mean / max / ibmil / lbmil / ips).

Mirrors the reference `Step3_WSI_classification.py` arch dispatch
(`:120-146`); arch names are identical. The per-arch loss wiring
(`engine.py:143-154`) is handled by the family registry.
"""

from acmil_tpu.cli.train import base_parser, load_conf, run_training


def main():
    p = base_parser("Generic WSI MIL classification (TPU)")
    p.add_argument("--w_loss", type=float, default=None,
                   help="bag/instance loss mix for CLAM (engine.py:103)")
    args = p.parse_args()
    conf = load_conf(args)
    # reference arch aliases
    if conf.arch == "mha":
        conf.arch = "mha_single"
    run_training(conf)


if __name__ == "__main__":
    main()
