#!/usr/bin/env python
"""Step3 — MHIM training (masked hard instance mining, EMA teacher).

Mirrors the reference `Step3_WSI_classification_MHIM.py` CLI (`:40-95`).
Note the reference script has a latent ImportError (it imports a
nonexistent `modules.transmil`, SURVEY.md §2.1) — this version runs.
"""

from acmil_tpu.cli.train import base_parser, load_conf, run_training


def main():
    p = base_parser("MHIM WSI classification (TPU)")
    p.add_argument("--model", default="mhim", choices=["mhim", "pure"])
    p.add_argument("--baseline", default="selfattn", choices=["selfattn", "attn"])
    p.add_argument("--mask_ratio", type=float, default=0.0)
    p.add_argument("--mask_ratio_l", type=float, default=0.0)
    p.add_argument("--mask_ratio_h", type=float, default=0.0)
    p.add_argument("--mask_ratio_hr", type=float, default=1.0)
    p.add_argument("--cls_alpha", type=float, default=1.0)
    p.add_argument("--cl_alpha", type=float, default=0.1)
    p.add_argument("--mm", type=float, default=0.9999, help="EMA decay")
    p.add_argument("--mm_sche", action="store_true",
                   help="cosine schedule of EMA decay")
    p.add_argument("--mrh_sche", action="store_true",
                   help="cosine decay of the high-attention mask ratio")
    p.add_argument("--mlp_dim", type=int, default=512)
    p.add_argument("--teacher_init", type=str, default="",
                   help="ckpt dir of a pretrained 'pure' run for the teacher")
    p.add_argument("--init_stu_type", default="none", choices=["none", "all"],
                   help="also initialise the student from teacher_init")
    args = p.parse_args()
    conf = load_conf(args)
    conf.arch = args.model
    run_training(conf)


if __name__ == "__main__":
    main()
