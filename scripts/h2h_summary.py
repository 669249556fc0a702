"""Summarise head_to_head.jsonl into the PARITY.md table: per-recipe
per-framework mean ± spread of best-epoch test AUC."""

import json
import sys
from collections import defaultdict

import numpy as np


def main(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by = defaultdict(dict)
    for r in rows:
        by[(r["recipe"], r["framework"])][r["seed"]] = r
    recipes = sorted({k[0] for k in by})
    print(f"{'recipe':10} {'framework':16} {'n':>2} {'mean':>7} "
          f"{'min':>7} {'max':>7}  seeds")
    for rec in recipes:
        for fw in ("torch-reference", "acmil_tpu"):
            d = by.get((rec, fw), {})
            if not d:
                continue
            aucs = np.array([d[s]["test_auc"] for s in sorted(d)])
            print(f"{rec:10} {fw:16} {len(aucs):>2} {aucs.mean():7.4f} "
                  f"{aucs.min():7.4f} {aucs.max():7.4f}  {sorted(d)}")
    print("\nper-seed test AUC:")
    for rec in recipes:
        seeds = sorted(set().union(*[set(by.get((rec, f), {}))
                                     for f in ("torch-reference",
                                               "acmil_tpu")]))
        for s in seeds:
            t = by.get((rec, "torch-reference"), {}).get(s)
            o = by.get((rec, "acmil_tpu"), {}).get(s)
            tt = f"{t['test_auc']:.4f}" if t else "  --  "
            oo = f"{o['test_auc']:.4f}" if o else "  --  "
            print(f"| {rec} | {s} | {tt} | {oo} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/h2h_r4/head_to_head.jsonl")
