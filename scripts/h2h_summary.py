"""Summarise head_to_head.jsonl into the PARITY.md table: per-recipe
per-framework mean ± spread of best-epoch test AUC."""

import json
import sys
from collections import defaultdict

import numpy as np


def main(*paths):
    rows = [json.loads(l) for p in paths for l in open(p) if l.strip()]
    by = defaultdict(dict)
    for r in rows:
        # lr AND task are part of the group key: runs differing only in
        # them are separate sweep points, not overwrites (pre-r4 rows
        # without the fields ran at lr 1e-4 on the default corpus)
        lr = r.get("lr", 1e-4) or 1e-4
        task = r.get("task", "default")
        by[(r["recipe"], r.get("epochs"), lr, task,
            r["framework"])][r["seed"]] = r
    recipes = sorted({k[:4] for k in by}, key=str)
    print(f"{'recipe':10} {'ep':>3} {'lr':>8} {'task':>8} {'framework':16} "
          f"{'n':>2} {'mean':>7} {'min':>7} {'max':>7}  seeds")
    for rec, ep, lr, task in recipes:
        for fw in ("torch-reference", "acmil_tpu"):
            d = by.get((rec, ep, lr, task, fw), {})
            if not d:
                continue
            aucs = np.array([d[s]["test_auc"] for s in sorted(d)])
            print(f"{rec:10} {ep!s:>3} {lr:>8g} {task:>8} {fw:16} "
                  f"{len(aucs):>2} {aucs.mean():7.4f} "
                  f"{aucs.min():7.4f} {aucs.max():7.4f}  {sorted(d)}")
    print("\nper-seed test AUC:")
    for rec, ep, lr, task in recipes:
        seeds = sorted(set().union(*[set(by.get((rec, ep, lr, task, f), {}))
                                     for f in ("torch-reference",
                                               "acmil_tpu")]))
        for s in seeds:
            t = by.get((rec, ep, lr, task, "torch-reference"), {}).get(s)
            o = by.get((rec, ep, lr, task, "acmil_tpu"), {}).get(s)
            tt = f"{t['test_auc']:.4f}" if t else "  --  "
            oo = f"{o['test_auc']:.4f}" if o else "  --  "
            print(f"| {rec} (lr={lr:g}, {task}) | {s} | {tt} | {oo} |")


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["/root/h2h_r4/head_to_head.jsonl"]))
