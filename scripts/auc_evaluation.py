#!/usr/bin/env python
"""AUC aggregation CLI (reference scripts/auc_evaluation.py:26-169):
parse per-run recon_metrics.yaml curves, pad to a common step count,
report per-policy mean±std completeness and trapezoid AUC; merged CSV out.
"""
import argparse
import csv
import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

from fisher_nerf_customized_tpu.engine.eval import trapezoid_auc


def load_runs(paths):
    runs = []
    for path in paths:
        with open(path) as f:
            data = yaml.safe_load(f)
        steps = data.get("steps", [])
        curve = [(s["step"], s.get("completeness_ratio", 0.0)) for s in steps]
        runs.append(dict(policy=data.get("policy", "unknown"),
                         scene=data.get("scene", "unknown"),
                         curve=curve, path=path))
    return runs


def pad_curve(curve, max_steps):
    if not curve:
        return np.zeros(max_steps)
    out = np.zeros(max_steps)
    vals = dict(curve)
    last = 0.0
    for t in range(max_steps):
        if t in vals:
            last = vals[t]
        out[t] = last
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("glob_pattern",
                   help="e.g. 'experiments/**/recon_metrics.yaml'")
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--csv_out", default="auc_merged.csv")
    args = p.parse_args()

    paths = sorted(glob.glob(args.glob_pattern, recursive=True))
    if not paths:
        raise SystemExit(f"no files match {args.glob_pattern}")
    runs = load_runs(paths)

    by_policy = defaultdict(list)
    for r in runs:
        by_policy[r["policy"]].append(pad_curve(r["curve"], args.max_steps))

    summary = {}
    for policy, curves in by_policy.items():
        arr = np.stack(curves)
        summary[policy] = dict(
            n_runs=len(curves),
            final_mean=float(arr[:, -1].mean()),
            final_std=float(arr[:, -1].std()),
            auc_mean=float(np.mean([trapezoid_auc(c) for c in arr])),
        )
    print(json.dumps(summary, indent=2))

    with open(args.csv_out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["policy", "step", "mean", "std"])
        for policy, curves in by_policy.items():
            arr = np.stack(curves)
            for t in range(args.max_steps):
                w.writerow([policy, t, float(arr[:, t].mean()),
                            float(arr[:, t].std())])
    print(f"wrote {args.csv_out}")


if __name__ == "__main__":
    main()
