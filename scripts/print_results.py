#!/usr/bin/env python
"""Aggregate per-scene episode results into one table.

Reference counterpart: scripts/canvas_print.py + print_result.sh (the
result pretty-printers).  Walks `<log_dir>/<run_name>/<scene>/result.json`
artifacts written by main.py / main_navigation.py and prints one row per
scene plus a mean row.

Usage:  python scripts/print_results.py <log_dir>/<run_name> [--csv out.csv]
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def collect(run_dir: str) -> list[dict]:
    rows = []
    for scene in sorted(os.listdir(run_dir)):
        path = os.path.join(run_dir, scene, "result.json")
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            r = json.load(f)
        ev = r.get("eval") or {}
        rc = r.get("recon") or {}
        rows.append(dict(
            scene=scene,
            steps=r.get("steps"),
            done=r.get("done_reason", ""),
            gaussians=r.get("n_gaussians"),
            cov2d=r.get("coverage_2d_pct"),
            psnr=ev.get("psnr"),
            ssim=ev.get("ssim"),
            depth_mae=ev.get("depth_mae"),
            completeness=rc.get("completeness_ratio"),
            acc_m=rc.get("acc_distance"),
            fpr=rc.get("fpr"),
            auc=r.get("auc"),
        ))
    return rows


def fmt(v, nd=2):
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.{nd}f}"
    return str(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="<log_dir>/<run_name> directory")
    ap.add_argument("--csv", default=None, help="also write a CSV")
    args = ap.parse_args()
    rows = collect(args.run_dir)
    if not rows:
        print(f"no result.json under {args.run_dir}", file=sys.stderr)
        return 1

    cols = ["scene", "steps", "done", "gaussians", "cov2d", "psnr", "ssim",
            "depth_mae", "completeness", "acc_m", "fpr", "auc"]
    num_cols = [c for c in cols if c not in ("scene", "done")]
    mean = {c: None for c in cols}
    mean["scene"] = "MEAN"
    for c in num_cols:
        vals = [r[c] for r in rows if isinstance(r.get(c), (int, float))]
        if vals:
            mean[c] = sum(vals) / len(vals)

    table = rows + [mean]
    widths = {c: max(len(c), *(len(fmt(r.get(c),
                                      4 if c == "acc_m" else 2))
                               for r in table)) for c in cols}
    header = "  ".join(c.ljust(widths[c]) for c in cols)
    print(header)
    print("-" * len(header))
    for r in table:
        print("  ".join(fmt(r.get(c), 4 if c == "acc_m" else 2)
                        .ljust(widths[c]) for c in cols))

    if args.csv:
        with open(args.csv, "w") as f:
            f.write(",".join(cols) + "\n")
            for r in table:
                f.write(",".join(fmt(r.get(c), 6) for c in cols) + "\n")
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
