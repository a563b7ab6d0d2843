#!/usr/bin/env python
"""Golden-curve comparison harness.

Overlays this repo's per-step reconstruction curves against the
reference's checked-in MP3D golden curves
(reference data/metric_data/{FisherRF,FBE,FisherRF_OA,POp_GS_topt_OA,
POp_GS_dopt_OA}.yaml, produced by evaluate_3d_object_reconstruction,
reference tester:1212-1289).

Absolute completeness values are NOT comparable across scene suites
(the golden curves are MP3D scene GdvgFV5R1Z5 at 1 cm; FakeSim runs use
a synthetic room) — so the checks are the transferable invariants:

  * policy ORDERING by AUC (e.g. FisherRF >= FBE on the reference;
    gaussians_based >= frontier here),
  * curve SHAPE: monotone-ish growth (small tolerated dips from moving
    objects), early-growth fraction, saturation.

Usage:
  python scripts/compare_curves.py \
      --ours <run_dir_or_yaml> [<run_dir_or_yaml> ...] \
      [--reference /root/reference/data/metric_data] \
      [--out compare_curves.csv] [--plot compare_curves.png]

Each `--ours` argument is either a metrics yaml (MetricsRecorder.dump
format — same schema as the reference's) or a run directory containing
`metrics_curve.yaml` / `recon_metrics.yaml`.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np
import yaml


def load_curve(path: str) -> dict:
    """-> dict(name, steps (N,), completeness (N,), auc, final)."""
    with open(path) as f:
        d = yaml.safe_load(f)
    # reference schema: {experiment: {policy_name}, steps: [...]}
    # repo schema (MetricsRecorder): {policy, scene, steps: [...], auc}
    if "experiment" in d:
        name = d["experiment"].get("policy_name", os.path.basename(path))
    else:
        name = d.get("policy", os.path.basename(path))
    steps = d.get("steps", [])
    t = np.asarray([s["step"] for s in steps], np.float64)
    comp = np.asarray([s.get("completeness_ratio", np.nan) for s in steps],
                      np.float64)
    keep = np.isfinite(comp)
    t, comp = t[keep], comp[keep]
    return dict(name=name, steps=t, completeness=comp,
                auc=curve_auc(comp), final=float(comp[-1]) if len(comp)
                else float("nan"))


def curve_auc(values: np.ndarray) -> float:
    """Normalized trapezoid AUC (the reference pads curves to equal length
    before averaging, scripts/auc_evaluation.py:26-169; normalizing by
    length makes curves of different episode lengths comparable)."""
    v = np.asarray(values, np.float64)
    if len(v) < 2:
        return float(v[0]) if len(v) else float("nan")
    return float(np.trapezoid(v) / (len(v) - 1))


def shape_stats(curve: dict) -> dict:
    """Transferable shape invariants of a coverage-style curve."""
    c = curve["completeness"]
    if len(c) < 4:
        return dict(monotone_frac=np.nan, half_point=np.nan,
                    late_growth=np.nan)
    d = np.diff(c)
    final = max(c[-1], 1e-9)
    half_idx = int(np.argmax(c >= 0.5 * final))
    return dict(
        # fraction of steps that do not regress (1.0 = perfectly monotone)
        monotone_frac=float(np.mean(d >= -1e-6)),
        # fraction of the episode needed to reach half the final coverage
        half_point=float(half_idx / max(len(c) - 1, 1)),
        # growth in the last quarter relative to final (saturation check)
        late_growth=float((c[-1] - c[int(len(c) * 0.75)]) / final),
    )


def resolve_ours(arg: str) -> list[str]:
    if os.path.isfile(arg):
        return [arg]
    found = []
    for cand in ("metrics_curve.yaml", "recon_metrics.yaml",
                 "object_metrics_curve.yaml"):
        p = os.path.join(arg, cand)
        if os.path.exists(p):
            found.append(p)
    return found


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", nargs="+", required=True,
                    help="repo metric yamls or run dirs")
    ap.add_argument("--reference",
                    default="/root/reference/data/metric_data",
                    help="dir with the reference golden-curve yamls")
    ap.add_argument("--out", default="compare_curves.csv")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args(argv)

    rows, ours, refs = [], [], []
    for a in args.ours:
        for p in resolve_ours(a):
            ours.append((load_curve(p), p))
    if os.path.isdir(args.reference):
        for fn in sorted(os.listdir(args.reference)):
            if fn.endswith(".yaml"):
                refs.append((load_curve(os.path.join(args.reference, fn)),
                             os.path.join(args.reference, fn)))

    for c, p, kind in [(c, p, "ours") for c, p in ours] + \
                      [(c, p, "reference") for c, p in refs]:
        rows.append(dict(kind=kind, policy=c["name"], source=p,
                         n_steps=len(c["steps"]), auc=round(c["auc"], 3),
                         final=round(c["final"], 3),
                         **{k: round(v, 4) if np.isfinite(v) else ""
                            for k, v in shape_stats(c).items()}))

    with open(args.out, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        wr.writeheader()
        wr.writerows(rows)

    # policy-ordering checks (the invariant the golden curves encode)
    def auc_of(pairs, name):
        for c, _ in pairs:
            if c["name"] == name:
                return c["auc"]
        return None

    def final_of(pairs, name):
        for c, _ in pairs:
            if c["name"] == name:
                return c["final"]
        return None

    checks = []
    ref_fisher, ref_fbe = auc_of(refs, "FisherRF"), auc_of(refs, "FBE")
    if ref_fisher is not None and ref_fbe is not None:
        checks.append(("reference FisherRF >= FBE (AUC)",
                       ref_fisher >= ref_fbe))
    our_fisher = auc_of(ours, "gaussians_based") or auc_of(ours, "FisherRF")
    our_fbe = auc_of(ours, "frontier") or auc_of(ours, "FBE")
    if our_fisher is not None and our_fbe is not None:
        checks.append(("ours gaussians_based >= frontier (AUC)",
                       our_fisher >= our_fbe))
    # final completeness is the reference's headline metric (BASELINE.md:
    # FisherRF 61.67 vs FBE 61.08 @999).  AUC ordering is episode-length
    # sensitive — FisherRF trades early coverage for information-driven
    # detours and overtakes late (visible in the reference curves too) —
    # so the final-value ordering is checked independently.
    ourf_fin = (final_of(ours, "gaussians_based")
                or final_of(ours, "FisherRF"))
    ourb_fin = final_of(ours, "frontier") or final_of(ours, "FBE")
    if ourf_fin is not None and ourb_fin is not None:
        checks.append(("ours gaussians_based >= frontier (final "
                       "completeness)", ourf_fin >= ourb_fin))
    for c, _ in ours:
        st = shape_stats(c)
        if np.isfinite(st["monotone_frac"]):
            checks.append((f"ours[{c['name']}] coverage mostly monotone",
                           st["monotone_frac"] >= 0.9))

    print(f"{'kind':10s} {'policy':20s} {'steps':>6s} {'auc':>8s} "
          f"{'final':>7s}")
    for r in rows:
        print(f"{r['kind']:10s} {r['policy']:20s} {r['n_steps']:6d} "
              f"{r['auc']:8.2f} {r['final']:7.2f}")
    ok = True
    for name, passed in checks:
        print(("PASS " if passed else "FAIL ") + name)
        ok &= passed
    print(f"wrote {args.out}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        for c, _ in refs:
            ax.plot(c["steps"], c["completeness"], "--", alpha=0.6,
                    label=f"ref:{c['name']}")
        for c, _ in ours:
            ax.plot(c["steps"], c["completeness"], label=f"ours:{c['name']}")
        ax.set_xlabel("step")
        ax.set_ylabel("completeness ratio")
        ax.legend(fontsize=7)
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
