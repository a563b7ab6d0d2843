#!/usr/bin/env python
"""Behavioral-parity quality check (the QUALITY.md table).

Runs the FisherRF (gaussians_based) and FBE (frontier) policies on the
SAME FakeSim scene/seed at the blessed eccv operating point and reports
3D completeness/acc/FPR (5 cm), AUC, 2D coverage, PSNR, and wall time.
The expected relationship (reference data/metric_data curves, BASELINE.md):
FisherRF >= FBE on completeness and AUC.

Usage:  python scripts/quality_check.py [--steps 240] [--policies a,b]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

import numpy as np


def build(policy: str, steps: int, seed: int = 11,
          frames_per_iter: int = 1, object_scene: bool = False,
          dynamic_scene: bool = False, workdir: str = "/tmp/fnc_quality",
          run_name: str | None = None, scene=None, img: int = 256):
    from fisher_nerf_customized_tpu.config import get_cfg_defaults
    from fisher_nerf_customized_tpu.engine import ActiveMapper
    from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene, FakeSim
    from fisher_nerf_customized_tpu.ops.camera import Camera

    cfg = get_cfg_defaults()
    cfg.workdir = workdir
    cfg.run_name = run_name or f"q_{policy}"
    cfg.policy.name = policy
    cfg.num_frames = steps
    cfg.map_every = 10
    cfg.keyframe_every = 4
    cfg.downsample_pcd = 4
    cfg.forward_step_size = 0.065
    cfg.turn_angle = 10.0
    cfg.mapping.num_iters = 120
    cfg.mapping.prune_gaussians = True
    cfg.mapping.pruning_dict.prune_every = 40
    cfg.mapping.pruning_dict.removal_opacity_threshold = 1e-4
    cfg.policy.planning_queue_size = 30
    cfg.explore.sample_view_num = 256
    cfg.explore.cell_size = 0.05
    cfg.explore.sample_range = 1.0
    cfg.explore.min_range = 0.5
    cfg.explore.frontier_select_method = "combined"
    cfg.explore.centering = True
    cfg.H_reg_lambda = 1e-6
    cfg.path_end_weight = 30.0
    cfg.tpu.pose_chunk = 32
    cfg.tpu.mapping_frames_per_iter = frames_per_iter
    # ad-hoc overrides for A/B gates: QUALITY_SET="tpu.pipeline_planning=True"
    import ast
    for kv in os.environ.get("QUALITY_SET", "").split(","):
        if not kv.strip():
            continue
        key, val = kv.split("=", 1)
        node = cfg
        parts = key.strip().split(".")
        for p_ in parts[:-1]:
            node = getattr(node, p_)
        setattr(node, parts[-1], ast.literal_eval(val))

    cam = Camera(fx=img / 2.0, fy=img / 2.0, cx=img / 2.0, cy=img / 2.0,
                 width=img, height=img)
    if img != 256:
        cfg.img_height = cfg.img_width = img
        cfg.SLAM.Dataset.Calibration.merge_from_other(dict(
            width=img, height=img, fx=img / 2.0, fy=img / 2.0,
            cx=img / 2.0, cy=img / 2.0))
    if scene is None:
        scene = BoxScene.default(seed=seed, n_obstacles=8, room=5.0)
    obj = None
    if object_scene:
        from fisher_nerf_customized_tpu.envs.fake_sim import SimObject
        obj = SimObject(scene, semantic_id=100, size=(0.4, 1.2, 0.4),
                        start_xz=(0.0, 1.8), seed=seed)
    sim = FakeSim(scene, cam, forward_step=0.065, turn_angle=10.0, seed=0,
                  dynamic_object=obj, object_dynamic=dynamic_scene)
    mapper = ActiveMapper(cfg, sim, scene=scene, seed=0,
                          object_scene=object_scene,
                          dynamic_scene=dynamic_scene)
    return mapper, scene


def run_policy(policy: str, steps: int, frames_per_iter: int = 1,
               object_scene: bool = False, dynamic_scene: bool = False):
    from fisher_nerf_customized_tpu.engine.eval import eval_navigation

    mapper, scene = build(policy, steps, frames_per_iter=frames_per_iter,
                          object_scene=object_scene,
                          dynamic_scene=dynamic_scene)
    gt = scene.sample_surface_points(100000)
    t0 = time.perf_counter()
    result = mapper.test_navigation(n_eval_poses=0, recon_gt_points=gt)
    wall = time.perf_counter() - t0
    # full per-step completeness curve for scripts/compare_curves.py
    mapper.metrics.dump(os.path.join(mapper.eval_dir,
                                     "metrics_curve.yaml"))
    ev = eval_navigation(mapper.slam, mapper.sim, scene, n_poses=60,
                         seed=42)
    from fisher_nerf_customized_tpu.engine.eval import (
        accuracy_comp_ratio_from_pcl)
    recon = accuracy_comp_ratio_from_pcl(mapper.global_pcl.get(), gt, 0.05)
    auc = mapper.metrics.auc("completeness_ratio") \
        if hasattr(mapper.metrics, "auc") else None
    row = dict(policy=policy, steps=result["steps"],
               done=result["done_reason"],
               completeness=round(recon["completeness_ratio"], 2),
               acc_m=round(recon["acc_distance"], 4),
               fpr=round(recon["fpr"], 2),
               cov2d=round(result.get("coverage_2d_pct", float("nan")), 1),
               psnr=round(float(ev["psnr"]), 2),
               auc=None if auc is None else round(float(auc), 2),
               wall_s=round(wall, 1))
    if object_scene:
        # object-branch gate (VERDICT round-2 item 3): per-step warm cost
        # of the object path + object reconstruction quality @1cm
        obj = mapper.sim.dynamic_object
        if obj is not None and mapper.obj_slam is not None:
            gt_obj = obj.sample_surface_points(20000, frame="object")
            m = mapper.record_object_metrics(result["steps"], gt_obj,
                                             dist_thresh=0.01)
            row["obj_completeness"] = round(m["completeness_ratio"], 2)
            row["obj_auc"] = round(float(mapper.object_metrics.auc()), 2)
        tm = result.get("timing", {}).get("object_tracking")
        if tm:
            row["object_tracking_ms"] = round(tm["mean_ms"], 1)
    row["phase_totals_s"] = {
        k: round(v["total_s"], 1) for k, v in sorted(
            result.get("timing", {}).items(),
            key=lambda kv: -kv[1]["total_s"])[:8]}
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--policies", default="gaussians_based,frontier")
    ap.add_argument("--frames_per_iter", type=int, default=1)
    ap.add_argument("--object", action="store_true",
                    help="object-branch gate: spawn a SimObject and report"
                         " object AUC + object_tracking ms")
    ap.add_argument("--dynamic", action="store_true")
    args = ap.parse_args()
    from fisher_nerf_customized_tpu.utils.jax_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    rows = [run_policy(p.strip(), args.steps, args.frames_per_iter,
                       object_scene=args.object, dynamic_scene=args.dynamic)
            for p in args.policies.split(",")]
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
