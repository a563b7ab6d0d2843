#!/usr/bin/env python
"""Coverage evaluation CLI: estimated point cloud vs GT surface cloud.

Reference: scripts/evaluation.py:23-282 — loads the latest
pointcloud/global_pcl_{t}.ply of a run, samples the GT scene surface and
reports the 5 cm NN coverage percentage.  GT comes from a FakeSim scene
spec (hermetic) or a .ply GT cloud; .glb meshes need trimesh (gated).
"""
import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

from fisher_nerf_customized_tpu.engine.eval import (
    accuracy_comp_ratio_from_pcl, coverage_percentage)
from fisher_nerf_customized_tpu.utils.pointcloud import read_ply


def get_latest_pcl_file(run_dir: str):
    """(reference scripts/evaluation.py:102 get_latest_pcl_file)"""
    files = glob.glob(os.path.join(run_dir, "pointcloud", "global_pcl_*.ply"))
    best, best_t = None, -1
    for f in files:
        m = re.search(r"global_pcl_(\d+)\.ply", f)
        if m and int(m.group(1)) > best_t:
            best, best_t = f, int(m.group(1))
    return best, best_t


def load_gt_points(args) -> np.ndarray:
    if args.gt_ply:
        return read_ply(args.gt_ply)
    if args.gt_glb:
        try:
            import trimesh
        except ImportError:
            raise SystemExit(".glb GT needs trimesh (unavailable offline); "
                             "use --gt_ply or --fake_scene_seed")
        mesh = trimesh.load(args.gt_glb, force="mesh")
        pts, _ = trimesh.sample.sample_surface(mesh, args.n_gt_points)
        return np.asarray(pts, np.float32)
    from fisher_nerf_customized_tpu.envs.fake_sim import BoxScene
    scene = BoxScene.default(seed=args.fake_scene_seed)
    return scene.sample_surface_points(args.n_gt_points)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="experiment dir containing pointcloud/")
    p.add_argument("--gt_ply", default=None)
    p.add_argument("--gt_glb", default=None)
    p.add_argument("--fake_scene_seed", type=int, default=0)
    p.add_argument("--n_gt_points", type=int, default=400000)
    p.add_argument("--dist_thresh", type=float, default=0.05)
    args = p.parse_args()

    pcl_file, t = get_latest_pcl_file(args.run_dir)
    if pcl_file is None:
        raise SystemExit(f"no pointcloud/global_pcl_*.ply under {args.run_dir}")
    est = read_ply(pcl_file)
    gt = load_gt_points(args)
    cov = coverage_percentage(gt, est, args.dist_thresh)
    recon = accuracy_comp_ratio_from_pcl(est, gt, args.dist_thresh)
    out = dict(pcl_file=pcl_file, step=t, n_est=len(est), n_gt=len(gt),
               coverage_pct=cov, **recon)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
