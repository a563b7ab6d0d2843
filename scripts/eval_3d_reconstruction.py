#!/usr/bin/env python
"""3D reconstruction metrics CLI (reference scripts/
eval_3d_reconstruction.py:50-125): accuracy / completion / completion
ratio / FPR between an estimated .ply and a GT cloud."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fisher_nerf_customized_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

from fisher_nerf_customized_tpu.engine.eval import accuracy_comp_ratio_from_pcl
from fisher_nerf_customized_tpu.utils.pointcloud import read_ply


def main():
    p = argparse.ArgumentParser()
    p.add_argument("est_ply")
    p.add_argument("gt_ply")
    p.add_argument("--dist_thresh", type=float, default=0.05)
    args = p.parse_args()
    est, gt = read_ply(args.est_ply), read_ply(args.gt_ply)
    print(json.dumps(accuracy_comp_ratio_from_pcl(est, gt, args.dist_thresh),
                     indent=2))


if __name__ == "__main__":
    main()
