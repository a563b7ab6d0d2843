#!/usr/bin/env bash
# HM3D frontier-navigation sweep (reference scripts/hm3d_frontier.sh:
# per-scene loop over main_navigation.py).
set -euo pipefail
CONFIG=${1:-configs/mp3d_gaussian_FR_eccv_gaussians.yaml}
SCENES=("00800-TEEsavR23oF")

for scene in "${SCENES[@]}"; do
    python main_navigation.py --name test_pointnav_exp \
        --slam_config "${CONFIG}" \
        --dataset hm3d --dataset_split val \
        --scenes_list "${scene}" \
        --log_dir logs/
done
