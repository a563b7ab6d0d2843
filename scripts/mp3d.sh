#!/usr/bin/env bash
# MP3D scene sweep (reference scripts/mp3d.sh: per-scene loop over main.py
# with the blessed eccv configs).  With habitat + MP3D assets installed the
# habitat adapter is used automatically; otherwise scenes fall back to
# FakeSim rooms keyed by the scene id.
set -euo pipefail
CONFIG=${1:-configs/mp3d_gaussian_FR_eccv.yaml}
SCENES=("GdvgFV5R1Z5" "gZ6f7yhEvPG" "pLe4wQe7qrG" "YmJkqBEsHnH")

for scene in "${SCENES[@]}"; do
    python main.py --name mp3d_sweep \
        --slam_config "${CONFIG}" \
        --dataset mp3d --dataset_split val \
        --scenes_list "${scene}" \
        --log_dir logs/
done
