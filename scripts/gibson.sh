#!/usr/bin/env bash
# Gibson scene sweep (reference scripts/gibson.sh).
set -euo pipefail
CONFIG=${1:-configs/mp3d_gaussian_FR_eccv.yaml}
SCENES=("Denmark" "Eastville" "Elmira" "Eudora" "Greigsville")

for scene in "${SCENES[@]}"; do
    python main.py --name gibson_sweep \
        --slam_config "${CONFIG}" \
        --dataset gibson --dataset_split val \
        --scenes_list "${scene}" \
        --log_dir logs/
done
