#!/usr/bin/env bash
# Multi-scene sweep entry (reference scripts/mp3d.sh:1-43 / gibson.sh /
# hm3d_frontier.sh: a shell loop over scene ids invoking main.py).
# Usage: scripts/run_scenes.sh <config.yaml> [scene ids ...]
set -euo pipefail
CONFIG=${1:-configs/mp3d_gaussian_FR_eccv.yaml}
shift || true
SCENES=${@:-"fake_room_0 fake_room_1 fake_room_2"}

for SCENE in $SCENES; do
    echo ">>> scene $SCENE"
    python main.py --slam_config "$CONFIG" --scenes_list "$SCENE" --sim fake
done
