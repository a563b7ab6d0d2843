#!/bin/bash
# One attempt of the 2000-step config-4 blessed-protocol episode
# (mp3d_gaussian_FR_eccv_gaussians on the 7x7 procedural apartment —
# BASELINE.json configs[3]; ref tester_gaussians_navigation.py:1372-1491).
# Resumes from a checkpoint if one exists; ActiveMapper.resume() itself
# redirects to the params file named by the episode_state.npz commit
# record and validates it loads, so the file picked here is only a
# trigger (advisor r4: torn/newest-vs-committed checkpoint findings).
# Usage:
#   scripts/run_with_watchdog.sh \
#     artifacts/r5/config4_2000/fake_apartment7x7_0/result.json \
#     6000 scripts/run_config4.sh
set -u
cd "$(dirname "$0")/.."
DIR=${CONFIG4_DIR:-artifacts/r5/config4_2000/fake_apartment7x7_0}
CK=$(ls -v "$DIR"/params*.npz 2>/dev/null | tail -1)
EXTRA=""
[ -n "$CK" ] && EXTRA="--resume --checkpoint $CK"
export FNC_STEP_WATCHDOG_S=${FNC_STEP_WATCHDOG_S:-300}
NAME=$(basename "$(dirname "$DIR")")
exec timeout "${CONFIG4_ATTEMPT_S:-3600}" python main.py \
  --name "$NAME" \
  --slam_config configs/mp3d_gaussian_FR_eccv_gaussians.yaml \
  --dataset fake --dataset_split val --sim fake \
  --scenes_list fake_apartment7x7_0 \
  --max_steps 2000 --eval_every 100 \
  --log_dir "$(dirname "$(dirname "$DIR")")" --seed 0 \
  --set checkpoint_interval 100 ${CONFIG4_EXTRA_SET:-} $EXTRA
