#!/bin/bash
# 1000-step object-aware (OA) protocol on the 3x3 procedural apartment,
# one run per criterion (fisher / topt / dopt) — r4 verdict next #7:
# the criterion ordering was only ever recorded on the single-room box
# world.  Curves land in the reference metric_data YAML shape via the
# driver's object_metrics recorder (tester_gaussians_navigation.py:
# 1212-1289 analog).  Resumable per-criterion via the result.json
# done-file contract of run_with_watchdog.sh.
# Usage: scripts/run_oa_apartment.sh [criterion] (default: all three)
set -u
cd "$(dirname "$0")/.."
STEPS=${OA_STEPS:-1000}
OUT=${OA_OUT:-artifacts/r5/oa_apartment}
for CRIT in ${1:-fisher topt dopt}; do
  DIR="$OUT/$CRIT/fake_apartment3x3_0"
  [ -e "$DIR/result.json" ] && { echo "[oa] $CRIT done"; continue; }
  CK=$(ls -v "$DIR"/params*.npz 2>/dev/null | tail -1)
  EXTRA=""
  [ -n "$CK" ] && EXTRA="--resume --checkpoint $CK"
  FNC_STEP_WATCHDOG_S=${FNC_STEP_WATCHDOG_S:-300} \
  timeout "${OA_ATTEMPT_S:-2400}" python main.py \
    --name "$CRIT" \
    --slam_config configs/mp3d_gaussian_FR_eccv_gaussians.yaml \
    --dataset fake --dataset_split val --sim fake \
    --scenes_list fake_apartment3x3_0 \
    --object_scene --dynamic_scene \
    --max_steps "$STEPS" --eval_poses 0 \
    --log_dir "$OUT" --seed 0 \
    --set criterion "$CRIT" --set policy.name gaussians_based \
    --set checkpoint_interval 100 $EXTRA \
    || exit $?
done
