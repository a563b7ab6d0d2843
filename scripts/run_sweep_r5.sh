#!/bin/bash
# 8-scene x 2-policy sweep at the blessed 1000-step length
# (r4 verdict next #4) on 3x3 procedural apartments (non-saturating to
# ~410 steps; curves pad to 1000 like the reference's AUC protocol).
# Cell-level resume: finished cells are cached as their metric_data
# YAMLs, so run under scripts/run_with_watchdog.sh with the summary file
# as the done-file.
set -u
cd "$(dirname "$0")/.."
export FNC_STEP_WATCHDOG_S=${FNC_STEP_WATCHDOG_S:-300}
# blessed-protocol mapping budget (eccv config: 60 iters/event) — the
# quality harness default of 120 doubles mapping cost per event
export QUALITY_SET="${QUALITY_SET:-mapping.num_iters=60}"
OUT=${SWEEP_OUT:-artifacts/r5/sweep}
exec timeout "${SWEEP_ATTEMPT_S:-5400}" python scripts/multi_scene_sweep.py \
  --steps 1000 --policies gaussians_based,frontier --n_scenes 8 \
  --scene_kind apartment --out "$OUT" --img 256
