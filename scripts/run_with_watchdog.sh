#!/bin/bash
# Wedge-resilient runner for long episodes on the axon TPU tunnel.
#
# Failure modes this covers (observed on real hardware; see QUALITY.md
# "Benchmark-scene saturation" + the startup watchdog in
# fisher_nerf_customized_tpu/utils/platform.py):
#   1. startup wedge  — the plugin's first RPC never completes; handled
#      in-process by FNC_STARTUP_WATCHDOG_S (fast exit 86),
#   2. mid-run wedge  — RPC stream freezes later; detected here by a
#      frozen /proc/<pid>/io rchar counter (a healthy client streams
#      device RPCs continuously).  utime alone cannot distinguish a
#      wedge (it creeps ~1s/poll even when futex-blocked) — but a
#      CPU-BURNING process with frozen rchar is an XLA compile, not a
#      wedge, so high utime delta vetoes the stall counter.  A wedge
#      that spins CPU instead of futex-blocking falls through this
#      guard and is bounded only by the wrapped command's own
#      `timeout N` — accepted: never observed on real hardware.
#
# The wrapped command must be resumable (the CLI episode runner resumes
# from its latest params*.npz via --resume --checkpoint; sweep cells
# resume from their metric_data YAMLs).  Reference analog: the SLURM
# preemption requeue loop in cluster_manager.py:7-65 — same contract
# (convert hangs/kills into restarts against durable checkpoints).
#
# Usage:
#   scripts/run_with_watchdog.sh <done_file> <budget_s> <cmd...>
# Exits 0 as soon as <done_file> exists; otherwise restarts <cmd>
# (appending stdout/err to $WATCHDOG_LOG, default /tmp/watchdog_run.log)
# until the budget is exhausted.
set -u
DONE_FILE=$1; shift
BUDGET_S=$1; shift
LOG=${WATCHDOG_LOG:-/tmp/watchdog_run.log}
STARTUP_S=${FNC_STARTUP_WATCHDOG_S:-150}
POLL_S=${WATCHDOG_POLL_S:-40}
STALL_POLLS=${WATCHDOG_STALL_POLLS:-3}
# utime in /proc/<pid>/stat is in clock ticks; derive the tick rate
# instead of hardcoding USER_HZ=100
HZ=$(getconf CLK_TCK 2>/dev/null); HZ=${HZ:-100}
DEADLINE=$(( $(date +%s) + BUDGET_S ))
ATTEMPT=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ -e "$DONE_FILE" ]; then echo "[watchdog] done"; exit 0; fi
  ATTEMPT=$((ATTEMPT+1))
  echo "[watchdog] attempt $ATTEMPT: $* ($(date))" | tee -a "$LOG"
  FNC_STARTUP_WATCHDOG_S=$STARTUP_S "$@" >> "$LOG" 2>&1 &
  PID=$!
  sleep 5
  # the command may be `timeout N python ...` — watch the leaf child
  # (the children procfile must be READ, not ls'ed)
  PYPID=$(awk '{print $1}' "/proc/$PID/task/$PID/children" 2>/dev/null)
  [ -z "$PYPID" ] && PYPID=$PID
  STALL=0; LASTR=-1; LASTU=-1
  while kill -0 "$PID" 2>/dev/null; do
    sleep "$POLL_S"
    R=$(awk '/^rchar/{print $2}' "/proc/$PYPID/io" 2>/dev/null)
    [ -z "$R" ] && break
    U=$(awk '{print $14}' "/proc/$PYPID/stat" 2>/dev/null)
    # frozen rchar alone can be a long XLA compile (pure CPU, no device
    # RPCs); a true wedge is futex-blocked — rchar frozen AND (almost) no
    # CPU.  Allow up to ~3s CPU/poll of creep (observed on real wedges);
    # threshold in ticks = seconds * CLK_TCK.
    CPU_OK=0
    if [ -n "$U" ] && [ "$LASTU" -ge 0 ] && \
       [ $((U - LASTU)) -gt $((3 * HZ)) ]; then CPU_OK=1; fi
    LASTU=${U:-$LASTU}
    if [ "$R" = "$LASTR" ] && [ "$CPU_OK" = 0 ]; then
      STALL=$((STALL+1))
    else
      STALL=0
    fi
    LASTR=$R
    if [ "$STALL" -ge "$STALL_POLLS" ]; then
      echo "[watchdog] io stall (rchar=$R utime=$U), restarting ($(date))" | tee -a "$LOG"
      kill "$PID" "$PYPID" 2>/dev/null; sleep 3; kill -9 "$PYPID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  sleep 10
done
echo "[watchdog] budget exhausted ($(date))" | tee -a "$LOG"
exit 1
