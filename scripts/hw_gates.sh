#!/usr/bin/env bash
# Pending hardware (real-TPU) validation gates, in priority order.
# Run when the axon tunnel is up:  bash scripts/hw_gates.sh [outdir]
#
# Each gate appends its JSON/log to $OUT.  Safe to re-run; every stage
# is independently skippable with Ctrl-C and bounded by a timeout.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_gates_$(date +%m%d_%H%M)}
mkdir -p "$OUT"
echo "== hw gates -> $OUT"

probe() {
  # no platform pin: the tunnel registers as the experimental 'axon'
  # platform (devices still print as TPU); pinning 'tpu' fails there.
  timeout 120 python - <<'EOF'
import jax
devs = jax.devices()
print(devs)
assert any("tpu" in str(d).lower() for d in devs), devs
EOF
}
probe || { echo "TPU unreachable; aborting"; exit 2; }

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "== $name"
  timeout "$to" "$@" 2>&1 | tee "$OUT/$name.log" | tail -4
}

# 1. bench artifact (the round-recorded number): expect >= 2.5 steps/s
run bench 2400 python bench.py

# 2. SSIM-refixed quality re-baseline (QUALITY.md blessed table, both
#    policies, 240 steps) — tables predating the separable-SSIM fix and
#    the bound guards carry a corrupted SSIM loss term
run quality_rebase 7200 python scripts/quality_check.py --steps 240

# 3. object-branch gate: static + dynamic; target object_tracking_ms
#    <= 300 warm, object AUC reported
run quality_object 3600 python scripts/quality_check.py --object --steps 120
run quality_object_dyn 3600 python scripts/quality_check.py --object --dynamic --steps 120

# 4. Pallas forward-blend episode A/B (flip tpu.blend_forward default if
#    the pallas forward wins reproducibly on adjacent runs)
QUALITY_SET="tpu.blend_forward='pallas'" \
  run quality_pallas_fwd 7200 python scripts/quality_check.py --steps 240 --policies gaussians_based

# 5. OA golden-curve episodes at the full operating point (the CPU run
#    of these at reduced iters feeds compare_curves; re-run here for the
#    blessed table)
for crit in topt dopt; do
  QUALITY_SET="criterion='$crit',workdir='$OUT/oa_$crit'" \
    run quality_oa_$crit 3600 python scripts/quality_check.py --object --steps 120 --policies gaussians_based
done

echo "== done; artifacts in $OUT"
echo "   follow-ups: update QUALITY.md tables; if pallas fwd wins, flip"
echo "   the default in config/defaults.py (tpu.blend_forward) + README"
