#!/usr/bin/env bash
# Hardware (real-TPU) validation gates, in priority order.
# Run when the axon tunnel is up:  bash scripts/hw_gates.sh [outdir]
#
# Round-2 session (2026-08-18) ran all of these green — results in
# QUALITY.md ("Round-2 hardware gates").  Keep this as the regression
# runbook: re-run after any kernel/default change on hardware.
#
# NOTE (round 3): the Pallas lowering + XLA-twin parity gate is now
# AUTOMATED — bench.py runs it first on every invocation and exits(3)
# with a named error if a kernel fails to lower or diverges (see
# bench.py _kernel_gate).  This runbook remains for the broader gates
# (quality episodes, object branch, A/Bs).
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

# 0. Pallas kernel smoke (lowering on REAL hardware — interpret mode
#    does NOT check Mosaic block rules; r2 found all three kernels
#    failed to lower from a (1,1) SMEM operand)
run kernel_smoke 600 python - <<'EOF'
import numpy as np, jax.numpy as jnp
from fisher_nerf_customized_tpu.ops.pallas_blend import pallas_blend
from fisher_nerf_customized_tpu.ops.pallas_blend_bwd import pallas_blend_bwd_slots
from fisher_nerf_customized_tpu.ops.pallas_fisher import pallas_fisher_slots
T, K, P, C = 4, 256, 128, 3
r = np.random.default_rng(0)
packed = jnp.asarray(r.normal(size=(T, K, 7 + C)).astype(np.float32))
pix = jnp.asarray(r.uniform(0, 64, size=(T, 2, P)).astype(np.float32))
nval = jnp.asarray(r.integers(0, K, size=(T,)).astype(np.int32))
print("blend", pallas_blend(packed, pix, nval, 16, K, chunk=256)[0].shape)
gcol = jnp.asarray(r.normal(size=(T, P, C)).astype(np.float32))
gt = jnp.asarray(r.normal(size=(T, 1, P)).astype(np.float32))
print("bwd", pallas_blend_bwd_slots(packed, pix, gcol, gt, nval, 256).shape)
p11 = jnp.asarray(r.normal(size=(T, K, 11)).astype(np.float32))
print("fisher", pallas_fisher_slots(p11, pix, nval, 64, 1.0, 100., 100.).shape)
print("KERNELS OK")
EOF

# 1. bench artifact (the round-recorded number): r2 recorded 2.55-4.37
#    steps/s depending on XLA disk-cache warmth; expect >= 2.5 cold
run bench 2400 python bench.py

# 2. scene quality gate (both policies, 240 steps) — blessed r2 table in
#    QUALITY.md; FisherRF must beat frontier on cov2d/PSNR/AUC
run quality 7200 python scripts/quality_check.py --steps 240

# 3. object-branch gates: static + dynamic; warm object_tracking_ms
#    <= 300 (r2: 143/124); canonical-frame obj completeness (r2:
#    58.6 static / 91.1 dynamic)
run quality_object 3600 python scripts/quality_check.py --object --steps 120 --policies gaussians_based
run quality_object_dyn 3600 python scripts/quality_check.py --object --dynamic --steps 120 --policies gaussians_based

# 4. OA criterion episodes (fisher is the default criterion in gate 3;
#    topt/dopt here) — ordering topt > fisher >= dopt matched the
#    reference's golden curves in r2 (compare via
#    scripts/compare_curves.py, artifact auc_compare_oa_r2.csv)
for crit in topt dopt; do
  QUALITY_SET="criterion='$crit'" \
    run quality_oa_$crit 3600 python scripts/quality_check.py --object --steps 120 --policies gaussians_based
done

# 5. frontier-only pipeline (main_navigation.py) — one short episode
run frontier_nav 1200 python main_navigation.py --name hwfr \
  --slam_config configs/mp3d_gaussian_FR_frontier.yaml \
  --dataset fake --dataset_split val --scenes_list fake_room_0 \
  --sim fake --max_steps 30 --debug --log_dir "$OUT/hwfr" --eval_poses 8

echo "== done; artifacts in $OUT"
echo "   follow-ups: update QUALITY.md tables if any number moved"
