#!/bin/bash
# Poll the axon tunnel until a trivial device op completes, then exec the
# wrapped command.  Used to hold long episode launches during the tunnel
# wedge windows observed on this box (r4/r5: jax.devices() itself can
# block indefinitely; FNC_STARTUP_WATCHDOG_S only helps in-process).
# Usage: scripts/wait_tunnel_then_run.sh <max_wait_s> <cmd...>
set -u
MAX_S=$1; shift
DEADLINE=$(( $(date +%s) + MAX_S ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
jnp.ones((8,8)).sum().block_until_ready()" >/dev/null 2>&1; then
    echo "[tunnel] healthy ($(date)); launching: $*"
    exec "$@"
  fi
  echo "[tunnel] still wedged ($(date)); retrying in 60s"
  sleep 60
done
echo "[tunnel] gave up after ${MAX_S}s"
exit 1
