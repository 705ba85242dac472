#!/bin/bash
# Serialized TPU measurement queue — run when the axon relay returns.
# ONE TPU python process at a time (a concurrent second process wedges
# the remote claim); generous timeouts (killing a process mid-claim also
# wedges it — prefer letting a step finish).
#
# Usage: bash scripts/tpu_queue.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-reports/tpu_queue_logs}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log"
  echo "=== $name exit $rc ==="
  return $rc
}

# 0. probe: is the chip reachable? (fast matmul; bail early if not)
TMO=180 run probe python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()), jax.devices())" \
  || { echo 'TPU unreachable — aborting queue'; exit 1; }

# 1. headline route comparison (decides/validates the bench winner)
TMO=1800 run headline_routes python scripts/x_headline_routes.py

# 1b. A/B: fused sort+compress extended to the 512 class
TMO=1800 IA_SPGEMM_FUSED_MAX_WIDTH=512 run headline_routes_fused512 \
  python scripts/x_headline_routes.py

# 2. acceptance: refreshes reports/fixture_sweeps.json + headline_rooflines.json
TMO=3600 run acceptance python scripts/acceptance.py

# 3. the driver's benchmark line
TMO=1800 run bench python bench.py

# 4. harvest resume (long: ~90 matrices; process-isolated per matrix)
TMO=14400 run harvest python scripts/upcycle_tpu.py

# 5. retrain on the grown checkpoint (CPU; safe to run any time)
TMO=3600 run retrain python scripts/retrain_from_checkpoint.py

echo "queue done — logs in $LOG"
