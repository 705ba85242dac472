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

# 0. probe: is the chip reachable?  A lingering claim from a recently
# exited process can stall a fresh probe for minutes and self-expires in
# ~10-20 min, so retry with waits instead of aborting on one timeout.
probe_ok=0
for attempt in 1 2 3 4 5 6; do
  if TMO=300 run "probe$attempt" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()), jax.devices())"; then
    probe_ok=1
    break
  fi
  echo "probe attempt $attempt failed — waiting 180s for the claim to expire"
  sleep 180
done
[ "$probe_ok" = 1 ] || { echo 'TPU unreachable — aborting queue'; exit 1; }

# 1. the driver's benchmark line (the round's proof-of-life number).
# The probe above already verified the claim, so skip bench.py's own
# supervisor (its retry budget would outlive this step's timeout).
TMO=2700 IA_SPGEMM_BENCH_NO_SUPERVISE=1 run bench python bench.py

# 2. headline route comparison (decides/validates the bench winner)
TMO=1800 run headline_routes python scripts/x_headline_routes.py

# 2b. A/B: fused sort+compress extended to the 512 / 1024 classes
TMO=1800 IA_SPGEMM_FUSED_MAX_WIDTH=512 run headline_routes_fused512 \
  python scripts/x_headline_routes.py
TMO=1800 IA_SPGEMM_FUSED_MAX_WIDTH=1024 run headline_routes_fused1024 \
  python scripts/x_headline_routes.py

# 2c. distill the A/Bs into the bench.py fused-width default (host-only)
TMO=120 run pick_tuning python scripts/pick_bench_tuning.py

# 2d. re-capture the bench line under the tuned default (the step-1 run
# predates the pick; keep the faster of the two captures on record)
TMO=2700 IA_SPGEMM_BENCH_NO_SUPERVISE=1 run bench_tuned python bench.py

# 3. acceptance: refreshes reports/fixture_sweeps.json + headline_rooflines.json
TMO=3600 run acceptance python scripts/acceptance.py

# 4. real-chip D=1 ring point, then the modeled ICI curve beside the
#    virtual-mesh one (CPU pass reads the d1 entry back)
TMO=1800 run scaling_d1 python -m ia_spgemm_tpu.bench.scaling \
  --write reports/scaling_d1_r03.json
TMO=3600 run scaling_model python -m ia_spgemm_tpu.bench.scaling --cpu \
  --d1-from reports/scaling_d1_r03.json --write reports/scaling_r03.json

# 5. strategy-distinct harvest (long; process-isolated + checkpointed per
#    matrix — rerun this step to resume after any interruption)
TMO=14400 run harvest python scripts/upcycle_tpu.py

# 6. retrain on the harvested checkpoint (CPU; safe to run any time)
TMO=3600 run retrain python scripts/retrain_from_checkpoint.py

# 7. persist the measurement artifacts even if no session is alive to
#    commit them (retry around a possibly-busy index)
for i in 1 2 3; do
  git add reports weights 2>/dev/null
  if git commit -m "TPU queue: round-3 on-chip measurement artifacts" \
      >/dev/null 2>&1; then
    echo "queue artifacts committed"
    break
  fi
  sleep 30
done

echo "queue done — logs in $LOG"
