#!/bin/bash
# Patch-up queue: the headline-route A/Bs that step 2 of tpu_queue.sh
# missed (scripts ran with scripts/ as sys.path[0] — fixed), plus the
# tuning pick and a bench re-capture under the picked default.
# Run AFTER the main queue exits (one TPU process at a time).
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

probe_ok=0
for attempt in 1 2 3 4 5 6; do
  if TMO=300 run "patch_probe$attempt" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()), jax.devices())"; then
    probe_ok=1
    break
  fi
  echo "probe attempt $attempt failed — waiting 180s for the claim to expire"
  sleep 180
done
[ "$probe_ok" = 1 ] || { echo 'TPU unreachable — aborting patch queue'; exit 1; }

TMO=1800 run headline_routes python scripts/x_headline_routes.py
TMO=1800 IA_SPGEMM_FUSED_MAX_WIDTH=512 run headline_routes_fused512 \
  python scripts/x_headline_routes.py
TMO=1800 IA_SPGEMM_FUSED_MAX_WIDTH=1024 run headline_routes_fused1024 \
  python scripts/x_headline_routes.py
TMO=120 run pick_tuning python scripts/pick_bench_tuning.py
TMO=2700 IA_SPGEMM_BENCH_NO_SUPERVISE=1 run bench_tuned2 python bench.py

for i in 1 2 3; do
  git add reports weights 2>/dev/null
  if git commit -m "TPU patch queue: headline route A/B artifacts + tuned bench" \
      >/dev/null 2>&1; then
    echo "patch queue artifacts committed"
    break
  fi
  sleep 30
done
echo "patch queue done — logs in $LOG"
