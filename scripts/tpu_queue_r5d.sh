#!/bin/bash
# Round-5 on-chip wave D — runs strictly AFTER wave C. Cashes in the
# wave-B/C findings:
#   1. bench_heun    — bench.py with the new heun/25 extra (quality >=
#                      euler/100 at the 8k gate, half the evals) +
#                      re-confirms the headline under the pipe default
#   2. serving_t128  — mixed-bucket rerun with a 128 tier matching the
#                      measured ~120-row natural group (19% -> ? padding)
#   3. serving_heun  — single-bucket saturation with heun/25: the
#                      recommended production config's throughput number
# Usage: nohup bash scripts/tpu_queue_r5d.sh > /tmp/queue_r5d.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 180 python - <<'EOF'
import jax, numpy as np
x = jax.numpy.ones((8, 8))
print("probe ok", float(np.asarray(x.sum())))
EOF
}

run_stage() {
  local name="$1"; shift
  local log=".onchip_r05_${name}.log"
  if grep -q "^RC=0$" "$log" 2>/dev/null; then
    echo "SKIP $name (already green)"; return 0
  fi
  echo "=== STAGE $name: $* ($(date -u +%H:%M:%S)) ==="
  "$@" > "$log" 2>&1
  local rc=$?
  echo "RC=$rc" >> "$log"
  echo "=== STAGE $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  git add "$log" && git commit -q -m "Record on-chip ${name} run (rc=$rc)

No-Verification-Needed: measurement log only" || true
  touch /tmp/queue_stage_done
}

echo "waiting for wave C ($(date -u +%H:%M:%S))"
until [ -f /tmp/queue_r5c_complete ]; do sleep 120; done
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
echo "WAVE C DONE, TUNNEL UP $(date -u +%H:%M:%S)"

run_stage bench_heun python bench.py
run_stage serving_t128 python scripts/bench_serving.py \
  --lengths 24,48,96 --rate 300 --requests 6144 --max_wait_ms 100 \
  --tiers 1,16,64,128,256 --clients 256
run_stage serving_heun python scripts/bench_serving.py \
  --solver heun --total_step 25 --requests 4096 --max_wait_ms 100 \
  --tiers 1,16,64,256 --clients 256
touch /tmp/queue_r5d_complete
