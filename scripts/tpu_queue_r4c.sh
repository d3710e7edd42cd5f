#!/bin/bash
# Third round-4 on-chip wave: validate the res_mod_ln kernel (CLAUDE.md:
# kernel_smoke REQUIRED after any kernel change), A/B it on the scaled
# train step, and re-run the serving bench with a saturation-correct
# load shape (first run: 64 clients vs a 256 tier + 5 ms deadline =
# 55% padding). Waits for tpu_queue_r4b.sh's completion marker.
# Usage: nohup bash scripts/tpu_queue_r4c.sh > /tmp/queue_c.log 2>&1 &
set -u
cd /root/repo

run_stage() {
  local name="$1"; shift
  local log=".onchip_r04_${name}.log"
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
}

until [ -f /tmp/queue_b_complete ]; do
  sleep 120
done
echo "queue B complete; starting wave C $(date -u +%H:%M:%S)"

# 1. New-kernel smoke at the largest admitted geometries (1024xd512,
#    4096xd128) — gates flipping _RES_LN_DEFAULT_ON.
run_stage resln_smoke python scripts/kernel_smoke.py --only res_mod_ln

# 2. Scaled-train A/B with the fused boundary kernel ON (partner: the
#    queue-B scaled_precoded run with it OFF).
run_stage scaled_resln env T2MS_FUSED_RES_LN=1 \
  python scripts/bench_scaled.py --modes train

# 3. Serving bench at a saturation-correct load shape: clients sized to
#    the largest tier, deadline ~10% of a tier-256 service time.
run_stage serving_sat python scripts/bench_serving.py \
  --clients 256 --requests 4096 --max_wait_ms 100

echo "QUEUE C COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_c_complete
