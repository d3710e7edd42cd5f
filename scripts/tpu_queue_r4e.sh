#!/bin/bash
# Fifth round-4 on-chip wave: the four stages orphaned by the
# 2026-08-19 ~13:10 host reboot (wave C stopped after resln_smoke;
# wave D never started because its /tmp marker was wiped).
#   1. scaled_resln   — A/B the fused res_mod_ln boundary kernel ON
#                       (partner: scaled_precoded = OFF, 4.79 steps/s)
#   2. serving_sat    — saturation-correct serving load shape
#   3. profile_precoded — profile the PRECODED scaled step to explain
#                       the precoded-vs-encode null result
#   4. dl_3000_112    — deadlift gate 3000 steps, (1,1,2) bucket split
# Runs stages SEQUENTIALLY (only one TPU process at a time — CLAUDE.md).
# Usage: nohup bash scripts/tpu_queue_r4e.sh > /tmp/queue_e.log 2>&1 &
set -u
cd /root/repo

probe() {
  # a wedged tunnel HANGS at backend discovery (no error, 10+ min) —
  # bound the probe; nothing has dispatched yet so the kill is safe
  timeout 180 python - <<'EOF'
import jax, numpy as np
x = jax.numpy.ones((8, 8))
print("probe ok", float(np.asarray(x.sum())))
EOF
}

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
  # commit the evidence immediately: builder sessions die to API errors,
  # the queue must not depend on one being alive to land results
  git add "$log" && git commit -q -m "Record on-chip ${name} run (rc=$rc)

No-Verification-Needed: measurement log only" || true
  touch /tmp/queue_stage_done
}

# Wait for the tunnel: probe every 10 min until one succeeds.
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 600s"
  sleep 600
done
touch /tmp/tpu_ok
echo "TUNNEL UP $(date -u +%H:%M:%S)"

# 1. Scaled-train A/B with the fused res_mod_ln boundary kernel ON.
#    Gates flipping _RES_LN_DEFAULT_ON (smoke already 4/4 green).
run_stage scaled_resln env T2MS_FUSED_RES_LN=1 \
  python scripts/bench_scaled.py --modes train

# 2. Serving bench at a saturation-correct load shape: clients sized to
#    the largest tier, deadline ~10% of a tier-256 service time.
run_stage serving_sat python scripts/bench_serving.py \
  --clients 256 --requests 4096 --max_wait_ms 100

# 3. Profile the PRECODED scaled step (explains the precoded-vs-encode
#    null: trace attributed 17.6 ms/step to conv fusions yet the A/B
#    moved 4.79 vs 4.78).
run_stage profile_precoded python scripts/profile_program.py \
  --what train --scaled --precoded --top 30

# 4. Deadlift gate: 3000 steps at the (1,1,2) allocation that scored
#    0.0841 at 4500 (gate 0.104; 3000 even failed at 0.108).
run_stage dl_3000_112 python scripts/quality_gate.py --track deadlift \
  --steps 3000 --bucket_steps 1,1,2

echo "QUEUE E COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_e_complete
