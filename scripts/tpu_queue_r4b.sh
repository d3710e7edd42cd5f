#!/bin/bash
# Follow-on on-chip stages discovered mid-round-4 (after the main
# tpu_queue_r4.sh was already executing): the scaled-train A/B for the
# latent-cache methodology (the round-4 profile found the in-step frozen
# VAE conv encode at 17.6 ms of the 204.5 ms device step).
# Waits for the main queue's completion marker so only one process ever
# touches the TPU (CLAUDE.md).
# Usage: nohup bash scripts/tpu_queue_r4b.sh > /tmp/queue_b.log 2>&1 &
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

until [ -f /tmp/queue_complete ]; do
  sleep 120
done
echo "main queue complete; starting follow-on stages $(date -u +%H:%M:%S)"

run_stage scaled_precoded python scripts/bench_scaled.py --modes train
run_stage scaled_encode_in_step python scripts/bench_scaled.py \
  --modes train --encode_in_step

echo "QUEUE B COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_b_complete
