#!/bin/bash
# Fourth round-4 on-chip wave: explain the precoded-vs-encode null result
# (4.79 vs 4.78 steps/s despite the trace attributing 17.6 ms/step to
# conv fusions) with a profile of the PRECODED step, and close the
# deadlift study with the 3000-step (1,1,2) point (4500 x 1,1,2 scored
# 0.0841 — well under the 0.104 gate — so 3000 weighted may green where
# 3000 even failed at 0.108).
# Waits for tpu_queue_r4c.sh's completion marker.
# Usage: nohup bash scripts/tpu_queue_r4d.sh > /tmp/queue_d.log 2>&1 &
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

until [ -f /tmp/queue_c_complete ]; do
  sleep 120
done
echo "queue C complete; starting wave D $(date -u +%H:%M:%S)"

run_stage profile_precoded python scripts/profile_program.py \
  --what train --scaled --precoded --top 30

run_stage dl_3000_112 python scripts/quality_gate.py --track deadlift \
  --steps 3000 --bucket_steps 1,1,2

echo "QUEUE D COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_d_complete
