#!/bin/bash
# Round-5 on-chip wave G — runs after wave F:
#   1. scaled_h4 — the d=128-head roofline experiment (TODO.md: "changing
#      head width is the only lever left"). Same d_model=512 / depth-12 /
#      56.7M geometry and identical FLOPs, but 4 heads of d=128 instead of
#      8 of d=64: every score-shaped matmul's K dim doubles from 64 to
#      128, lifting the per-matmul MXU utilization cap that pins the d=64
#      ceiling at ~51.3% MFU. If MFU jumps, the ceiling claim is
#      CONFIRMED-as-geometry (architectural, reference-ratio heads are the
#      cost); if it doesn't, the bottleneck model needs revision.
# Start-deadline guarded: will NOT begin a stage after the cutoff so it
# cannot collide with the driver's end-of-round bench.
# Usage: nohup bash scripts/tpu_queue_r5g.sh > /tmp/queue_r5g.log 2>&1 &
set -u
cd /root/repo

CUTOFF_EPOCH=${CUTOFF_EPOCH:-1787240100}   # 15:35 UTC

run_stage() {
  local name="$1"; shift
  local log=".onchip_r05_${name}.log"
  if grep -q "^RC=0$" "$log" 2>/dev/null; then
    echo "SKIP $name (already green)"; return 0
  fi
  if [ "$(date +%s)" -ge "$CUTOFF_EPOCH" ]; then
    echo "CUTOFF reached; not starting $name"; return 0
  fi
  echo "=== STAGE $name: $* ($(date -u +%H:%M:%S)) ==="
  "$@" > "$log" 2>&1
  local rc=$?
  echo "RC=$rc" >> "$log"
  echo "=== STAGE $name done rc=$rc ($(date -u +%H:%M:%S)) ==="
  git add "$log" && git commit -q -m "Record on-chip ${name} run (rc=$rc)

No-Verification-Needed: measurement log only" || true
}

echo "waiting for wave F ($(date -u +%H:%M:%S))"
until [ -f /tmp/queue_r5f_complete ]; do
  if [ "$(date +%s)" -ge "$CUTOFF_EPOCH" ]; then
    echo "CUTOFF reached while waiting for wave F; exiting"; exit 0
  fi
  sleep 60
done

run_stage scaled_h4 python scripts/bench_scaled.py --modes train --heads 4
touch /tmp/queue_r5g_complete
