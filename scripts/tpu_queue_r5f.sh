#!/bin/bash
# Round-5 on-chip wave F — runs after wave E:
#   1. profile_scaled_serve — the scaled (56.7M) SERVE path has never
#      been separately profiled (TODO round-4 pointer); candidates are
#      the f32 final LN/unpatch and sampler-scan overheads. 67.1% MFU
#      today — this names the next lever or proves the ceiling.
#   2. bench_scaled_serve — fresh serve number same-session as the
#      profile.
# Usage: nohup bash scripts/tpu_queue_r5f.sh > /tmp/queue_r5f.log 2>&1 &
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

echo "waiting for wave E ($(date -u +%H:%M:%S))"
until [ -f /tmp/queue_r5e_complete ]; do sleep 120; done
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
echo "WAVE E DONE, TUNNEL UP $(date -u +%H:%M:%S)"

run_stage profile_scaled_serve \
  python scripts/profile_program.py --what sample --scaled --top 40
run_stage bench_scaled_serve python scripts/bench_scaled.py --modes serve
touch /tmp/queue_r5f_complete
