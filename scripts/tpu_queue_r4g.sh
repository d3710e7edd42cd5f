#!/bin/bash
# Seventh round-4 on-chip wave — runs strictly AFTER wave F (waits for
# its stage logs): the default-flip evidence for the lean attention
# backward beyond the scaled geometry.
#   1. ref_leanattn — bench.py with the lean path ON: the REFERENCE-scale
#                     train step (B=1024, N=480-class geometry) must not
#                     regress before _LEAN_BWD_DEFAULT_ON flips (partner:
#                     flag-off bench.py = wave-F "headline" stage)
#   2. profile_lean — scaled precoded-step profile with lean ON through
#                     the new device-filtered / by-source profiler view
# Usage: nohup bash scripts/tpu_queue_r4g.sh > /tmp/queue_g.log 2>&1 &
set -u
cd /root/repo

f_done() {
  [ -f /tmp/queue_f_complete ] && return 0
  local s
  for s in lean_smoke attn_bwd_ab scaled_leanattn attn_bwd_ab_long \
           headline; do
    grep -q "^RC=" ".onchip_r04_${s}.log" 2>/dev/null || return 1
  done
  return 0
}

probe() {
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
  git add "$log" && git commit -q -m "Record on-chip ${name} run (rc=$rc)

No-Verification-Needed: measurement log only" || true
  touch /tmp/queue_stage_done
}

echo "waiting for wave F ($(date -u +%H:%M:%S))"
until f_done; do sleep 300; done
echo "WAVE F DONE $(date -u +%H:%M:%S)"
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 600s"
  sleep 600
done

run_stage ref_leanattn env T2MS_ATTN_LEAN_BWD=1 python bench.py
run_stage profile_lean env T2MS_ATTN_LEAN_BWD=1 \
  python scripts/profile_program.py --what train --scaled --precoded --top 40

echo "QUEUE G COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_g_complete
