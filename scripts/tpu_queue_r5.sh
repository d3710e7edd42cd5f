#!/bin/bash
# Round-5 on-chip wave A — runs as soon as the tunnel answers.
# Per TODO.md: warm the per-host compile cache FIRST after any VM
# migration/reboot (bench.py doubles as the warmer), then validate
# kernels, then the VERDICT-r4 #4 headline decomposition (the B=256
# 100-step sampler has never had a phase table like the scaled one).
#   1. headline  — bench.py (cache warm + fresh headline number)
#   2. smoke     — kernel_smoke.py at largest admitted geometries
#   3. profile_headline — sample profile at the REFERENCE op-point
#      (B=256, 100 steps) with the by-source-op aggregate view
# Usage: nohup bash scripts/tpu_queue_r5.sh > /tmp/queue_r5.log 2>&1 &
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

until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
echo "TUNNEL UP $(date -u +%H:%M:%S)"

run_stage headline python bench.py
run_stage smoke python scripts/kernel_smoke.py
run_stage profile_headline \
  python scripts/profile_program.py --what sample --batch 256 --steps 100 --top 40
touch /tmp/queue_r5a_complete
