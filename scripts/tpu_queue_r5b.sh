#!/bin/bash
# Round-5 on-chip wave B — runs strictly AFTER wave A (waits for its
# completion marker). The VERDICT-r4 measurement program:
#   1. attn_ab        — isolated backward A/B incl. the round-5 PIPELINED
#                       kernel (VERDICT #1)
#   2. scaled_pipe    — scaled train MFU with the pipelined bwd ON
#   3. scaled_base    — same-session flag-off partner
#   4. gate_dit_partner — the t2ms_tpu arm of the torch-DiT training-
#                       dynamics A/B (VERDICT #2; torch arm runs on CPU
#                       via scripts/measure_torch_dit_gate.py)
#   5. serving_mixed  — mixed-bucket 24/48/96 open-loop saturation
#                       (VERDICT #6)
#   6. ema_scaled     — EMA A/B at the 56.7M geometry (VERDICT #7)
#   7. gate8k_solver_ab — few-step solvers at the 8000-step headline
#                       gate, ONE trained model (VERDICT #5)
# Usage: nohup bash scripts/tpu_queue_r5b.sh > /tmp/queue_r5b.log 2>&1 &
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

echo "waiting for wave A ($(date -u +%H:%M:%S))"
until [ -f /tmp/queue_r5a_complete ]; do sleep 120; done
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
echo "WAVE A DONE, TUNNEL UP $(date -u +%H:%M:%S)"

run_stage attn_ab python scripts/bench_attn_bwd_variants.py --reps 20
run_stage scaled_pipe env T2MS_ATTN_PIPE_BWD=1 \
  python scripts/bench_scaled.py --modes train
run_stage scaled_base python scripts/bench_scaled.py --modes train
run_stage gate_dit_partner python scripts/quality_gate.py \
  --steps 800 --batch 64 --f32 --eval_cfid --cfg_scale 3.0
run_stage serving_mixed python scripts/bench_serving.py \
  --lengths 24,48,96 --rate 300 --requests 4096 --max_wait_ms 100 \
  --tiers 1,16,64,256 --clients 256
run_stage ema_scaled python scripts/ab_scaled_ema.py --steps 2000
run_stage gate8k_solver_ab python scripts/quality_gate.py \
  --steps 8000 --eval_cfid --cfg_scale 7.0 \
  --solver_ab euler:100,heun:25,midpoint:50
touch /tmp/queue_r5b_complete
