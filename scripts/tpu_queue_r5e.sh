#!/bin/bash
# Round-5 on-chip wave E — runs after wave D:
#   1. gate_tsae_deep — TSae motion gate with a deeper VAE pretrain
#                       (the 3000-step run attributed its gate miss to
#                       TSae recon 0.0338 after only 800 pretrain
#                       updates; the reference pretrains 16000-20000
#                       epochs — config.yaml:56,100)
#   2. serving_prod   — the full production config in one number:
#                       mixed 24/48/96 buckets, 128-tier ladder,
#                       heun/25, open-loop 700 req/s
#   3. trickle_fast   — interactive-latency op-point: heun/25 with a
#                       5 ms deadline (the latency-optimal setting)
# Usage: nohup bash scripts/tpu_queue_r5e.sh > /tmp/queue_r5e.log 2>&1 &
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

echo "waiting for wave D ($(date -u +%H:%M:%S))"
until [ -f /tmp/queue_r5d_complete ]; do sleep 120; done
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
echo "WAVE D DONE, TUNNEL UP $(date -u +%H:%M:%S)"

run_stage gate_tsae_deep python scripts/quality_gate.py \
  --track motion --vae_kind tsae --steps 3000 --vae_steps 4000
run_stage serving_prod python scripts/bench_serving.py \
  --lengths 24,48,96 --rate 700 --requests 8192 --max_wait_ms 100 \
  --tiers 1,16,64,128,256 --clients 256 --solver heun --total_step 25
run_stage trickle_fast python scripts/bench_serving.py \
  --solver heun --total_step 25 --requests 512 --clients 16 \
  --max_wait_ms 5 --tiers 1,16,64,256 --trickle 30
touch /tmp/queue_r5e_complete
