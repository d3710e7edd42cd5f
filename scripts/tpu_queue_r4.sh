#!/bin/bash
# Round-4 remaining on-chip evidence queue (reconstructed after the
# 2026-08-19 07:21 machine reboot wiped /tmp/tpu_queue*.sh).
# Runs stages SEQUENTIALLY (only one TPU process at a time — CLAUDE.md).
# Each stage logs to /root/repo/.onchip_r04_<name>.log with RC recorded.
# Usage: nohup bash scripts/tpu_queue_r4.sh > /tmp/queue.log 2>&1 &
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

# 1. Headline bench (also measures the latent-cache train path). Quick.
run_stage bench python bench.py

# 2. Fresh scaled-train profile (VERDICT r3 #3 follow-up: 48.0% MFU vs
#    the >=55% target — find the next lever). Quick.
run_stage profile_scaled python scripts/profile_program.py \
  --what train --scaled --top 30

# 3. C-FID gate re-baseline under the FIXED TS2Vec extractor, at the
#    round-2 table's op-point geometry (8000 steps, sweep 1/3/5/7/10)
#    so the stale BASELINE.md table can be REPLACED like-for-like.
run_stage gate8k python scripts/quality_gate.py --steps 8000 \
  --eval_cfid --cfg_scale 5.0 --cfg_sweep 1,3,7,10

# 4. Online serving bench (round-4 subsystem; never measured on chip).
run_stage serving python scripts/bench_serving.py

# 5. Solver A/B: heun/25 (50 evals) vs the euler/100 baseline,
#    plus ddim/25 on the DDPM track.
run_stage gate_heun python scripts/quality_gate.py --steps 1500 \
  --eval_cfid --cfg_scale 5.0 --solver heun --sample_steps 25
run_stage gate_euler_base python scripts/quality_gate.py --steps 1500 \
  --eval_cfid --cfg_scale 5.0
run_stage gate_ddim python scripts/quality_gate.py --steps 1500 \
  --eval_cfid --cfg_scale 5.0 --backbone ddpm --solver ddim --sample_steps 25
run_stage gate_ddpm_base python scripts/quality_gate.py --steps 1500 \
  --eval_cfid --cfg_scale 5.0 --backbone ddpm

# 6. EMA quality A/B partner for stage 3 (same seed, same steps; only
#    the evaluated weights differ).
run_stage gate8k_ema python scripts/quality_gate.py --steps 8000 \
  --eval_cfid --cfg_scale 5.0 --ema_decay 0.999

# 7. Deadlift step-allocation study (VERDICT r3 #6): target all-green at
#    <=4500 steps. Even 4500, then weighted allocations, then the 3000
#    diagnostic.
run_stage dl_4500_even python scripts/quality_gate.py --track deadlift --steps 4500
run_stage dl_4500_112  python scripts/quality_gate.py --track deadlift --steps 4500 --bucket_steps 1,1,2
run_stage dl_4500_221  python scripts/quality_gate.py --track deadlift --steps 4500 --bucket_steps 2,2,1
run_stage dl_3000_even python scripts/quality_gate.py --track deadlift --steps 3000

echo "QUEUE COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_complete
