#!/bin/bash
# Round-5 on-chip wave C — runs strictly AFTER wave B:
#   0. scaled_lean4 — in-step lean backward at the proven (4,512) config
#   1. gate_tsae   — the motion gate through TSae latents (VERDICT #3):
#                    pretrain TSae (teacher-forced, p=0.1 dropout), train
#                    the DiT on its memory latents, sample through the
#                    scanned AR decoder, full metric suite
#   2. gate8k_ddpm_solver_ab — DDPM-track few-step A/B at the 8000-step
#                    gate (ddim:25 vs ancestral:100, ONE trained model)
# Usage: nohup bash scripts/tpu_queue_r5c.sh > /tmp/queue_r5c.log 2>&1 &
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

echo "waiting for wave B ($(date -u +%H:%M:%S))"
until [ -f /tmp/queue_r5b_complete ]; do sleep 120; done
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
echo "WAVE B DONE, TUNNEL UP $(date -u +%H:%M:%S)"

# In-step verdict for the lean backward at its round-5 proven config
# (g4/bq512 — the isolated winner; the r4 negative ran the envelope's
# g2/bq128 pick). Partner: wave-B scaled_base.
run_stage scaled_lean4 env T2MS_ATTN_LEAN_BWD=1 \
  python scripts/bench_scaled.py --modes train
run_stage gate_tsae python scripts/quality_gate.py \
  --track motion --vae_kind tsae --steps 3000
run_stage gate8k_ddpm_solver_ab python scripts/quality_gate.py \
  --steps 8000 --backbone ddpm --eval_cfid --cfg_scale 7.0 \
  --solver_ab euler:100,ddim:25
touch /tmp/queue_r5c_complete
