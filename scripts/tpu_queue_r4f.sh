#!/bin/bash
# Sixth round-4 on-chip wave: validate the LEAN attention backward
# (commit c1e2d05 — forward saves lse, backward skips softmax
# recompute; targets the profiled ~30% attention-VJP share of the
# scaled train step).
#   1. lean_smoke      — full kernel_smoke incl. stats_fwd_1024_hd512
#                        and lean_bwd at the auto config
#   2. attn_bwd_ab     — per-kernel A/B: recompute grouped vs two-pass
#                        vs lean configs at B=64 (picks proven table)
#   3. scaled_leanattn — scaled-train A/B with the lean path ON
#                        (partner: scaled_resln = 49.0% MFU default)
#   4. headline        — bench.py fresh headline number
# Runs stages SEQUENTIALLY (only one TPU process at a time — CLAUDE.md).
# Usage: nohup bash scripts/tpu_queue_r4f.sh > /tmp/queue_f.log 2>&1 &
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

# 1. Every Pallas kernel at its largest admitted geometry, including the
#    two new lean entries (stats forward + lean backward).
run_stage lean_smoke python scripts/kernel_smoke.py

# 2. Attention-backward variant timing at the real train batch: decides
#    _bwd_lean_groups' proven table and the _LEAN_BWD_DEFAULT_ON flip.
run_stage attn_bwd_ab python scripts/bench_attn_bwd_variants.py

# 3. Scaled-train A/B with the lean backward ON (current default partner
#    = 49.0% MFU, .onchip_r04_scaled_resln.log).
run_stage scaled_leanattn env T2MS_ATTN_LEAN_BWD=1 \
  python scripts/bench_scaled.py --modes train

# 3b. Long-series backward A/B: recompute two-pass vs lean two-pass at
#     N=4096 @ HD=128 (the SUSHI training geometry).
run_stage attn_bwd_ab_long python scripts/bench_attn_bwd_variants.py --long

# 4. Fresh headline bench (latent-cache default path).
run_stage headline python bench.py

echo "QUEUE F COMPLETE $(date -u +%H:%M:%S)"
touch /tmp/queue_f_complete
