#!/bin/bash
# Reference-config reproduction harness for the baselines blocked on real
# data (BASELINE.md "Remaining reference-config baselines"; zero-egress
# environment — TSFragment-600K / MMD / SUSHI are not downloadable here).
# One documented command per blocked baseline; the day the corpora exist
# at DATA_ROOT the tables fill themselves.
#
#   scripts/reproduce_reference.sh tsfragment [DATA_ROOT]
#       12-op-point quality table (reference scripts/script.sh:4-46 +
#       scripts_validation_only.sh): per family pretrain LA-VAE (2000
#       updates, pretrained_lavae_unified.py:114) -> train at reference
#       defaults (batch 9216, 20000 epochs, train.py:142-143) -> infer
#       --run_multi + evaluate at each tuned (cfg_scale, total_step).
#   scripts/reproduce_reference.sh sushi [DATA_ROOT]
#       SUSHI len-2048 long-series suite (dataloader.py:88-90) through
#       the blocked fused-heads long-series kernels.
#   scripts/reproduce_reference.sh mmd [DATA_ROOT]
#       MMD six-domain suite (dataloader.py:100-103) with the full
#       metric list incl. C-FID.
#   scripts/reproduce_reference.sh --check
#       Hermetic readiness proof: writes synthetic stand-ins in the real
#       layout, validates presence+schema with
#       scripts/reference_data_check.py, then drives each baseline's
#       EXACT command skeleton end-to-end at smoke scale (CPU-safe;
#       artifacts in a throwaway /tmp workdir).
#
# Env knobs (full modes): EPOCHS, BATCH, VAE_UPDATES, CKPT_ID override the
# reference defaults for partial runs.
set -e
cd "$(dirname "$0")/.."
REPO="$(pwd)"

MODE="${1:-all}"
DATA_ROOT="${2:-./Data}"
EPOCHS="${EPOCHS:-20000}"
BATCH="${BATCH:-9216}"
VAE_UPDATES="${VAE_UPDATES:-2000}"
CKPT_ID="${CKPT_ID:-$((EPOCHS - 1))}"

# The 12 tuned op-points (scripts_validation_only.sh:1-18).
OP_POINTS="exchangerate_24:7.0:100 exchangerate_48:12.0:60
exchangerate_96:5.0:100 electricity_24:5.0:60 electricity_48:5.0:10
electricity_96:13.0:30 traffic_24:5.0:100 traffic_48:5.0:10
traffic_96:5.0:30 ETTh1_24:9.0:10 ETTh1_48:9.0:10 ETTh1_96:9.0:10"
MMD_DOMAINS="Agriculture Climate Health_US Traffic Economy SocialGood"

cli() {  # cli <module> <args...> — run a t2ms_tpu.cli module with the
  # repo importable regardless of cwd (PYTHONPATH is forbidden here: it
  # breaks the axon tunnel worker — CLAUDE.md)
  local mod="$1"; shift
  python -c "
import sys
sys.path.insert(0, '$REPO')
from t2ms_tpu.cli import $mod as m
m.main(sys.argv[1:])
" "$@"
}

run_tsfragment() {
  local root="$1"
  python scripts/reference_data_check.py --data_root "$root" \
      --baseline tsfragment
  for fam in exchangerate electricity traffic ETTh1; do
    cli pretrain_vae --dataset_path "$fam" \
        --num_training_updates "$VAE_UPDATES" --data_root "$root"
    cli train --dataset_name "$fam" --data_root "$root" \
        --batch_size "$BATCH" --epochs "$EPOCHS"
  done
  for spec in $OP_POINTS; do
    IFS=: read -r name cfg steps <<< "$spec"
    cli infer --dataset_name "$name" --cfg_scale "$cfg" \
        --total_step "$steps" --run_multi 1 --checkpoint_id "$CKPT_ID" \
        --data_root "$root"
    cli evaluation --dataset_name "$name" --cfg_scale "$cfg" \
        --total_step "$steps" --method_list MSE,WAPE,MRR,CRPS,C-FID
  done
}

run_sushi() {
  local root="$1"
  python scripts/reference_data_check.py --data_root "$root" \
      --baseline sushi
  cli pretrain_vae --dataset_path SUSHI \
      --num_training_updates "$VAE_UPDATES" --data_root "$root"
  cli train --dataset_name SUSHI --data_root "$root" \
      --batch_size "${SUSHI_BATCH:-64}" --epochs "$EPOCHS"
  cli infer --dataset_name SUSHI --cfg_scale 5.0 --total_step 100 \
      --run_multi 1 --checkpoint_id "$CKPT_ID" --data_root "$root"
  cli evaluation --dataset_name SUSHI --cfg_scale 5.0 --total_step 100 \
      --method_list MSE,WAPE,MRR,CRPS,C-FID
}

run_mmd() {
  local root="$1"
  python scripts/reference_data_check.py --data_root "$root" \
      --baseline mmd
  for dom in $MMD_DOMAINS; do
    cli pretrain_vae --dataset_path "MMD-$dom" \
        --num_training_updates "$VAE_UPDATES" --data_root "$root"
    cli train --dataset_name "MMD-$dom" --data_root "$root" \
        --batch_size "$BATCH" --epochs "$EPOCHS"
    for L in 24 48 96; do
      cli infer --dataset_name "MMD-${dom}_$L" --cfg_scale 5.0 \
          --total_step 100 --run_multi 1 --checkpoint_id "$CKPT_ID" \
          --data_root "$root"
      cli evaluation --dataset_name "MMD-${dom}_$L" --cfg_scale 5.0 \
          --total_step 100 --method_list MSE,WAPE,MRR,CRPS,C-FID
    done
  done
}

check_mode() {
  # Hermetic wiring proof: same command skeletons, smoke scale, synthetic
  # stand-ins, throwaway workdir. Passes on the 1-core CPU host.
  local work
  work="$(mktemp -d /tmp/reproduce_check.XXXXXX)"
  echo "== check workdir: $work"
  python scripts/reference_data_check.py --data_root "$work/Data" \
      --make_standins --sushi_t 96 --standin_rows 120
  python scripts/reference_data_check.py --data_root "$work/Data" \
      --baseline all
  cd "$work"   # artifacts (./results) land here, not in the repo

  echo "== [check] tsfragment skeleton (ETTh1 @ op-point 9.0/10)"
  cli pretrain_vae --dataset_path ETTh1 --num_training_updates 6 \
      --batch_size 10 --inference_samples 4 --data_root ./Data
  cli train --dataset_name ETTh1 --data_root ./Data --batch_size 10 \
      --epochs 2 --total_step 10 --save_every 1
  cli infer --dataset_name ETTh1_24 --cfg_scale 9.0 --total_step 10 \
      --run_multi 1 --checkpoint_id 1 --batch_size 5 --max_batches 1 \
      --data_root ./Data
  cli evaluation --dataset_name ETTh1_24 --cfg_scale 9.0 \
      --total_step 10 --method_list MSE,WAPE,MRR,CRPS

  echo "== [check] sushi skeleton (stand-in length 96; real corpus 2048)"
  cli train --dataset_name SUSHI --data_root ./Data --batch_size 8 \
      --epochs 2 --total_step 10 --save_every 1
  cli infer --dataset_name SUSHI --cfg_scale 5.0 --total_step 10 \
      --run_multi 1 --checkpoint_id 1 --batch_size 4 --max_batches 1 \
      --data_root ./Data
  cli evaluation --dataset_name SUSHI --cfg_scale 5.0 --total_step 10 \
      --method_list MSE,WAPE,MRR,CRPS

  echo "== [check] mmd skeleton (Climate_24)"
  cli train --dataset_name MMD-Climate --data_root ./Data --batch_size 8 \
      --epochs 2 --total_step 10 --save_every 1
  cli infer --dataset_name MMD-Climate_24 --cfg_scale 5.0 \
      --total_step 10 --run_multi 1 --checkpoint_id 1 --batch_size 4 \
      --max_batches 1 --data_root ./Data
  cli evaluation --dataset_name MMD-Climate_24 --cfg_scale 5.0 \
      --total_step 10 --method_list MSE,WAPE,MRR,CRPS

  echo "== check PASSED (workdir kept at $work)"
}

case "$MODE" in
  --check|check) check_mode ;;
  tsfragment) run_tsfragment "$DATA_ROOT" ;;
  sushi) run_sushi "$DATA_ROOT" ;;
  mmd) run_mmd "$DATA_ROOT" ;;
  all) run_tsfragment "$DATA_ROOT"; run_sushi "$DATA_ROOT"
       run_mmd "$DATA_ROOT" ;;
  *) echo "usage: $0 {tsfragment|sushi|mmd|all|--check} [DATA_ROOT]" >&2
     exit 2 ;;
esac
