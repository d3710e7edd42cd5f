#!/bin/sh
# Re-run evaluation against saved generations (reference
# scripts/scripts_validation_only.sh:1-18 — the "Quick Reproduce" path).
set -e
for spec in "exchangerate_24 7.0 100" "exchangerate_48 12.0 60" \
            "exchangerate_96 5.0 100" "electricity_24 5.0 60" \
            "electricity_48 5.0 10" "electricity_96 13.0 30" \
            "traffic_24 5.0 100" "traffic_48 5.0 10" "traffic_96 5.0 30" \
            "ETTh1_24 9.0 10" "ETTh1_48 9.0 10" "ETTh1_96 9.0 10"; do
  set -- $spec
  python -m t2ms_tpu.cli.evaluation --dataset_name "$1" \
      --cfg_scale "$2" --total_step "$3"
done
