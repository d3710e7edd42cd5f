#!/bin/sh
# T2S training + tuned op-point sweep (reference scripts/script.sh:2-50 —
# same per-dataset (cfg_scale, total_step) operating points).
set -e

python -m t2ms_tpu.cli.train --dataset_name exchangerate
python -m t2ms_tpu.cli.infer --dataset_name exchangerate_24 --cfg_scale 7.0 --total_step 100
python -m t2ms_tpu.cli.infer --dataset_name exchangerate_48 --cfg_scale 12.0 --total_step 60
python -m t2ms_tpu.cli.infer --dataset_name exchangerate_96 --cfg_scale 5.0 --total_step 100
python -m t2ms_tpu.cli.evaluation --dataset_name exchangerate_24 --cfg_scale 7.0 --total_step 100
python -m t2ms_tpu.cli.evaluation --dataset_name exchangerate_48 --cfg_scale 12.0 --total_step 60
python -m t2ms_tpu.cli.evaluation --dataset_name exchangerate_96 --cfg_scale 5.0 --total_step 100

python -m t2ms_tpu.cli.train --dataset_name electricity
python -m t2ms_tpu.cli.infer --dataset_name electricity_24 --cfg_scale 5.0 --total_step 60
python -m t2ms_tpu.cli.infer --dataset_name electricity_48 --cfg_scale 5.0 --total_step 10
python -m t2ms_tpu.cli.infer --dataset_name electricity_96 --cfg_scale 13.0 --total_step 30
python -m t2ms_tpu.cli.evaluation --dataset_name electricity_24 --cfg_scale 5.0 --total_step 60
python -m t2ms_tpu.cli.evaluation --dataset_name electricity_48 --cfg_scale 5.0 --total_step 10
python -m t2ms_tpu.cli.evaluation --dataset_name electricity_96 --cfg_scale 13.0 --total_step 30

python -m t2ms_tpu.cli.train --dataset_name traffic
python -m t2ms_tpu.cli.infer --dataset_name traffic_24 --cfg_scale 5.0 --total_step 100
python -m t2ms_tpu.cli.infer --dataset_name traffic_48 --cfg_scale 5.0 --total_step 10
python -m t2ms_tpu.cli.infer --dataset_name traffic_96 --cfg_scale 5.0 --total_step 30
python -m t2ms_tpu.cli.evaluation --dataset_name traffic_24 --cfg_scale 5.0 --total_step 100
python -m t2ms_tpu.cli.evaluation --dataset_name traffic_48 --cfg_scale 5.0 --total_step 10
python -m t2ms_tpu.cli.evaluation --dataset_name traffic_96 --cfg_scale 5.0 --total_step 30

python -m t2ms_tpu.cli.train --dataset_name ETTh1
for L in 24 48 96; do
  python -m t2ms_tpu.cli.infer --dataset_name ETTh1_${L} --cfg_scale 9.0 --total_step 10
  python -m t2ms_tpu.cli.evaluation --dataset_name ETTh1_${L} --cfg_scale 9.0 --total_step 10
done
