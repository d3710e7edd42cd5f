#!/bin/sh
# T2MS cfg x steps x 10-run sweep (reference command.bash:1-7).
set -e
for cfg in 3 7 10; do
  for steps in 100 1000 10000; do
    python -m t2ms_tpu.cli.myinfer --cfg_scale "$cfg" \
        --total_step "$steps" --run_time 10
  done
done
