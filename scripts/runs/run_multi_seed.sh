#!/bin/bash
# Multi-seed reproducibility runs (counterpart of
# run_pipnet_20protos_multi_runs_seed{42,102,214,777}.sh).
for seed in 42 102 214 777; do
  bash "$(dirname "$0")/run_cub190.sh" --seed "$seed" \
    --log_dir "./runs/cub190_seed${seed}"
done
