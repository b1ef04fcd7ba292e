#!/bin/bash
# Ablation configs (counterparts of run_pipnet_wo_al_tanh.sh / run_pipnet_no_orth.sh).
case "$1" in
  no_align_tanh) shift; bash "$(dirname "$0")/run_cub190.sh" --align_pf n --tanh n \
      --log_dir ./runs/cub190_wo_al_tanh "$@";;
  no_orth)       shift; bash "$(dirname "$0")/run_cub190.sh" --kernel_orth n \
      --log_dir ./runs/cub190_no_orth "$@";;
  *) echo "usage: $0 {no_align_tanh|no_orth} [extra flags]"; exit 1;;
esac
