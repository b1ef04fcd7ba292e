#!/bin/bash
# Post-hoc evaluation sweep over the full-phase 190-class artifact
# (scripts/runs/run_full_phase_190.sh): the reference's notebook-driven
# analyses as three evaluate-CLI invocations.
#   1. plain eval report (test_nb.py / pipnet/test.py surface),
#   2. masked decode with the degenerate-node fallback
#      (prune_by_threshold + distribution_over_furthest_descendents
#       apply_overspecificity_mask=True, util/node.py:336-361),
#   3. leave-out-classes decode (calc_acc_LOU.ipynb surface; top1 on a
#      model trained on ALL classes is ~0 by construction — the run
#      demonstrates the decode short-circuit, see ROADMAP LOU note).
set -e
RUN_DIR=${1:-./runs/full_phase_190}
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR"
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --apply_overspecificity_mask --fixed_mask_seed 0
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --leave_out_classes configs/leave_out_synthetic190.txt
