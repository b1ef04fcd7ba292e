#!/bin/bash
# Post-hoc evaluation sweep over a full-phase 190-class artifact
# (default: the sparse-regime flagship, scripts/runs/run_sparse_190.sh):
# the reference's notebook-driven analyses as evaluate-CLI invocations.
#   1. plain eval report + OOD FPR/ID-fraction (test_nb.py /
#      pipnet/test.py:242-292, OOD_checking.ipynb — the OOD fixture is a
#      DIFFERENT-seed synthetic set, disjoint class cues) + threshold
#      pruning before/after accuracy + prototype report
#      (prune_by_threshold.ipynb cells 11-14) + node-scoped hierarchy
#      galleries at real tree scale (util/vis_hpipnet.py:184-389),
#   2. masked decode with one fixed Gumbel draw and the degenerate-node
#      fallback (distribution_over_furthest_descendents with
#      apply_overspecificity_mask=True, util/node.py:336-361),
#   3. leave-out-classes decode (calc_acc_LOU.ipynb surface; top1 on a
#      model trained on ALL classes is ~0 by construction — the
#      meaningful LOU number comes from the run_lou_190.sh artifact,
#      see ROADMAP LOU note).
set -e
RUN_DIR=${1:-./runs/sparse_190}
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --OOD_dataset synthetic:20:24:s9 \
  --threshold_prune 0.4 \
  --galleries_nodes auto:6
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --apply_overspecificity_mask --fixed_mask_seed 0 --skip_per_node
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --leave_out_classes configs/leave_out_synthetic190.txt --skip_per_node
