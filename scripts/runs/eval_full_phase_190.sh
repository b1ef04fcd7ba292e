#!/bin/bash
# Post-hoc evaluation sweep over a full-phase 190-class artifact
# (default: the sparse-regime flagship, scripts/runs/run_sparse_190.sh):
# the reference's notebook-driven analyses as evaluate-CLI invocations.
#   1. plain eval report + OOD FPR/ID-fraction (test_nb.py /
#      pipnet/test.py:242-292, OOD_checking.ipynb — the OOD fixture is a
#      DIFFERENT-seed synthetic set, disjoint class cues) + threshold
#      pruning accuracy-vs-threshold SWEEP with the reference's
#      leaf-parent-node exemption (prune_by_threshold.ipynb cells 11-14)
#      + prototype report + node-scoped hierarchy galleries at real tree
#      scale (util/vis_hpipnet.py:184-389),
#   2. the round-4 non-reference pruning criterion (leaf parents pruned
#      too) at 0.4 for the A/B that root-causes the 19.2%->4.0% collapse,
#   3. masked decode with one fixed Gumbel draw and the degenerate-node
#      fallback (distribution_over_furthest_descendents with
#      apply_overspecificity_mask=True, util/node.py:336-361),
#   4. leave-out-classes decode (calc_acc_LOU.ipynb surface; top1 on a
#      model trained on ALL classes is ~0 by construction — the
#      meaningful LOU number comes from the run_lou_190.sh artifact,
#      see ROADMAP LOU note).
# Ends by archiving the run's small artifacts into tracked artifacts/
# (round-4 lesson: the sweep's outputs lived only in gitignored runs/).
set -e
RUN_DIR=${1:-./runs/sparse_190}
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --OOD_dataset synthetic:20:24:s9 \
  --threshold_prune 0.1,0.2,0.3,0.4,0.5 \
  --galleries_nodes auto:6
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --threshold_prune 0.4 --prune_leaf_parents --skip_per_node
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --apply_overspecificity_mask --fixed_mask_seed 0 --skip_per_node
python -m pipnet_tpu.evaluate --run_dir "$RUN_DIR" \
  --leave_out_classes configs/leave_out_synthetic190.txt --skip_per_node
bash "$(dirname "$0")/../archive_run.sh" "$RUN_DIR"
