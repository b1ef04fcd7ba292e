#!/bin/bash
# Leave-out-classes TRAINED run (round-4 judge item #3): the reference's
# run_pipnet_infer.sh scenario — train WITH --leave_out_classes so the 5
# held-out species are filtered from the training sampler
# (ref util/data.py:516-523), then measure (a) held-in top-1 with the
# plain decode and (b) generalization to the never-seen species with the
# LOU decode short-circuit (calc_acc_LOU.ipynb surface,
# util/node.py:319-325).  Post-hoc LOU on an all-class model is ~0 by
# construction (ROADMAP round-3 note); THIS run is the meaningful
# measurement.
#
# No --weighted_loss: train-time LOU and weighted sampling are mutually
# exclusive (ref util/data.py:483-484, enforced in data/loader.py).
#
# ROUND-5 CORRECTION: the committed round-4 version of this script used
# the sparse flagship's classifier lr 0.05 FROM SCRATCH — the regime
# three archived collapse arms measured dead (run_sparse_190.sh header);
# its first execution ground at the tanh-3.2 plateau with prototypes
# dying (nonzero 3780->3295 by train epoch 10).  The LOU measurement
# needs a WORKING model, so this run uses the survival recipe the
# full-phase flagship actually trained with (runs/full_phase_190
# metadata: lr 0.001, 40 epochs) + train-time class filtering.
# Post-run:
#   python -m pipnet_tpu.evaluate --run_dir ./runs/lou_190
#   python -m pipnet_tpu.evaluate --run_dir ./runs/lou_190 \
#     --leave_out_classes configs/leave_out_synthetic190.txt
python -m pipnet_tpu.main \
  --log_dir ./runs/lou_190 \
  --dataset synthetic:190:48 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 96 \
  --epochs 40 --epochs_pretrain 12 \
  --epochs_finetune_classifier 2 --epochs_finetune 4 \
  --epochs_finetune_mask_prune 34 --freeze_epochs 8 \
  --lr 0.001 --lr_block 0.0001 --lr_net 0.000001 \
  --clip_grad 2.0 --clip_grad_per_group y \
  --unfreeze_warmup_epochs 5 --tanh_eps 0.01 --align_eps 0.01 \
  --image_size 224 --seed 1 \
  --leave_out_classes ./configs/leave_out_synthetic190.txt \
  --kernel_orth y --num_protos_per_descendant 0 --num_protos_per_child 10 \
  --align n --uni n --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --tanh_during_second_phase y \
  --softmax 'y|1' --weighted_ce_loss y --protopool n \
  --mask_prune_overspecific 'y|20|1.1' --minimize_contrasting_set 'y|1|0.1' \
  --compute_dtype bfloat16 --fast_gelu y --use_pallas_head y \
  --eval_every 10 --checkpoint_every 10 --final_viz n "$@"
