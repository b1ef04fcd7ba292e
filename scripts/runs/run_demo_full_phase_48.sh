#!/bin/bash
# Full phase-schedule demo at gallery scale: 48 synthetic classes x 48
# images through EVERY phase transition (pretrain -> finetune_classifier
# -> finetune -> frozen -> full unfreeze -> mask-prune loss (epoch 20) ->
# mask_only tail (35-40)) with weighted sampling — the same machine as
# scripts/runs/run_full_phase_190.sh (reference main.py:521-626) but at
# <=60 classes so the final per-node prototype galleries run too
# (reference gates visualization the same way, main.py:835-866).
#
# Uses the random-init stabilizer quartet measured on the 190-class
# ladder (see run_full_phase_190.sh for the per-guard forensics):
# clip_grad 2.0, flat classifier lr (== eta_min), unfreeze warmup,
# tanh_eps/align_eps 1e-2 log floors, lr_net 1e-6 (deep backbone ~20x
# below the measured ~2e-5 kill threshold).  48 imgs/class (vs the
# 15-min demo's 24) for headroom over runs/demo_final's 21.4% top-1.
# Post-run:
#   python -m pipnet_tpu.evaluate --run_dir ./runs/demo_full_48
#   python -m pipnet_tpu.evaluate --run_dir ./runs/demo_full_48 \
#     --apply_overspecificity_mask
python -m pipnet_tpu.main \
  --log_dir ./runs/demo_full_48 \
  --dataset synthetic:48:48 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 96 \
  --epochs 40 --epochs_pretrain 12 \
  --epochs_finetune_classifier 2 --epochs_finetune 4 \
  --epochs_finetune_mask_prune 34 --freeze_epochs 8 \
  --lr 0.001 --lr_block 0.0001 --lr_net 0.000001 \
  --clip_grad 2.0 --clip_grad_per_group y \
  --unfreeze_warmup_epochs 5 --tanh_eps 0.01 --align_eps 0.01 \
  --image_size 224 --seed 1 \
  --kernel_orth y --num_protos_per_descendant 0 --num_protos_per_child 10 \
  --align n --uni n --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --tanh_during_second_phase y \
  --softmax 'y|1' --weighted_ce_loss y --protopool n \
  --mask_prune_overspecific 'y|20|1.1' --minimize_contrasting_set 'y|1|0.1' \
  --weighted_loss \
  --compute_dtype bfloat16 --fast_gelu y --use_pallas_head y \
  --eval_every 5 --checkpoint_every 5 "$@"
