#!/bin/bash
# One guarded attempt at sparsity under the REAL reference schedule
# (round-5 judge item #5): add-ons LIVE while the hot (lr 0.05,
# warm-restart) classifier sparsifies — the phase interaction the fourth
# collapse arm measured (runs/ablations_r4/sparse190_cont_addons_live_
# collapse: two spectacular epochs, top-1 5.2% -> 9.8%, nonzero 3780 ->
# 2887, then tanh 0.4 -> 3.2 and chance).
#
# Mitigation under test (one lever, per the verdict): lr_block cut 10x
# (1e-4 -> 1e-5) for the hot-classifier window, so the class gradient
# reaching the add-ons per step shrinks by ~10x while the classifier
# still takes its full sparsifying steps.  Mask-prune stays active from
# the start of the continuation (epoch > 20) so dying prototypes can be
# absorbed by the presence mask instead of cascading.
#
# Continuation base: runs/full_phase_190 (internal epoch 40).
# epochs_finetune_classifier/finetune 0 puts every continuation epoch in
# the TRAIN phase (train/optimizer.py:phase_for_epoch): classifier at
# lr 0.05 warm-restarts, add-ons at lr_block, backbone at lr_net ~ 0 —
# the reference's post-finetune schedule (main.py:521-626) where the
# fourth collapse arm died.
set -e
BASE=${BASE:-./runs/full_phase_190}
DIR=./runs/real_schedule_guard
if [ -f "$DIR/DONE" ]; then echo "already done"; exit 0; fi
mkdir -p "$DIR/checkpoints"
cp -r "$BASE/checkpoints/net_trained_last" "$DIR/checkpoints/"
cp -r "$BASE/metadata" "$DIR/" 2>/dev/null || true
python -m pipnet_tpu.main \
  --log_dir "$DIR" \
  --dataset synthetic:190:48 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 96 \
  --epochs 60 --epochs_pretrain 12 \
  --epochs_finetune_classifier 0 --epochs_finetune 0 \
  --epochs_finetune_mask_prune 999999 --freeze_epochs 8 \
  --lr 0.05 --lr_block 0.00001 --lr_net 0.000001 \
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
  --eval_every 5 --checkpoint_every 5 --resume "$@" && touch "$DIR/DONE"
