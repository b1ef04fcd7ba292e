#!/bin/bash
# Sparse-regime flagship (round-4 judge item #1): the reference's PRODUCT
# behavior — a classifier that sparsifies during training — at CUB-190
# scale on the hierarchical synthetic fixture (FIXTURE_VERSION 2).
#
# The reference reaches sparsity through classifier lr 0.05 with cosine
# warm restarts (run_pipnet.sh:56, run_pipnet_192.sh:85 — lr 0.05,
# lr_block/lr_net 5e-4, weight_decay 0): NonNegLinear weights init at
# N(1.0, 0.1) and the weighted-NLL gradient pushes never-matching
# prototype->class connections negative, where relu(W) kills them
# permanently (pipnet/pipnet.py:1035).  The round-3 survival recipe
# (lr 0.001 flat == eta_min, lr_net 1e-6) disabled exactly those
# dynamics: 3768/3780 prototypes stayed nonzero.  This run restores the
# reference lrs on the v2 fixture (whose node-aligned markers remove the
# prototype-death cascade that was root-caused to the v1 fixture, see
# ROADMAP round-3), keeping the four random-init stabilizers (clip,
# per-group clip, unfreeze warmup, eps floors) whose necessity the
# ablation sweep (scripts/runs/run_ablations_r4.sh) quantifies.
#
# Schedule follows run_pipnet_192.sh:73-78 in shape: pretrain 10,
# finetune_classifier 3, mask-prune loss from epoch 20, mask-only tail
# for the last 10 epochs (reference: 60->75).
#
# epochs_finetune 0 matches the reference's OWN CUB-190 recipe
# (run_pipnet_192.sh:76).  The second collapse attempt (epochs_finetune 4,
# runs/ablations_r4/sparse190_finetune4_collapse) showed why that matters
# at classifier lr 0.05: three classifier-only epochs plus ONE epoch of
# add-ons trained by the class loss alone (no tanh/align protection)
# collapse each node's softmax mass onto the few prototypes the hot
# classifier already picked; the full loss then finds dead prototypes
# (train epoch 15: tanh -log(tanh(sum pooled)+0.01)=1.9->3.3, tanh_desc
# saturated at 4.59, grad_norm 48, fine-acc 1.3% -> 0.45% = chance).
# With finetune 0 the full loss (tanh keeps prototypes alive) engages
# right after the classifier-only epochs, as the reference does.
#
# lr_block/lr_net stay at the random-init survival values (1e-4 / 1e-6):
# the first attempt at full reference lrs (lr_block 5e-4 -> add-ons 5e-3)
# killed PRETRAIN by epoch 3 even on the v2 fixture — tanh saturated at
# -log(0.01 + 0.015) (sum-over-batch pooled ~0.015: dead prototypes) and
# align_pf at its floor, grad_norm 3.2 -> 0.75 (saturation), measured in
# runs/ablations_r4/pretrain_lrblock5e4_collapse.  The reference runs
# those lrs on an ImageNet-pretrained backbone (main.py:319-348), a
# regime this sandbox cannot reach (no torchvision weights, zero egress).
# The SPARSITY dynamics live in the classifier lr, restored here in full.
python -m pipnet_tpu.main \
  --log_dir ./runs/sparse_190 \
  --dataset synthetic:190:48 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 96 \
  --epochs 60 --epochs_pretrain 10 \
  --epochs_finetune_classifier 3 --epochs_finetune 0 \
  --epochs_finetune_mask_prune 50 --freeze_epochs 8 \
  --lr 0.05 --lr_block 0.0001 --lr_net 0.000001 \
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
