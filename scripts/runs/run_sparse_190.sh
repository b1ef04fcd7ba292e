#!/bin/bash
# Sparse-regime flagship (round-4 judge item #1): the reference's PRODUCT
# behavior — a classifier that sparsifies during training — at CUB-190
# scale on the hierarchical synthetic fixture (FIXTURE_VERSION 2).
#
# WHY A CONTINUATION RUN.  The reference reaches sparsity through
# classifier lr 0.05 with cosine warm restarts (run_pipnet.sh:56,
# run_pipnet_192.sh:85): NonNegLinear weights init at N(1.0, 0.1) and
# the weighted-NLL gradient pushes never-useful prototype->class
# connections below zero, where relu(W) kills them permanently
# (pipnet/pipnet.py:1035) — an absorbing boundary the weights only reach
# when the Adam step size (~lr) is large.  The round-3 survival recipe
# (lr 0.001 flat == eta_min) therefore produced ZERO sparsity
# (3768/3780 nonzero).  But lr 0.05 FROM SCRATCH is measured-dead on
# this sandbox's forced random-init regime — three archived attempts,
# each with the v2 fixture and the full stabilizer quartet:
#   runs/ablations_r4/pretrain_lrblock5e4_collapse — reference
#     lr_block 5e-4 kills PRETRAIN by epoch 3 (tanh(sum pooled)~0.015,
#     dead prototypes before classification ever starts);
#   runs/ablations_r4/sparse190_finetune4_collapse — lr 0.05 with
#     epochs_finetune 4: class-loss-only add-on epoch collapses each
#     node's softmax onto the hot classifier's picks; full loss finds
#     dead prototypes (tanh 1.9->3.3, fine-acc -> chance);
#   runs/ablations_r4/sparse190_scratch_lr05_collapse — the reference's
#     own finetune 0 schedule (run_pipnet_192.sh:76): the full-loss
#     transition itself kills the prototypes (same signature), and at
#     presence lr 0.05 the mask-L1 prunes ALL presence logits within 2
#     epochs (mask_l1 0.09 -> 0.0, overspecificity term identically 0),
#     removing the mask-prune escape hatch the lr-0.001 run used; grad
#     norm 105 -> 455 over 10 epochs with every secondary loss flatlined.
# The reference never faces this: it sparsifies a WORKING ImageNet-
# pretrained representation.  The honest analog in this sandbox is to
# sparsify OUR working representation: resume the 6.3%-top-1 survival
# artifact (runs/full_phase_190, 40 epochs) and train 20 further epochs
# at the reference classifier lr 0.05 with warm restarts.
#
# A fourth measured arm fixed the phase: with the ADD-ONS still live
# (lr_block*10 = 1e-3) the hot sparse classifier's class gradient
# concentrates each node's softmax mass and the prototype-death cascade
# returns after exactly two epochs — which were spectacular (top-1 5.2%
# -> 9.8%, nonzero prototypes 3780 -> 2887) before tanh went 0.4 -> 3.2
# and acc fell to chance (runs/ablations_r4/
# sparse190_cont_addons_live_collapse, epochs 53-57).  So the
# continuation runs in the reference's own finetune_classifier phase
# (main.py:523-626: epoch <= epochs_finetune_classifier trains ONLY the
# classifier + presence logits): the representation is frozen,
# prototypes cannot die, and the classifier sparsifies against fixed
# pooled features — PIP-Net's original sparse-classifier training mode,
# driven by the same weighted NLL + relu(W) absorbing boundary.
#
# Usage: cp -r runs/full_phase_190 runs/sparse_190 && bash this script.
python -m pipnet_tpu.main \
  --log_dir ./runs/sparse_190 \
  --dataset synthetic:190:48 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 96 \
  --epochs 60 --epochs_pretrain 12 \
  --epochs_finetune_classifier 60 --epochs_finetune 0 \
  --epochs_finetune_mask_prune 60 --freeze_epochs 8 \
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
  --eval_every 5 --checkpoint_every 5 --resume "$@"
