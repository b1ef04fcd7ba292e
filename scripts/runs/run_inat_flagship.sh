#!/bin/bash
# Flagship INAT-BIRDS HComP-Net training (counterpart of run_pipnet.sh:47-103).
# Data parallel over every visible chip replaces torchrun --nproc_per_node=8.
python -m pipnet_tpu.main \
  --log_dir ./runs/inat_flagship \
  --dataset INAT-BIRDS \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 96 \
  --epochs 60 --epochs_pretrain 3 \
  --epochs_finetune 0 --epochs_finetune_classifier 3 \
  --epochs_finetune_mask_prune 60 --freeze_epochs 10 \
  --lr 0.05 --lr_block 0.0005 --lr_net 0.0005 --weight_decay 0.0 \
  --image_size 224 --seed 1 \
  --phylo_config ./configs/inat_bird_phylogeny.yaml \
  --kernel_orth y --num_features 0 \
  --num_protos_per_descendant 0 --num_protos_per_child 10 \
  --align n --uni n --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --tanh_during_second_phase y --sg_before_masking y \
  --softmax 'y|1' --weighted_ce_loss y --protopool n \
  --classifier NonNegative --pipnet_sparsity y \
  --mask_prune_overspecific n --minimize_contrasting_set y \
  --cl_weight 2.0 \
  --compute_dtype bfloat16 --data_parallel 0 "$@"
