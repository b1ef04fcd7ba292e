#!/bin/bash
# CUB-190 HComP-Net training (counterpart of run_pipnet_192.sh): 85 epochs,
# 20 protos per child, mask pruning + contrasting-set minimization.
python -m pipnet_tpu.main \
  --log_dir ./runs/cub190 \
  --dataset CUB-190 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 128 \
  --epochs 85 --epochs_pretrain 10 \
  --epochs_finetune 0 --epochs_finetune_classifier 3 \
  --epochs_finetune_mask_prune 60 --freeze_epochs 10 \
  --lr 0.05 --lr_block 0.0005 --lr_net 0.0005 \
  --image_size 224 --seed 1 \
  --phylo_config ./configs/cub190_phylogeny.yaml \
  --kernel_orth y --num_protos_per_descendant 0 --num_protos_per_child 20 \
  --align n --uni n --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --tanh_during_second_phase y \
  --softmax 'y|1' --weighted_ce_loss y --protopool n \
  --mask_prune_overspecific 'y|30|1.1' --minimize_contrasting_set 'y|1|0.1' \
  --cl_weight 4.0 \
  --compute_dtype bfloat16 --data_parallel 0 "$@"
