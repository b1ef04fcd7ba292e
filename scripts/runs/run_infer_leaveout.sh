#!/bin/bash
# Single-chip leave-one-out inference config (counterpart of run_pipnet_infer.sh).
python -m pipnet_tpu.main \
  --log_dir ./runs/cub18_infer \
  --dataset CUB-18 \
  --net convnext_tiny_26 \
  --batch_size 64 --epochs 60 --epochs_pretrain 10 \
  --image_size 224 \
  --phylo_config ./configs/cub18_phylogeny.yaml \
  --leave_out_classes ./configs/leave_out_classes.txt \
  --softmax 'y|1' --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --weighted_ce_loss y --protopool n --num_protos_per_child 10 \
  --data_parallel 1 "$@"
