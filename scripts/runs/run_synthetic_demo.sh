#!/bin/bash
# End-to-end demo on the built-in synthetic ImageFolder (48 classes x 24
# images, generated on first use): full flagship loss set, full device-side
# augmentation, final prototype galleries.  Finishes in ~15 min on one v5e
# chip.  The horizon stops before the epoch-15 classifier warm restart: at
# flagship LR that restart collapses training on datasets this small
# (ROADMAP "Known behaviors") — real datasets use the CUB-190 script.
python -m pipnet_tpu.main \
  --log_dir ./runs/synthetic_demo \
  --dataset synthetic:48:24 \
  --net convnext_tiny_26 \
  --batch_size 64 --batch_size_pretrain 64 \
  --epochs 14 --epochs_pretrain 3 \
  --epochs_finetune_classifier 3 --epochs_finetune 5 --freeze_epochs 8 \
  --image_size 224 --seed 1 \
  --kernel_orth y --num_protos_per_descendant 0 --num_protos_per_child 10 \
  --align n --uni n --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --tanh_during_second_phase y \
  --softmax 'y|1' --weighted_ce_loss y --protopool n \
  --minimize_contrasting_set 'y|1|0.1' \
  --compute_dtype bfloat16 --fast_gelu y --use_pallas_head y \
  --eval_every 2 "$@"
