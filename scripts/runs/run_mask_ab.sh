#!/bin/bash
# Masked-decode A/B (round-5 judge item #3): why does the overspecificity
# mask cost 42% of accuracy (19.2% -> 11.1%) on the sparse flagship?
#
# Root-cause hypothesis (quantified from the loss math,
# losses/catalog.py:overspecificity_losses): the keep-score is a PRODUCT
# over in-batch leaf descendants of the batch-max pooled activation
# (ref pipnet/train.py:965-1008).  The presence logit's gradient is
# ~(2*score - 0.5), so a prototype is kept only while score > 0.25.  At a
# 190-leaf tree's shallow nodes a child has ~30+ distinct in-batch leaf
# descendants per epoch, so score ~= q^30 for per-leaf max q: even q=0.9
# gives 0.04 << 0.25 — the product decays EXPONENTIALLY in fan-out and
# shallow-node presence dies regardless of prototype quality (the
# flagship's prototype_report shows root PresenceKeep 3/20).  The
# reference never sees this: its trees are 18-27 leaves (fan-out ~5-10
# in-batch descendants), where q^n stays above 0.25 for good prototypes.
#
# Two reference-provided levers counteract the decay; each arm continues
# the sparse flagship (runs/sparse_190, internal epoch 60) for 15 more
# classifier-only epochs with ONE lever changed:
#   geo     — geometric-mean score (ref variant): score = exp(mean log q),
#             fan-out-independent, keep iff typical q > 0.25.
#   boost13 — boost 1.3 (ref mask_prune DSL): factors >= 0.77 clamp to 1,
#             so only genuinely weak leaves shrink the product.
# Post-run per arm:
#   python -m pipnet_tpu.evaluate --run_dir runs/mask_ab/<arm> --skip_per_node
#   python -m pipnet_tpu.evaluate --run_dir runs/mask_ab/<arm> \
#     --apply_overspecificity_mask --fixed_mask_seed 0 --skip_per_node
set -e
BASE=${BASE:-./runs/sparse_190}
# EPOCHS must exceed the base's recorded internal epoch (60 after the
# round-4 schedule, 90 after the round-5 extension) by the 15-epoch arm
EPOCHS=${EPOCHS:-75}
COMMON="--dataset synthetic:190:48 --net convnext_tiny_26
  --batch_size 64 --batch_size_pretrain 96
  --epochs $EPOCHS --epochs_pretrain 12
  --epochs_finetune_classifier $EPOCHS --epochs_finetune 0
  --epochs_finetune_mask_prune $EPOCHS --freeze_epochs 8
  --lr 0.05 --lr_block 0.0001 --lr_net 0.000001
  --clip_grad 2.0 --clip_grad_per_group y
  --unfreeze_warmup_epochs 5 --tanh_eps 0.01 --align_eps 0.01
  --image_size 224 --seed 1
  --kernel_orth y --num_protos_per_descendant 0 --num_protos_per_child 10
  --align n --uni n --align_pf y --tanh y --tanh_desc y|0.05
  --tanh_during_second_phase y
  --softmax y|1 --weighted_ce_loss y --protopool n
  --minimize_contrasting_set y|1|0.1
  --weighted_loss
  --compute_dtype bfloat16 --fast_gelu y --use_pallas_head y
  --eval_every $EPOCHS --checkpoint_every 15 --final_viz n --resume"

run_arm () {
  local name=$1; shift
  local dir=./runs/mask_ab/$name
  if [ -f "$dir/DONE" ]; then echo "=== arm $name already done"; return; fi
  mkdir -p "$dir/checkpoints"
  cp -r "$BASE/checkpoints/net_trained_last" "$dir/checkpoints/"
  cp -r "$BASE/metadata" "$dir/" 2>/dev/null || true
  echo "=== mask_ab arm $name: $*"
  python -m pipnet_tpu.main --log_dir "$dir" $COMMON "$@" && touch "$dir/DONE"
}

run_arm geo     --mask_prune_overspecific 'y|20|1.1' \
                --geometric_mean_overspecificity_score y
run_arm boost13 --mask_prune_overspecific 'y|20|1.3'
