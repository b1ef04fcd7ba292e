#!/bin/bash
# Full phase-schedule exercise at CUB-190 scale (round-2 judge next #5):
# 190 synthetic classes through EVERY phase transition — pretrain ->
# finetune_classifier -> finetune -> frozen backbone -> full ->
# mask-prune loss (epoch 20) -> mask_only tail (epochs 35-40) — with
# weighted sampling active, matching the phase machine of the reference
# driver (main.py:521-626).  (Training-time leave-out is mutually
# exclusive with weighted sampling, ref util/data.py:483-484 — LOU is
# exercised post-hoc via the evaluate CLI decode short-circuit.)
#
# Collapse-safe recipe (all measured on this dataset family):
# - --clip_grad 2.0 + flat classifier lr 0.001 (== the schedule's
#   eta_min, so the cosine warm restarts are value-identical no-ops):
#   one guard per measured failure mode.  EVERY lr/phase discontinuity
#   kills a random-init run — measured four ways: classifier warm
#   restart at lr 0.01 (loss 2.97 -> 141 at the T_0=10 restart), at
#   lr 0.003 (3.0 -> 3.88 -> 132, one epoch later), at lr 0.01 WITH
#   clip 2.0 (3.05 -> 66 -> 138: raw grad_norm 158 at the restart —
#   clipping bounds each step but a whole epoch of misdirected clipped
#   steps still kills it); and the FULL backbone unfreeze at flat
#   classifier lr but NO clip (11.6 -> 138 at train epoch 9).  With
#   clip 2.0 the unfreeze transition survives (measured: grad 2.15,
#   accuracy kept climbing), so the flat classifier removes the one
#   remaining discontinuity.  Mechanism: the shock makes some
#   prototypes stop activating anywhere and the -log(tanh(pooled)+EPS)
#   gradients (~1/pooled; EPS=1e-12 under min_contrast's rebinding
#   quirk) spiral — same math as the reference, pipnet/train.py:1108-1123,
#   which always starts from ImageNet weights and never sees the
#   random-init regime this sandbox is stuck in (and raises on the NaN
#   rather than guarding, pipnet/train.py:1126-1128).
# - backbone/block lr 1e-4 and 48 imgs/class (with 5e-4 / 24 imgs/class
#   the first FULL-unfreeze epoch blows up even harder).
# - --unfreeze_warmup_epochs 5: clip 2.0 alone got the unfreeze EPOCH
#   through (grad 2.1, accuracy climbing) but the run still died one
#   epoch later (measured: raw grad 59 -> 100 at train epoch 10,
#   align_pf 0.23 -> 19, accuracy 4.2% -> 0.5%): at the unfreeze the
#   backbone's Adam moments are fresh, and bias-corrected Adam moves
#   every deep parameter ~lr_net per step regardless of gradient size —
#   a whole epoch of that erases the learned features even with each
#   step clipped.  Ramping the deep-backbone lr 0 -> lr_net over 5
#   epochs lets the moments calibrate first (OptimConfig.
#   unfreeze_warmup_epochs; not in the reference, which always starts
#   from ImageNet weights).
# - 12 pretrain epochs (cheap: ~25 s each with the device-resident data
#   cache) for stronger prototype alignment before classification.
# - --tanh_eps 0.01: the three guards above got the unfreeze EPOCH
#   through, but the run still collapsed mid-warmup (train epoch 11:
#   loss 3.0 -> 82 -> 136, acc 5% -> 0.5%; runs/full_phase_190_refeps_
#   collapse).  Forensics: tanh_desc sat at 20.4 (-> -log(1e-12)=27.6
#   saturated) BEFORE the collapse — unsatisfied descendant terms carry
#   a 1/(x+1e-12) ~ 5e8 gradient whose direction dominates every
#   clipped step once the backbone thaws.  Bounding the log epsilon at
#   1e-2 caps that gradient at 100 (LossConfig.tanh_eps; default None
#   keeps reference-exact 1e-8/1e-12 semantics).
# - --align_eps 0.01: with tanh_eps bounded the run STILL collapsed two
#   epochs into the unfreeze warmup (train epochs 10-12: loss 2.2 -> 10
#   -> 97, fine acc 4.8% -> 0.4%; runs/full_phase_190 metrics_train
#   epochs 21-24).  Forensics: align_pf 0.23 -> 17.9 -> 19.2 (x5 weight
#   ~= the entire 97-104 plateau) — once the thawing backbone
#   decorrelates the two views' softmaxed maps, the CARL term's
#   -log(ip + 1e-12) gradient (~1/ip, measured ip ~ e^-19 ~ 5.6e-9,
#   so ~2e8 per patch) dominates every clipped step and the run never
#   recovers.  Same 1e-2 log-floor as tanh_eps, applied to the term
#   that actually exploded (LossConfig.align_eps; default None keeps
#   reference-exact 1e-12 semantics).
# - --lr_net 1e-6: the eps floors stopped the loss EXPLOSION but the
#   fifth attempt still died at the same place (train epochs 10-11:
#   acc 4.1% -> 0.5%, every bounded log term saturating at -log(1e-2);
#   runs/full_phase_190_warmup_collapse).  Kill ladder for deep-backbone
#   lr: 5e-4, 1e-4, 1e-4+clip, 1e-4+clip+warmup(+eps floors) — all dead
#   within 1-2 epochs of the thaw.  1e-6 was chosen ~20x below that
#   apparent threshold — and the run STILL collapsed at the same epoch,
#   which led to the controlled A/B that settled it (next bullet).
# - THE ACTUAL ROOT CAUSE (probe: identical run with freeze_epochs 40,
#   i.e. never unfreeze, collapses at the same epoch with the same
#   signature — runs/probe_nounfreeze_collapse): the collapse was never
#   the unfreeze.  It is a prototype-death cascade inherent to training
#   this loss set on a NON-HIERARCHICAL fixture: with only per-class
#   cues and a random tree, most of tanh_desc's per-(child, leaf)
#   descendant terms are unsatisfiable (td sat pinned at its saturation
#   value from the first full-loss epoch in every run), the dying terms'
#   gradients grow into the clip budget, and ~5 epochs of full-loss
#   training tip it over (gn 1.1 -> 12.8 in ONE epoch with zero
#   trainability change).  Fix: the fixture now generates the phylogeny
#   FIRST and stamps every image with one marker per internal-node
#   ancestor (data/synthetic.py FIXTURE_VERSION 2), so every
#   descendant-product term has a real shared trait to bind to — the
#   assumption the reference's real phylogenetic datasets satisfy
#   through inherited morphology.
# - --clip_grad_per_group y: decouples the groups' step sizes — during
#   the cascade the global clip factor let the exploding tanh-side
#   gradients shrink the classifier/tail steps 5-10x exactly when
#   tracking was needed (and at the unfreeze, the thawed backbone's
#   noisy gradient norm does the same to every other group).  Per-group
#   norms also mirror the reference's two-optimizer split more closely.
# checkpoint_every 5: the tunneled backend's device->host fetch can
# degrade to ~8 MB/s, making the reference's every-epoch ~400 MB save
# the bottleneck (and once, a wedged fetch hung the run mid-save).
# Post-run:
#   python -m pipnet_tpu.evaluate --run_dir ./runs/full_phase_190 \
#     --leave_out_classes configs/leave_out_synthetic190.txt
#   python -m pipnet_tpu.evaluate --run_dir ./runs/full_phase_190 \
#     --apply_overspecificity_mask
python -m pipnet_tpu.main \
  --log_dir ./runs/full_phase_190 \
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
  --kernel_orth y --num_protos_per_descendant 0 --num_protos_per_child 10 \
  --align n --uni n --align_pf y --tanh y --tanh_desc 'y|0.05' \
  --tanh_during_second_phase y \
  --softmax 'y|1' --weighted_ce_loss y --protopool n \
  --mask_prune_overspecific 'y|20|1.1' --minimize_contrasting_set 'y|1|0.1' \
  --weighted_loss \
  --compute_dtype bfloat16 --fast_gelu y --use_pallas_head y \
  --eval_every 5 --checkpoint_every 5 "$@"
