#!/bin/bash
# Round-5 chain, take 2: the mid-round environment reset wiped runs/
# (all checkpoints incl. the sparse/full-phase bases and the finished
# LOU seed-1 run) and the /tmp/r5 state, so r5_chain.sh's order — which
# assumed those bases existed — is wrong.  This chain reorders by judge
# priority under a hard wall-clock budget, rebuilding bases only where
# a later step needs them:
#   1. LOU seed-2 re-roll (judge missing item #1, promised two rounds)
#      WITH --kernel_orth_cap 100: seed-1's root-caused collapse was a
#      single node's kernel_orth runaway to 3335 while healthy per-node
#      ko never exceeds 24.6 (max over all 189 full-phase node CSVs), so
#      a cap of 100 is bit-inert on a healthy trajectory (ko*C/max(C,ko)
#      == ko exactly when ko<C) and bounds the runaway if seed 2 draws
#      the same failure — the node CSVs prove post-hoc whether it ever
#      engaged.
#   2. BYOL driver co-run (cheap, closes a round-4 overclaim).
#   3. full_phase_190 rebuild (base for everything sparse).
#   4. sparse continuation extended to internal epoch 90 (plateau test).
#   5. full eval sweep on it (threshold CURVE with the reference
#      criterion, masked decode, LOU decode, archive).
#   6. masked-decode A/B (geo vs boost).
#   7. stabilizer ablation arms (each arm archives individually, so
#      truncation still yields a partial table).
#   8. real-schedule guard, multi-seed — only if time remains.
# Every step archives into tracked artifacts/ as it completes; the
# watchdog machinery is unchanged from r5_chain.sh.
set -u
cd /root/repo
mkdir -p /tmp/r5b

newest() {
  local t
  t=$(find "$@" -type f -printf '%T@\n' 2>/dev/null | sort -rn | head -1 | cut -d. -f1)
  echo "${t:-0}"
}

run_wd() {
  local name=$1 stall=$2 max_retry=$3 watch=$4; shift 4
  [ "$1" = "--" ] && shift
  if [ -f "/tmp/r5b/$name.done" ]; then echo "[r5b] $name: done, skip"; return 0; fi
  local attempt=0
  while [ $attempt -lt "$max_retry" ]; do
    attempt=$((attempt+1))
    echo "[r5b] $name attempt $attempt: $*" | tee -a "/tmp/r5b/$name.log"
    setsid "$@" >> "/tmp/r5b/$name.log" 2>&1 &
    local pid=$!
    local start=$(date +%s)
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      local last now
      last=$(newest "$watch" "/tmp/r5b/$name.log")
      now=$(date +%s)
      [ "$last" -lt "$start" ] && last=$start
      if [ $((now - last)) -gt "$stall" ]; then
        echo "[r5b] $name: STALL >${stall}s, killing -$pid" | tee -a "/tmp/r5b/$name.log"
        kill -- -$pid 2>/dev/null; sleep 10; kill -9 -- -$pid 2>/dev/null
        find "$watch" -maxdepth 2 -name '*orbax-checkpoint-tmp*' -exec rm -rf {} + 2>/dev/null
        sleep 45
        break
      fi
    done
    if wait $pid; then
      touch "/tmp/r5b/$name.done"; echo "[r5b] $name: OK"; return 0
    fi
    echo "[r5b] $name: attempt $attempt failed/killed" | tee -a "/tmp/r5b/$name.log"
    sleep 30
  done
  touch "/tmp/r5b/$name.fail"; echo "[r5b] $name: FAILED after $max_retry attempts"; return 1
}

# ---- 1: LOU seed-2 (fixture pinned to the seed-1 data, RNG re-rolled,
#         ko runaway bounded) ----
run_wd lou_s2_train 1500 4 runs/lou_190_s2 -- \
  bash scripts/runs/run_lou_190.sh \
    --log_dir ./runs/lou_190_s2 --dataset synthetic:190:48:s1 --seed 2 \
    --kernel_orth_cap 100 --resume
run_wd lou_s2_eval_plain 2400 2 runs/lou_190_s2 -- \
  python -m pipnet_tpu.evaluate --run_dir runs/lou_190_s2 --skip_per_node
run_wd lou_s2_eval_lou 2400 2 runs/lou_190_s2 -- \
  python -m pipnet_tpu.evaluate --run_dir runs/lou_190_s2 \
    --leave_out_classes configs/leave_out_synthetic190.txt --skip_per_node
run_wd lou_s2_archive 600 2 runs/lou_190_s2 -- bash scripts/archive_run.sh runs/lou_190_s2

# ---- 2: BYOL driver co-run ----
run_wd byol 1200 3 runs/byol_demo -- bash scripts/runs/run_byol_demo.sh --resume
run_wd byol_archive 600 2 runs/byol_demo -- bash scripts/archive_run.sh runs/byol_demo

# ---- 3: full-phase base rebuild (reset destroyed the checkpoints) ----
run_wd full_phase 1500 4 runs/full_phase_190 -- \
  bash scripts/runs/run_full_phase_190.sh
run_wd full_phase_archive 600 2 runs/full_phase_190 -- \
  bash scripts/archive_run.sh runs/full_phase_190

# ---- 4: sparse continuation to internal epoch 90 (plateau test) ----
if [ ! -d runs/sparse_190 ] && [ -d runs/full_phase_190 ]; then
  cp -r runs/full_phase_190 runs/sparse_190
fi
run_wd sparse_ext 1200 4 runs/sparse_190 -- \
  bash scripts/runs/run_sparse_190.sh \
    --epochs 90 --epochs_finetune_classifier 90 --epochs_finetune_mask_prune 90
run_wd sparse_archive 600 2 runs/sparse_190 -- bash scripts/archive_run.sh runs/sparse_190

# ---- 5: full eval sweep (threshold curve w/ ref criterion, masked,
#         LOU decode; ends with archive itself) ----
run_wd sparse_sweep 2400 2 runs/sparse_190 -- \
  bash scripts/runs/eval_full_phase_190.sh runs/sparse_190

# ---- 6: masked-decode A/B (geo-mean score vs boost 1.3) ----
run_wd mask_ab 1200 4 runs/mask_ab -- \
  env BASE=./runs/sparse_190 EPOCHS=105 bash scripts/runs/run_mask_ab.sh
for arm in geo boost13; do
  run_wd mask_ab_eval_$arm 2400 2 runs/mask_ab/$arm -- bash -c "
    python -m pipnet_tpu.evaluate --run_dir runs/mask_ab/$arm --skip_per_node &&
    python -m pipnet_tpu.evaluate --run_dir runs/mask_ab/$arm \
      --apply_overspecificity_mask --fixed_mask_seed 0 --skip_per_node &&
    bash scripts/archive_run.sh runs/mask_ab/$arm"
done

# ---- 7: stabilizer ablation arms (shared net_pretrained from the
#         rebuilt base; each arm archives as it lands) ----
run_wd ablations 1200 6 runs/ablations_r4 -- bash -c '
  bash scripts/runs/run_ablations_r4.sh ./runs/full_phase_190;
  for d in runs/ablations_r4/*/; do
    arm=$(basename "$d")
    dest="artifacts/ablations_r4/$arm"; mkdir -p "$dest"
    for f in metrics_train.jsonl metrics_pretrain.jsonl \
             epoch_wise_metrics_train.csv log_epoch_overview.csv \
             metadata/config.json; do
      [ -f "$d/$f" ] && { mkdir -p "$dest/$(dirname "$f")"; cp "$d/$f" "$dest/$f"; }
    done
  done'
run_wd ablations_table 600 2 runs/ablations_r4 -- bash -c '
  python scripts/summarize_ablations.py runs/ablations_r4 \
    | tee artifacts/ablations_r4_table.md'

# ---- 8: real-schedule guard + multi-seed (time permitting) ----
run_wd real_guard 1200 4 runs/real_schedule_guard -- \
  bash scripts/runs/run_real_schedule_guard.sh
run_wd real_guard_eval 2400 2 runs/real_schedule_guard -- bash -c "
  python -m pipnet_tpu.evaluate --run_dir runs/real_schedule_guard --skip_per_node &&
  bash scripts/archive_run.sh runs/real_schedule_guard"
run_wd multi_seed 1200 6 runs -- bash scripts/runs/run_multi_seed_sparse.sh

echo "[r5b] chain complete: $(ls /tmp/r5b/*.done 2>/dev/null | wc -l) done, \
$(ls /tmp/r5b/*.fail 2>/dev/null | wc -l) failed"
