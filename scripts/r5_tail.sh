#!/bin/bash
# Round-5 tail queue (run after the LOU seed-2 training completes).
# The mid-round reset left ~1h of TPU budget; this is the judge-priority
# remainder that fits: LOU evals + archive, the BYOL driver co-run, then
# stabilizer-ablation arms bootstrapped from the control arm's OWN
# pretrain (the full-phase base's net_pretrained no longer exists and
# rebuilding it costs 40 min; the control arm's pretrain phase plays the
# same role — every subsequent arm copies it, so all arms still share
# ONE pretrained state and isolate the train-phase effect of one guard).
# Arms archive + are committed by the session driver as they land, so
# truncation at round end still yields a partial table.
set -u
cd /root/repo
log() { echo "[tail $(date +%H:%M:%S)] $*"; }

# Run under setsid so this trap can take the whole queue (incl. the
# current training python) down with one group kill — the TPU must be
# free for the driver's end-of-round bench.py.
trap 'log "TERM: killing queue group"; kill 0' TERM INT

# No NEW step starts after DEADLINE (unix seconds; default: far future).
DEADLINE=${DEADLINE:-9999999999}

step() {  # step <name> <timeout_s> -- cmd...
  local name=$1 tmo=$2; shift 3
  if [ -f "/tmp/r5b/$name.done" ]; then log "$name: done, skip"; return 0; fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then log "$name: past deadline, skip"; return 0; fi
  log "$name: $*"
  if timeout "$tmo" "$@" >> "/tmp/r5b/$name.log" 2>&1; then
    touch "/tmp/r5b/$name.done"; log "$name OK"
  else
    touch "/tmp/r5b/$name.fail"; log "$name FAILED (see /tmp/r5b/$name.log)"
  fi
}

step lou_s2_eval_plain 1800 -- \
  python -m pipnet_tpu.evaluate --run_dir runs/lou_190_s2 --skip_per_node
step lou_s2_eval_lou 1800 -- \
  python -m pipnet_tpu.evaluate --run_dir runs/lou_190_s2 \
    --leave_out_classes configs/leave_out_synthetic190.txt --skip_per_node
step lou_s2_archive 600 -- bash scripts/archive_run.sh runs/lou_190_s2

step byol 1800 -- bash scripts/runs/run_byol_demo.sh --resume
step byol_archive 600 -- bash scripts/archive_run.sh runs/byol_demo

# Ablations: control arm first (it pretrains, no base to copy); every
# later arm copies the control's net_pretrained via the script's BASE
# mechanism, so all arms share ONE pretrained state.  One invocation per
# arm so each lands (and is archived) independently.
abl_one() {
  local arm=$1 tmo=$2
  step "abl_$arm" "$tmo" -- env ONLY_ARM="$arm" \
    bash scripts/runs/run_ablations_r4.sh ./runs/ablations_r4/quartet_control
  # archive whatever finished
  local d=runs/ablations_r4/$arm
  if [ -f "$d/DONE" ]; then
    local dest=artifacts/ablations_r4/$arm
    mkdir -p "$dest/metadata"
    for f in metrics_train.jsonl metrics_pretrain.jsonl \
             epoch_wise_metrics_train.csv log_epoch_overview.csv \
             metadata/config.json; do
      [ -f "$d/$f" ] && cp "$d/$f" "$dest/$f"
    done
    python scripts/summarize_ablations.py runs/ablations_r4 \
      > artifacts/ablations_r4_table.md 2>/dev/null || true
  fi
}

abl_one quartet_control 2400
abl_one no_clip 1500
abl_one no_warmup 1500
abl_one global_clip 1500
abl_one ref_tanh_eps 1500
abl_one ref_align_eps 1500

log "tail queue complete"
