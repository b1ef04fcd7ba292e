#!/bin/bash
# TPU-wedge auto-recovery for the round-5 tail (2026-08-21 00:15 wedge:
# the remote axon server stopped answering mid-run at LOU seed-2 epoch
# 37/52; client kills + settle did not clear it, so recovery polls until
# the remote side comes back, then resumes the queue unattended).
set -u
cd /root/repo
log() { echo "[recover $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 45 python -c \
    "import jax, jax.numpy as jnp; float(jnp.ones(8).sum())" >/dev/null 2>&1
}

while true; do
  if probe; then log "TPU back"; break; fi
  log "TPU still wedged"
  sleep 60
done

# resume LOU seed-2 to completion (checkpoint at epoch 37 of 52)
if [ ! -d runs/lou_190_s2/checkpoints/net_trained_last ]; then
  rm -f runs/lou_190_s2/.pipnet_lock
  log "resuming LOU seed-2"
  timeout 2400 bash scripts/runs/run_lou_190.sh \
    --log_dir ./runs/lou_190_s2 --dataset synthetic:190:48:s1 --seed 2 \
    --kernel_orth_cap 100 --resume >> /tmp/r5b/lou_s2_train.log 2>&1 \
    && log "LOU seed-2 training complete" || log "LOU resume FAILED/timeout"
fi

exec bash scripts/r5_tail.sh
