#!/bin/bash
# Round-5 TPU job queue, phase 1: waits for the axon tunnel to recover
# (outage observed 2026-08-20 ~10:15, "No hardware is found" in
# /tmp/tpu_logs), then runs, one TPU process at a time:
#   1. s42 attribution arm eval (train already done; EVAL_ONLY)
#   2. trainer-loop rate probe (host-overhead fix + amortized draws)
#   3. attribution arm s1 (full train + eval)
#   4. attribution arm s2
# Progress/timing to /tmp/r5_queue.log.
set -u
cd /root/repo
LOG=/tmp/r5_queue.log
echo "[queue] $(date +%T) waiting for TPU backend..." | tee -a "$LOG"
while true; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "[queue] $(date +%T) TPU back; running s42 eval" | tee -a "$LOG"
EVAL_ONLY=1 bash scripts/r5_attrib_arm.sh s42 >>"$LOG" 2>&1
echo "[queue] $(date +%T) rate probe" | tee -a "$LOG"
bash scripts/r5_rate_probe.sh >>"$LOG" 2>&1
echo "[queue] $(date +%T) arm s1" | tee -a "$LOG"
bash scripts/r5_attrib_arm.sh s1 >>"$LOG" 2>&1
echo "[queue] $(date +%T) arm s2" | tee -a "$LOG"
bash scripts/r5_attrib_arm.sh s2 >>"$LOG" 2>&1
echo "[queue] $(date +%T) phase-1 queue done" | tee -a "$LOG"
