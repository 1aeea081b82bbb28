#!/bin/bash
# Round-5 TPU job queue, phase 2 (after r5_tpu_queue.sh):
#   1. attribution arm notaper (taper ablation, seed 42)
#   2. attribution arm noexit  (early-exit ablation, seed 42)
#   3. specular step-count stability: both captures, shipped estimator,
#      3000 (default final fit) + 6000 + 12000-step sweep arms, EMA
#      readout (VERDICT r4 task 4 + ADVICE #4)
#   4. material chroma-scene recovery on TPU at the 8000-step protocol
#      (VERDICT r4 task 5)
#   5. one-seed indirect-lighting A/B at 96x128 / 8 views on TPU
#      (VERDICT r4 task 7) -> merged into docs/evidence/indirect_ab.json
set -u
cd /root/repo
LOG=/tmp/r5_queue2.log
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"

echo "[queue2] $(date +%T) waiting for TPU backend..." | tee -a "$LOG"
while true; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done

echo "[queue2] $(date +%T) arm notaper" | tee -a "$LOG"
bash scripts/r5_attrib_arm.sh notaper >>"$LOG" 2>&1
echo "[queue2] $(date +%T) arm noexit" | tee -a "$LOG"
bash scripts/r5_attrib_arm.sh noexit >>"$LOG" 2>&1

echo "[queue2] $(date +%T) specular stability (3k/6k/12k, both captures)" \
  | tee -a "$LOG"
SPEC_CAPTURE=both SPEC_EMA=0.999 SPEC_SWEEP="steps=6000;steps=12000" \
  timeout 7200 python scripts/eval_specular_recovery.py >>"$LOG" 2>&1

echo "[queue2] $(date +%T) material chroma check (8000 steps)" | tee -a "$LOG"
MAT_CHECK_RECOVERY_STEPS=8000 timeout 5400 \
  python scripts/tpu_material_check.py >>"$LOG" 2>&1

echo "[queue2] $(date +%T) indirect A/B on TPU (96x128, 8 views, 1 seed)" \
  | tee -a "$LOG"
mkdir -p /tmp/indirect_tpu
AB_SEEDS=1 AB_RES=96x128 AB_N_IMAGES=8 AB_OUT=/tmp/indirect_tpu \
  timeout 7200 python scripts/eval_indirect_ab.py >>"$LOG" 2>&1
python - <<'EOF' >>"$LOG" 2>&1
import json
ev = "docs/evidence/indirect_ab.json"
try:
    main = json.load(open(ev))
    tpu = json.load(open("/tmp/indirect_tpu/indirect_ab.json"))
    main["platform_tpu"] = tpu
    json.dump(main, open(ev, "w"), indent=1)
    print("[queue2] merged TPU entry into", ev)
except Exception as e:
    print("[queue2] indirect merge failed:", e)
EOF
echo "[queue2] $(date +%T) phase-2 queue done" | tee -a "$LOG"
