#!/bin/bash
# Round-5 master TPU queue (supersedes r5_tpu_queue{,2}.sh): waits for
# the tunnel's DATA PATH (outage 2026-08-20 ~10:13), then runs the
# round-5 evidence jobs in priority order — quick high-value first, so
# a second outage costs the least:
#   1. s42 attribution arm eval (train done; EVAL_ONLY)
#   2. trainer-loop rate probe (host-loop fix + amortized draws)
#   3. specular step-count stability (both captures, 3k/6k/12k, EMA)
#   4. material chroma recovery at 8000 steps
#   5-8. attribution arms s1, notaper, noexit, s2
#   9. r5perf arm (round-5 code, quality gate + whole-run anchor)
#  10. indirect A/B on TPU (96x128, 8 views, 1 seed) + evidence merge
#  11. per-ray compaction resume A/B at beta 0.01 / 0.003
#  12. attribution summary aggregation
set -u
cd /root/repo
LOG=/tmp/r5_queue.log
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"

wait_tpu() {
  echo "[queue] $(date +%T) waiting for TPU data path..." | tee -a "$LOG"
  while true; do
    if timeout 90 python -c "import jax, jax.numpy as jnp; assert float(jnp.ones(8).sum()) == 8.0" >/dev/null 2>&1; then
      echo "[queue] $(date +%T) TPU data path OK" | tee -a "$LOG"
      return
    fi
    sleep 60
  done
}

run() {  # run <label> <cmd...>
  local label="$1"; shift
  wait_tpu
  echo "[queue] $(date +%T) START $label" | tee -a "$LOG"
  "$@" >>"$LOG" 2>&1
  echo "[queue] $(date +%T) END $label (rc=$?)" | tee -a "$LOG"
}

run "s42-eval"  env EVAL_ONLY=1 bash scripts/r5_attrib_arm.sh s42
run "rate-probe" bash scripts/r5_rate_probe.sh
run "specular-stability" env SPEC_CAPTURE=both SPEC_EMA=0.999 \
  SPEC_SWEEP="steps=6000;steps=12000" timeout 9000 \
  python scripts/eval_specular_recovery.py
run "material-chroma" env MAT_CHECK_RECOVERY_STEPS=8000 timeout 5400 \
  python scripts/tpu_material_check.py
run "arm-s1"      bash scripts/r5_attrib_arm.sh s1
run "arm-notaper" bash scripts/r5_attrib_arm.sh notaper
run "arm-noexit"  bash scripts/r5_attrib_arm.sh noexit
run "arm-s2"      bash scripts/r5_attrib_arm.sh s2
run "r5perf"      bash scripts/r5_perf_arm.sh
mkdir -p /tmp/indirect_tpu
run "indirect-tpu" env AB_SEEDS=1 AB_RES=96x128 AB_N_IMAGES=8 \
  AB_OUT=/tmp/indirect_tpu timeout 9000 python scripts/eval_indirect_ab.py
python - <<'EOF' >>"$LOG" 2>&1
import json
ev = "docs/evidence/indirect_ab.json"
try:
    main = json.load(open(ev))
    tpu = json.load(open("/tmp/indirect_tpu/indirect_ab.json"))
    main["platform_tpu"] = tpu
    json.dump(main, open(ev, "w"), indent=1)
    print("[queue] merged TPU entry into", ev)
except Exception as e:
    print("[queue] indirect merge failed:", e)
EOF
run "perray-ab-0.01" timeout 3600 python scripts/bench_resume_quality.py \
  --exp /tmp/r5_attrib/exps/quality_1/version_0 --beta 0.01 --steps 120
run "perray-ab-0.003" timeout 3600 python scripts/bench_resume_quality.py \
  --exp /tmp/r5_attrib/exps/quality_1/version_0 --beta 0.003 --steps 120
run "repair-evals" bash scripts/r5_repair_evals.sh
python scripts/r5_attrib_summary.py >>"$LOG" 2>&1 || true
echo "[queue] $(date +%T) MASTER QUEUE DONE" | tee -a "$LOG"
