#!/bin/bash
# Round-5 trainer-loop rate probe (VERDICT r4 task 2): measures the
# REAL host-loop steps/s (not bench.py's pure-device enqueue rate) on
# the quality scene, out-of-window and in-window, before/after the
# bubble-draw amortization. 700 steps, bubble window [300, 700), no
# vals/checkpoints — isolates the per-step path + one pdf init.
#   A: shipped defaults (bubble_draw_every 1)
#   B: bubble_draw_every 16
# Usage: bash scripts/r5_rate_probe.sh
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"

python - <<'EOF'
import yaml
base = yaml.safe_load(open("configs/synthetic_quality_50k.yml"))
base["train"]["steps"] = 700
base["train"]["plot_freq"] = 100000
base["train"]["checkpoint_freq"] = 100000
base["loss"]["min_bubble_iter"] = 300
base["loss"]["max_bubble_iter"] = 700
base["loss"]["smooth_iter"] = 100000
yaml.safe_dump(base, open("/tmp/probe_a.yml", "w"))
base["train"]["bubble_draw_every"] = 16
yaml.safe_dump(base, open("/tmp/probe_b.yml", "w"))
EOF

declare -A VER=([a]=90 [b]=91)
for V in a b; do
  echo "== probe $V"
  T0=$(date +%s)
  timeout 2400 python -m i2sdf_tpu.main --conf /tmp/probe_${V}.yml \
    --scan_id 1 --version "${VER[$V]}" >/tmp/r5_probe_${V}.log 2>&1 \
    || tail -5 /tmp/r5_probe_${V}.log
  echo "wall=$(( $(date +%s) - T0 ))s"
  grep -E "\[scan1 (250|300|550|600|650|700)/" /tmp/r5_probe_${V}.log
done
