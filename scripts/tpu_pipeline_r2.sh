#!/bin/bash
# Round-2 TPU measurement pipeline: waits for the axon tunnel, then runs
# (serially — one JAX TPU process at a time):
#   1. bench.py                      -> /tmp/r2_bench.json (flagship certify)
#   2. light-mask config bench       -> /tmp/r2_bench_lightmask.json
#   3. beta-ladder schedule sweep    -> /tmp/r2_schedule.jsonl (+/- per-ray)
# Results land in /tmp and are copied into docs/evidence by the builder
# after review.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"

echo "[pipeline] waiting for TPU backend..."
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    break
  fi
  echo "[pipeline] $(date +%H:%M:%S) tunnel down; retry in 60s"
  sleep 60
done
echo "[pipeline] $(date +%H:%M:%S) TPU is up"

echo "[pipeline] 1/3 flagship bench"
BENCH_WINDOW=600 python bench.py >/tmp/r2_bench.json 2>/tmp/r2_bench.log
cat /tmp/r2_bench.json

echo "[pipeline] 2/3 light-mask bench"
BENCH_WINDOW=600 BENCH_CONF=configs/synthetic_light_mask.yml \
  python bench.py >/tmp/r2_bench_lightmask.json 2>/tmp/r2_bench_lm.log
cat /tmp/r2_bench_lightmask.json

echo "[pipeline] 3/4 beta-ladder schedule sweep (plain vs per-ray)"
python scripts/bench_schedule.py --steps 20 \
  >/tmp/r2_schedule.jsonl 2>/tmp/r2_schedule.log
tail -3 /tmp/r2_schedule.jsonl

echo "[pipeline] 4/4 sustained late-schedule (resume 200k quality ckpt)"
python scripts/bench_resume_quality.py --steps 100 \
  >/tmp/r2_sustained.json 2>/tmp/r2_sustained.log
cat /tmp/r2_sustained.json

echo "[pipeline] DONE"
