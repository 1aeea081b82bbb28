#!/bin/bash
# Measured 200k-schedule SUSTAINED throughput on the shipped defaults
# (v3 whole-render kernel + early-exit sampler), bubble window included
# (VERDICT r1 weak #2: the honest number to report next to the peak).
#
# Trains configs/synthetic_quality.yml end-to-end into a FRESH version
# dir (does not touch exps/quality_1/version_0, which holds the round-1
# 200k checkpoint used by bench_resume_quality.py). Deadline-guarded:
# MAX_SECS (default 4h) hard-caps the run via timeout; checkpoints every
# 10k steps make a cut run resumable (--version N --resume). Sustained
# rays/s = steps_completed * 1600 / wall_secs, written as JSON.
#
# Usage: bash scripts/tpu_sustained_200k.sh [VERSION] (default 1)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"
VERSION="${1:-1}"
MAX_SECS="${MAX_SECS:-14400}"
LOG=/tmp/r2_sustained200k.log
OUT=/tmp/r2_sustained200k.json
EXP=exps/quality_1/version_${VERSION}

echo "[sustained] waiting for TPU backend..."
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done

RESUME_FLAGS=""
START_STEP=0
if [ -d "$EXP/checkpoints/orbax" ]; then
  RESUME_FLAGS="--resume"
  START_STEP=$(python - <<EOF
import os
d = "$EXP/checkpoints/orbax"
steps = [int(x) for x in os.listdir(d) if x.isdigit()]
print(max(steps) if steps else 0)
EOF
)
  echo "[sustained] resuming version_${VERSION} from step ${START_STEP}"
fi

T0=$(date +%s)
timeout "$MAX_SECS" python -m i2sdf_tpu.main \
  --conf configs/synthetic_quality.yml --scan_id 1 \
  --version "$VERSION" $RESUME_FLAGS >"$LOG" 2>&1
RC=$?
T1=$(date +%s)

python - <<EOF
import json, os, re
wall = $T1 - $T0
start = $START_STEP
end = start
d = "$EXP/checkpoints/orbax"
if os.path.isdir(d):
    steps = [int(x) for x in os.listdir(d) if x.isdigit()]
    if steps:
        end = max(steps)
# the log's final progress line carries the last in-window steps/s too
tail_sps = None
try:
    for line in open("$LOG", errors="replace"):
        m = re.search(r"\(([\d.]+) steps/s", line)
        if m:
            tail_sps = float(m.group(1))
except OSError:
    pass
done = end - start
out = {
    "metric": "sustained_train_rays_per_sec",
    "steps_completed": done,
    "start_step": start, "end_step": end,
    "wall_secs": wall, "rc": $RC,
    "value": done * 1600 / wall if wall > 0 and done > 0 else None,
    "unit": "rays/s (200k reference schedule, shipped defaults, "
            "incl. bubble window, val renders, checkpoints)",
    "last_window_steps_per_sec": tail_sps,
    "complete": end >= 200000,
}
json.dump(out, open("$OUT", "w"), indent=1)
print(json.dumps(out))
EOF
