#!/bin/bash
# Round-5 quality-attribution study (VERDICT r4 task 1): one arm of the
# 5-arm design on the 50k reduced schedule (configs/synthetic_quality_50k.yml
# — the shipped 200k schedule with every milestone scaled by 1/4).
#
#   s42 / s1 / s2 : shipped round-4 defaults, seeds 42/1/2
#                   -> the seed-noise envelope of SSIM / F-score / Prec
#   notaper       : seed 42, round_eval_counts removed (flat 128/round,
#                   the reference's budget)      -> isolates the taper
#   noexit        : seed 42, early_exit: false   -> isolates global exit
#
# Runs inside a FROZEN snapshot of the repo (/tmp/r5_attrib) created on
# first use, so concurrent development in /root/repo cannot contaminate
# the study. Each arm: train 50k -> NVS render eval (all 32 views) ->
# 512^3 mesh + --score, then writes
# /root/repo/docs/evidence/quality_variance/<arm>.json.
#
# Usage: bash scripts/r5_attrib_arm.sh <s42|s1|s2|notaper|noexit>
set -u
ARM="${1:?arm name}"
SNAP=/tmp/r5_attrib
REPO=/root/repo
OUTDIR=$REPO/docs/evidence/quality_variance
mkdir -p "$OUTDIR"
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"

if [ ! -d "$SNAP" ]; then
  echo "[attrib] creating frozen snapshot $SNAP"
  mkdir -p "$SNAP"
  (cd "$REPO" && tar cf - --exclude=.git --exclude=exps \
     --exclude=__pycache__ --exclude=docs/evidence .) \
    | (cd "$SNAP" && tar xf -) || { echo "snapshot failed"; exit 3; }
  python - <<'EOF'
import yaml
base = yaml.safe_load(open("/tmp/r5_attrib/configs/synthetic_quality_50k.yml"))
v = yaml.safe_load(open("/tmp/r5_attrib/configs/synthetic_quality_50k.yml"))
del v["model"]["ray_sampler"]["round_eval_counts"]
yaml.safe_dump(v, open("/tmp/r5_attrib/configs/attrib_notaper.yml", "w"))
v = yaml.safe_load(open("/tmp/r5_attrib/configs/synthetic_quality_50k.yml"))
v["model"]["ray_sampler"]["early_exit"] = False
yaml.safe_dump(v, open("/tmp/r5_attrib/configs/attrib_noexit.yml", "w"))
EOF
fi

cd "$SNAP"
case "$ARM" in
  s42)     CFG=configs/synthetic_quality_50k.yml; SEED=42; V=0 ;;
  s1)      CFG=configs/synthetic_quality_50k.yml; SEED=1;  V=1 ;;
  s2)      CFG=configs/synthetic_quality_50k.yml; SEED=2;  V=2 ;;
  notaper) CFG=configs/attrib_notaper.yml;        SEED=42; V=3 ;;
  noexit)  CFG=configs/attrib_noexit.yml;         SEED=42; V=4 ;;
  *) echo "unknown arm $ARM"; exit 2 ;;
esac
EXP=exps/quality_1/version_${V}
LOG=/tmp/r5_attrib_${ARM}.log

T0=$(date +%s)
if [ -n "${EVAL_ONLY:-}" ] && [ -d "$EXP/checkpoints/orbax/50000" ]; then
  echo "[attrib:$ARM] 50k checkpoint present; skipping train (EVAL_ONLY)"
  RC_TRAIN=0
else
  echo "[attrib:$ARM] train 50k ($CFG seed=$SEED -> $EXP)"
  timeout 9000 python -m i2sdf_tpu.main --conf "$CFG" --scan_id 1 \
    --version "$V" --seed "$SEED" >"$LOG" 2>&1
  RC_TRAIN=$?
  tail -2 "$LOG"
fi
T1=$(date +%s)

echo "[attrib:$ARM] NVS render eval"
timeout 2400 python -m i2sdf_tpu.main --conf "$CFG" --scan_id 1 \
  --version "$V" --seed "$SEED" --test --test_mode render \
  >>"$LOG" 2>&1
RC_RENDER=$?
T2=$(date +%s)

echo "[attrib:$ARM] mesh 512^3 + --score"
timeout 3600 python -m i2sdf_tpu.main --conf "$CFG" --scan_id 1 \
  --version "$V" --seed "$SEED" --test --test_mode mesh \
  --resolution 512 --score >>"$LOG" 2>&1
RC_MESH=$?
T3=$(date +%s)

python - <<EOF
import glob, json, os
exp, arm = "$EXP", "$ARM"
out = {
    "arm": arm, "config": "$CFG", "seed": $SEED,
    "schedule": "50k steps (200k reference schedule scaled 1/4: bubble "
                "[12.5k,37.5k), smooth from 37.5k)",
    "rc": {"train": $RC_TRAIN, "render": $RC_RENDER, "mesh": $RC_MESH},
    "wall_secs": {"train": $T1-$T0, "render": $T2-$T1, "mesh": $T3-$T2},
    "train_rays_per_sec_whole_run": round(50000*1600/max($T1-$T0,1), 1),
}
path = os.path.join("$OUTDIR", arm + ".json")
if $T1-$T0 < 60 and os.path.exists(path):
    # EVAL_ONLY rerun: keep the original training-phase timing
    try:
        prev = json.load(open(path))
        out["wall_secs"]["train"] = prev["wall_secs"]["train"]
        out["rc"]["train"] = prev["rc"]["train"]
        out["train_rays_per_sec_whole_run"] = prev[
            "train_rays_per_sec_whole_run"]
    except Exception:
        pass
nvs = sorted((p for p in glob.glob(os.path.join(exp, "eval", "**",
              "metrics.txt"), recursive=True) if "mesh" not in p),
             key=os.path.getmtime)
if nvs:
    for line in open(nvs[-1]):
        if line.startswith("[MEAN]"):
            out["nvs_mean_line"] = line.strip()
            import re
            m = re.findall(r"\[(\w[\w-]*)\]([\d.e+-]+)", line)
            out["nvs"] = {k.lower(): float(v) for k, v in m}
mesh = sorted(glob.glob(os.path.join(exp, "**", "mesh*", "metrics.txt"),
                        recursive=True), key=os.path.getmtime)
if mesh:
    mm = {}
    for line in open(mesh[-1]):
        if ":" in line:
            k, v = line.split(":", 1)
            try:
                mm[k.strip()] = float(v)
            except ValueError:
                pass
    out["mesh_metrics_m"] = mm
json.dump(out, open(path, "w"), indent=1)
print(json.dumps(out, indent=1))
EOF
echo "[attrib:$ARM] DONE"
