#!/bin/bash
# Round-5 perf-certification arm: the SAME 50k reduced schedule as the
# attribution arms, but on the ROUND-5 code (host-loop fix, amortized
# bubble draws K=16, async checkpoints, threaded artifact IO) — the
# quality gate + whole-run throughput anchor for the new defaults
# (VERDICT r4 task 2). Runs from /root/repo (NOT the frozen snapshot),
# seed 42, then the full eval protocol; writes
# docs/evidence/quality_variance/r5perf.json.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"
OUTDIR=docs/evidence/quality_variance
LOG=/tmp/r5_perf_arm.log
V=20
EXP=exps/quality_1/version_${V}

python - <<'EOF'
import yaml
base = yaml.safe_load(open("configs/synthetic_quality_50k.yml"))
base["train"]["bubble_draw_every"] = 16
yaml.safe_dump(base, open("/tmp/r5perf.yml", "w"))
EOF

T0=$(date +%s)
if [ -n "${EVAL_ONLY:-}" ] && [ -d "$EXP/checkpoints/orbax/50000" ]; then
  echo "[r5perf] checkpoint present; skipping train"
  RC_TRAIN=0
else
  echo "[r5perf] train 50k (round-5 code, bubble_draw_every=16)"
  timeout 9000 python -m i2sdf_tpu.main --conf /tmp/r5perf.yml \
    --scan_id 1 --version "$V" >"$LOG" 2>&1
  RC_TRAIN=$?
  tail -2 "$LOG"
fi
T1=$(date +%s)

echo "[r5perf] NVS render eval"
timeout 2400 python -m i2sdf_tpu.main --conf /tmp/r5perf.yml --scan_id 1 \
  --version "$V" --test --test_mode render >>"$LOG" 2>&1
RC_RENDER=$?
T2=$(date +%s)

echo "[r5perf] mesh 512^3 + --score"
timeout 3600 python -m i2sdf_tpu.main --conf /tmp/r5perf.yml --scan_id 1 \
  --version "$V" --test --test_mode mesh --resolution 512 --score \
  >>"$LOG" 2>&1
RC_MESH=$?
T3=$(date +%s)

python - <<EOF
import glob, json, os, re
exp = "$EXP"
out = {
    "arm": "r5perf", "seed": 42,
    "config": "synthetic_quality_50k + bubble_draw_every 16, ROUND-5 "
              "code (in-jit fold_in, cached weights, async ckpt, "
              "threaded IO)",
    "rc": {"train": $RC_TRAIN, "render": $RC_RENDER, "mesh": $RC_MESH},
    "wall_secs": {"train": $T1-$T0, "render": $T2-$T1, "mesh": $T3-$T2},
    "train_rays_per_sec_whole_run": round(50000*1600/max($T1-$T0,1), 1),
}
path = os.path.join("$OUTDIR", "r5perf.json")
if $T1-$T0 < 60 and os.path.exists(path):
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
echo "[r5perf] DONE"
