#!/bin/bash
# Round-4 quality re-certification on the SHIPPED defaults (VERDICT r3
# #5): waits for the 200k reference-schedule run started by
# tpu_sustained_200k.sh (version 2 — v3 whole-render kernel +
# early-exit + sort-free merges + convergence elision + round-4
# eval-count taper), then runs the full eval protocol on the result and
# writes docs/evidence/quality200k_v3/:
#   1. NVS render eval over all 32 views (PSNR/SSIM/lpips-rf)
#   2. 512^3 mesh + TSDF refuse + Chamfer/F-score (--score)
#   3. summary.json next to the v2-path numbers for the parity claim
# One TPU process at a time.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"
VERSION="${1:-2}"
EXP=exps/quality_1/version_${VERSION}
OUT=docs/evidence/quality200k_v3
SJSON=/tmp/r2_sustained200k.json

echo "[post-q] waiting for the 200k run to finish..."
while [ ! -f "$SJSON" ]; do sleep 60; done
cat "$SJSON"

echo "[post-q] 1/2 NVS render eval (all views)"
timeout 5400 python -m i2sdf_tpu.main --conf configs/synthetic_quality.yml \
  --scan_id 1 --version "$VERSION" --test --test_mode render \
  >/tmp/r4_post_render.log 2>&1
RC_RENDER=$?
tail -3 /tmp/r4_post_render.log

echo "[post-q] 2/2 mesh 512^3 + --score"
timeout 5400 python -m i2sdf_tpu.main --conf configs/synthetic_quality.yml \
  --scan_id 1 --version "$VERSION" --test --test_mode mesh \
  --resolution 512 --score >/tmp/r4_post_mesh.log 2>&1
RC_MESH=$?
tail -3 /tmp/r4_post_mesh.log

mkdir -p "$OUT"
python - <<EOF
import glob, json, os, shutil

exp = "$EXP"
out = "$OUT"
summary = {
    "run": ("configs/synthetic_quality.yml scan1 version_$VERSION, 200k "
            "steps (reference schedule), TPU v5e single chip, SHIPPED "
            "round-4 defaults: v3 whole-render kernel + global early-exit "
            "+ sort-free merges + convergence elision + eval-count taper "
            "128,128,96,64,64"),
    "rc_render": $RC_RENDER, "rc_mesh": $RC_MESH,
}
try:
    summary["sustained"] = json.load(open("$SJSON"))
except Exception as e:
    summary["sustained"] = str(e)

nvs = sorted(glob.glob(os.path.join(exp, "eval", "**", "metrics.txt"),
                       recursive=True), key=os.path.getmtime)
nvs = [p for p in nvs if "mesh" not in p]
if nvs:
    txt = open(nvs[-1]).read()
    shutil.copy(nvs[-1], os.path.join(out, "nvs_metrics.txt"))
    summary["nvs_metrics_file"] = nvs[-1]
    for line in txt.splitlines():
        if line.lower().startswith("mean"):
            summary["nvs_mean_line"] = line.strip()
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
    summary["mesh_metrics_m"] = mm
    summary["mesh_protocol"] = ("512^3 marching cubes + TSDF refuse from "
                                "all training poses, 2 cm voxel "
                                "downsample, 5 cm threshold")
summary["v2_path_reference"] = "docs/evidence/quality200k/summary.json"
grid = sorted(glob.glob(os.path.join(exp, "eval", "**", "rendering",
                                     "*0000*.png"), recursive=True))
if grid:
    shutil.copy(grid[0], os.path.join(out, os.path.basename(grid[0])))
json.dump(summary, open(os.path.join(out, "summary.json"), "w"), indent=1)
print(json.dumps(summary, indent=1))
EOF
echo "[post-q] DONE"
