#!/bin/bash
# Runs AFTER scripts/tpu_post_pipeline.sh completes (watches its log):
# the material-stage gate on real TPU — fused Pallas SDF visibility
# under shade's spp-vmap (Mosaic lowering of a vmapped kernel), full
# bake + 60 jitted steps, loss must decrease.
# Result: /tmp/r2_material_check.json
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"

echo "[post-mat] waiting for post-pipeline to finish..."
while true; do
  if grep -q "\[post\] DONE" /tmp/r2_post.log 2>/dev/null; then
    break
  fi
  post_pid="$(cat /tmp/r2_post.pid 2>/dev/null || echo '')"
  if [ -n "$post_pid" ] && ! kill -0 "$post_pid" 2>/dev/null; then
    echo "[post-mat] post-pipeline process gone; proceeding"
    break
  fi
  sleep 60
done

echo "[post-mat] material-stage gate on real TPU"
timeout 2400 python scripts/tpu_material_check.py \
  >/tmp/r2_material_check.json 2>/tmp/r2_material_check.log
cat /tmp/r2_material_check.json
echo "[post-mat] DONE"
