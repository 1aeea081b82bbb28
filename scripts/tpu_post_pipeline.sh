#!/bin/bash
# Runs AFTER scripts/tpu_pipeline_r2.sh completes (watches its log for
# DONE / its pid for exit), one TPU process at a time:
#   1. Mosaic compile + numerics check of the fused bg kernel pair
#      (interpret-verified on CPU; this is the real-lowering gate)
#   2. tpu_train_check.py on current HEAD (600 steps, PSNR must climb)
# Results land in /tmp/r2_post_*.log / /tmp/r2_bg_check.json.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR="$HOME/.jax_cache"
PIPELINE_PID="${1:-$(cat /tmp/r2_pipeline.pid 2>/dev/null || echo '')}"

echo "[post] waiting for pipeline (pid=${PIPELINE_PID:-?}) to finish..."
while true; do
  if grep -q "\[pipeline\] DONE" /tmp/r2_pipeline.log 2>/dev/null; then
    break
  fi
  if [ -n "$PIPELINE_PID" ] && ! kill -0 "$PIPELINE_PID" 2>/dev/null; then
    echo "[post] pipeline process gone; proceeding"
    break
  fi
  sleep 60
done

echo "[post] 1/2 fused bg kernel on real TPU"
timeout 1200 python - >/tmp/r2_bg_check.json 2>/tmp/r2_post_bg.log <<'EOF'
import json
import jax, jax.numpy as jnp, numpy as np
from i2sdf_tpu.models.mlp import (ImplicitNetConfig, RenderingNetConfig,
                                  implicit_net_apply, implicit_net_init,
                                  rendering_net_apply, rendering_net_init)
from i2sdf_tpu.ops.pallas.fused_bg import bg_core_fused

icfg = ImplicitNetConfig(
    feature_vector_size=256, sdf_bounding_sphere=0.0, d_in=4,
    dims=(256,) * 8, skip_in=(4,), geometric_init=False,
    embed_type="positional", multires=6)
rcfg = RenderingNetConfig(
    feature_vector_size=256, mode="nerf", d_in=3, dims=(256,) * 4,
    embed_type="positional", multires=4)
pi = implicit_net_init(jax.random.PRNGKey(0), icfg)
pr = rendering_net_init(jax.random.PRNGKey(1), rcfg)
x = jax.random.normal(jax.random.PRNGKey(2), (51200, 4)) * 0.7
dirs = jax.random.normal(jax.random.PRNGKey(3), (51200, 3))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

def loss(both):
    s, rgb = bg_core_fused(both["i"], icfg, both["r"], rcfg, x, dirs)
    return jnp.sum(s ** 2) * 1e-3 + jnp.sum(rgb ** 2) * 1e-3

v, g = jax.jit(jax.value_and_grad(loss))({"i": pi, "r": pr})
v = float(v)
gn = float(sum(jnp.sum(a * a) for a in jax.tree_util.tree_leaves(g)) ** 0.5)

out = implicit_net_apply(pi, icfg, x[:4096])
s_ref = out[:, :1]
rgb_ref = rendering_net_apply(pr, rcfg, None, None, dirs[:4096], out[:, 1:])
s, rgb = bg_core_fused(pi, icfg, pr, rcfg, x[:4096], dirs[:4096])
err_s = float(jnp.abs(s - s_ref).max())
err_rgb = float(jnp.abs(rgb - rgb_ref).max())
print(json.dumps({"ok": bool(np.isfinite([v, gn]).all()
                             and err_s < 0.05 and err_rgb < 0.03),
                  "loss": v, "grad_norm": gn,
                  "max_err_sigma": err_s, "max_err_rgb": err_rgb}))
EOF
cat /tmp/r2_bg_check.json

echo "[post] 2/2 train check on HEAD"
timeout 1800 python scripts/tpu_train_check.py --steps 600 \
  >/tmp/r2_post_train.log 2>&1
tail -3 /tmp/r2_post_train.log

echo "[post] DONE"
