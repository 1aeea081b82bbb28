"""Real-TPU Mosaic compile+run check for the round-2 Pallas kernel families.

Round 2 added two kernel families initially verified only in interpret
mode: the NeRF++ background fused pair (`ops/pallas/fused_bg.py`) and
the idr-mode whole-render path (`ops/pallas/fused_train.py`). This
script compiles and executes BOTH on the real chip (forward AND
backward via jax.grad) and asserts parity against the XLA path, at two
shape points each:

* a toy shape (the interpret-mode test shapes — fast smoke), and
* the reference scale (8x256 skip@4 SDF net, feature 256, 4x256
  radiance net — `/root/reference/config/synthetic.yml:35-55` shapes),
  which exercises the real Mosaic tiling/padding paths the toy shapes
  may miss.

Usage (real TPU): python scripts/tpu_mosaic_check.py
Writes docs/evidence/mosaic_check_r3.json with device/commit metadata.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2sdf_tpu.utils.jax_cache import set_compilation_cache

set_compilation_cache()

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.models.mlp import (ImplicitNetConfig, RenderingNetConfig,
                                  implicit_net_apply, implicit_net_init,
                                  rendering_net_apply, rendering_net_init,
                                  sdf_outputs)
from i2sdf_tpu.ops.pallas.fused_bg import bg_core_fused, supports_bg_core
from i2sdf_tpu.ops.pallas.fused_train import (render_core_fused,
                                              supports_render_core)

# --- shape points -----------------------------------------------------------

BG_TOY = (
    ImplicitNetConfig(feature_vector_size=16, sdf_bounding_sphere=0.0,
                      d_in=4, dims=(48, 48, 48), skip_in=(1,),
                      geometric_init=False, embed_type="positional",
                      multires=3),
    RenderingNetConfig(feature_vector_size=16, mode="nerf", d_in=3,
                       dims=(32, 32), embed_type="positional", multires=2),
)
# reference-scale bg: 256-wide, multires 10/4 (NeRF++ bg nets at the
# reference's MLP width; no shipped config enables bg, so this bounds
# the shape coverage rather than mirroring a YAML)
BG_REF = (
    ImplicitNetConfig(feature_vector_size=256, sdf_bounding_sphere=0.0,
                      d_in=4, dims=(256,) * 8, skip_in=(4,),
                      geometric_init=False, embed_type="positional",
                      multires=10),
    RenderingNetConfig(feature_vector_size=256, mode="nerf", d_in=3,
                       dims=(256,) * 4, embed_type="positional",
                       multires=4),
)
# idr-mode whole-render at the reference scale (synthetic.yml shapes
# with mode=idr, bf16 compute like the shipped training path)
IDR_REF = (
    ImplicitNetConfig(feature_vector_size=256, sdf_bounding_sphere=0.0,
                      dims=(256,) * 8, skip_in=(4,), bias=0.6,
                      embed_type="positional", multires=6,
                      compute_dtype="bfloat16"),
    RenderingNetConfig(feature_vector_size=256, mode="idr", d_in=9,
                       dims=(256,) * 4, embed_type="positional",
                       multires=4, compute_dtype="bfloat16"),
)
IDR_TOY = (
    ImplicitNetConfig(feature_vector_size=16, sdf_bounding_sphere=0.0,
                      dims=(64, 64, 64, 64), skip_in=(2,), bias=0.6,
                      embed_type="positional", multires=4,
                      compute_dtype="bfloat16"),
    RenderingNetConfig(feature_vector_size=16, mode="idr", d_in=9,
                       dims=(32, 32), embed_type="positional",
                       multires=3, compute_dtype="bfloat16"),
)


def _rel(a, b):
    denom = float(jnp.max(jnp.abs(b))) or 1.0
    return float(jnp.max(jnp.abs(a - b))) / denom


def _cfg_desc(icfg, rcfg):
    return {"sdf_dims": list(icfg.dims), "feature": icfg.feature_vector_size,
            "rad_dims": list(rcfg.dims), "mode": rcfg.mode,
            "multires": [icfg.multires, rcfg.multires],
            "compute_dtype": icfg.compute_dtype}


def check_bg(icfg, rcfg, n=1024):
    assert supports_bg_core(icfg, rcfg)
    ki, kr = jax.random.split(jax.random.PRNGKey(0))
    pi = implicit_net_init(ki, icfg)
    pr = rendering_net_init(kr, rcfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def xla_pair(pi_, pr_, x_, d_):
        out = implicit_net_apply(pi_, icfg, x_)
        sigma, feat = out[:, :1], out[:, 1:]
        rgb = rendering_net_apply(pr_, rcfg, None, None, d_, feat)
        return sigma, rgb

    fused = jax.jit(lambda pi_, pr_, x_, d_: bg_core_fused(
        pi_, icfg, pr_, rcfg, x_, d_))
    s_f, r_f = fused(pi, pr, x, dirs)
    s_x, r_x = jax.jit(xla_pair)(pi, pr, x, dirs)

    def loss_fused(params):
        s, r = bg_core_fused(params[0], icfg, params[1], rcfg, x, dirs)
        return jnp.sum(s * 0.1) + jnp.sum(r)

    def loss_xla(params):
        s, r = xla_pair(params[0], params[1], x, dirs)
        return jnp.sum(s * 0.1) + jnp.sum(r)

    g_f = jax.jit(jax.grad(loss_fused))((pi, pr))
    g_x = jax.jit(jax.grad(loss_xla))((pi, pr))
    flat_f, _ = jax.flatten_util.ravel_pytree(g_f)
    flat_x, _ = jax.flatten_util.ravel_pytree(g_x)
    # the fused kernel computes with bf16 operands / f32 accumulation
    # vs the f32-operand XLA chain: forward gates are bf16-rounding-
    # scale; backward accumulates in f32 so it is the sharp gate.
    return {"config": _cfg_desc(icfg, rcfg),
            "forward_max_rel": {"sigma": _rel(s_f, s_x),
                                "rgb": _rel(r_f, r_x)},
            "backward_max_rel": _rel(flat_f, flat_x),
            "gates": {"forward": 2e-2, "backward": 5e-4}}


def check_render_core(icfg, rcfg, n=1024, bwd_gate=5e-3):
    assert supports_render_core(icfg, rcfg)
    p_imp = implicit_net_init(jax.random.PRNGKey(0), icfg)
    p_rad = rendering_net_init(jax.random.PRNGKey(1), rcfg)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(n, 3)) * 0.8, jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    gt_rgb = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)

    def xla_triplet(p_i, p_r):
        sdf, feat, grad = sdf_outputs(p_i, icfg, pts, returns_grad=True)
        rgb = rendering_net_apply(p_r, rcfg, pts, grad, dirs, feat)
        return sdf, grad, rgb

    def fused_triplet(p_i, p_r):
        return render_core_fused(p_i, icfg, p_r, rcfg, pts, dirs)

    s_f, g_f, r_f = jax.jit(fused_triplet)(p_imp, p_rad)
    s_x, g_x, r_x = jax.jit(xla_triplet)(p_imp, p_rad)

    def loss(triplet_fn, params):
        sdf, grad, rgb = triplet_fn(params[0], params[1])
        normals = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
        return (jnp.mean(jnp.abs(rgb - gt_rgb)) + 0.2 * jnp.mean(sdf ** 2)
                + 0.1 * jnp.mean(
                    (jnp.linalg.norm(grad, axis=-1) - 1) ** 2)
                + 0.05 * jnp.mean(normals))

    gr_f = jax.jit(jax.grad(lambda p: loss(fused_triplet, p)))(
        (p_imp, p_rad))
    gr_x = jax.jit(jax.grad(lambda p: loss(xla_triplet, p)))(
        (p_imp, p_rad))
    flat_f, _ = jax.flatten_util.ravel_pytree(gr_f)
    flat_x, _ = jax.flatten_util.ravel_pytree(gr_x)
    # both paths compute in bf16 (compute_dtype above) so they round
    # alike; residual divergence is scheduling-order rounding.
    return {"config": _cfg_desc(icfg, rcfg),
            "forward_max_rel": {"sdf": _rel(s_f, s_x),
                                "grad": _rel(g_f, g_x),
                                "rgb": _rel(r_f, r_x)},
            "backward_max_rel": _rel(flat_f, flat_x),
            "gates": {"forward": 3e-2, "backward": bwd_gate}}


def _passes(entry):
    fwd = entry["forward_max_rel"]
    ok_f = all(v < entry["gates"]["forward"] for v in fwd.values())
    return ok_f and entry["backward_max_rel"] < entry["gates"]["backward"]


def main():
    dev = jax.devices()[0]
    try:
        commit = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            text=True).strip()
    except Exception:
        commit = "unknown"
    result = {"platform": dev.platform, "device": str(dev),
              "commit": commit,
              "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "checks": {}}

    result["checks"]["bg_toy"] = check_bg(*BG_TOY)
    result["checks"]["bg_reference_scale"] = check_bg(*BG_REF)
    result["checks"]["idr_render_toy"] = check_render_core(*IDR_TOY)
    result["checks"]["idr_render_reference_scale"] = check_render_core(
        *IDR_REF)

    ok = dev.platform == "tpu" and all(
        _passes(c) for c in result["checks"].values())
    result["ok"] = bool(ok)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence",
        "mosaic_check_r3.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
