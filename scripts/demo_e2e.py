"""End-to-end demo: synthesize a scene, train, render, report PSNR.

Usage: python scripts/demo_e2e.py [--steps 300] [--out /tmp/i2sdf_demo]
Runs on whatever backend JAX selects (CPU by default here).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/i2sdf_demo")
    args = ap.parse_args()

    from i2sdf_tpu.config import CfgNode
    from i2sdf_tpu.data import ReconData, generate_synthetic_scene
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import (create_train_state, make_eval_render_fn,
                                 make_train_step)
    from i2sdf_tpu.utils.imaging import psnr

    os.makedirs(args.out, exist_ok=True)
    data_root = os.path.join(args.out, "data")
    scan = generate_synthetic_scene(os.path.join(data_root, "demo"),
                                    n_images=6, img_res=(48, 64))
    print(f"[demo] scene written to {scan}")

    ds = ReconData("demo", scan_id=0, data_root=data_root,
                   use_depth=True, use_normal=True)
    data = ds.to_device()
    print(f"[demo] dataset: {ds.n_images} images, {ds.total_pixels} px each")

    model = {
        "feature_vector_size": 64,
        "scene_bounding_sphere": 4.0,
        "implicit_network": {
            "d_in": 3, "d_out": 1, "dims": [64, 64, 64, 64],
            "geometric_init": True, "bias": 0.6, "skip_in": [2],
            "weight_norm": True, "embed_type": "positional", "multires": 6,
        },
        "rendering_network": {
            "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [64, 64],
            "weight_norm": True, "embed_type": "positional", "multires": 4,
        },
        "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
        "ray_sampler": {
            "near": 0.0, "N_samples": 16, "N_samples_eval": 32,
            "N_samples_extra": 8, "eps": 0.1, "beta_iters": 6,
            "max_total_iters": 3,
        },
    }
    node = CfgNode(model)
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=args.steps * 10)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    step = make_train_step(cfg, tx, batch_size=256)
    w = loss_cfg.dynamic_weights(0)

    render_image, _ = make_eval_render_fn(cfg, chunk_size=512)

    def eval_psnr(params):
        out = render_image(params, data.uv, data.intrinsics[0], data.pose[0])
        return float(psnr(out["rgb_values"], data.rgb[0])), out

    p0, out0 = eval_psnr(state.params)
    print(f"[demo] initial PSNR: {p0:.2f} dB")

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        if (i + 1) % 100 == 0:
            print(f"[demo] step {i+1}: loss={float(metrics['loss']):.4f} "
                  f"psnr={float(metrics['psnr']):.2f} "
                  f"({(i+1)/(time.perf_counter()-t0):.1f} steps/s)")

    p1, out1 = eval_psnr(state.params)
    print(f"[demo] final PSNR: {p1:.2f} dB (was {p0:.2f})")

    import cv2

    H, W = ds.img_res
    pred = np.asarray(out1["rgb_values"]).reshape(H, W, 3)
    gt = ds.rgb_images[0].reshape(H, W, 3)
    depth = np.asarray(out1["depth_values"]).reshape(H, W)
    depth_vis = cv2.applyColorMap(
        (np.clip(depth / 4.0, 0, 1) * 255).astype(np.uint8),
        cv2.COLORMAP_VIRIDIS)
    normal = np.asarray(out1["normal_map"]).reshape(H, W, 3)
    panel = np.concatenate([
        (gt[:, :, ::-1] * 255).astype(np.uint8),
        (np.clip(pred[:, :, ::-1], 0, 1) * 255).astype(np.uint8),
        depth_vis,
        ((normal[:, :, ::-1] + 1) / 2 * 255).astype(np.uint8),
    ], axis=1)
    out_png = os.path.join(args.out, "panel.png")
    cv2.imwrite(out_png, panel)
    print(f"[demo] wrote {out_png} (gt | pred | depth | normal)")

    assert p1 > p0 + 2.0, f"PSNR did not improve enough: {p0} -> {p1}"
    print("[demo] OK")


if __name__ == "__main__":
    main()
