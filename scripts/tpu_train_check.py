"""TPU training-quality check: flagship model + fused Pallas kernels on
the synthetic scene; PSNR must climb. Usage:
    python scripts/tpu_train_check.py [--steps 500]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="/tmp/i2sdf_tpu_check")
    ap.add_argument("--batch", type=int, default=1600)
    args = ap.parse_args()

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data import ReconData, generate_synthetic_scene
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import (create_train_state, make_eval_render_fn,
                                 make_train_step)
    from i2sdf_tpu.utils.imaging import psnr

    os.makedirs(args.out, exist_ok=True)
    data_root = os.path.join(args.out, "data")
    scan = generate_synthetic_scene(os.path.join(data_root, "demo"),
                                    n_images=6, img_res=(120, 160))
    ds = ReconData("demo", scan_id=0, data_root=data_root, use_depth=True,
                   use_normal=True)
    data = ds.to_device()
    print(f"[check] scene {scan}: {ds.n_images} x {ds.img_res}")

    conf = load_cfg(os.path.join(os.path.dirname(__file__), "..",
                                 "configs", "synthetic.yml"))
    model_node = conf.model
    model_node.scene_bounding_sphere = 4.0
    model_node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=max(args.steps * 10, 1000))
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    step = make_train_step(cfg, tx, batch_size=args.batch)
    w = loss_cfg.dynamic_weights(0)
    render_image, _ = make_eval_render_fn(cfg, chunk_size=12000)

    def eval_psnr():
        out = render_image(state.params, data.uv, data.intrinsics[0],
                           data.pose[0])
        return float(psnr(out["rgb_values"], data.rgb[0])), out

    p0, _ = eval_psnr()
    print(f"[check] initial PSNR {p0:.2f} dB")
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        if (i + 1) % 100 == 0:
            l = float(metrics["loss"])
            print(f"[check] step {i+1}: loss={l:.4f} "
                  f"psnr={float(metrics['psnr']):.2f} "
                  f"({(i+1)/(time.perf_counter()-t0):.2f} steps/s)")
    p1, out = eval_psnr()
    print(f"[check] final PSNR {p1:.2f} dB (was {p0:.2f})")

    import cv2

    H, W = ds.img_res
    pred = np.asarray(out["rgb_values"]).reshape(H, W, 3)
    gt = ds.rgb_images[0].reshape(H, W, 3)
    normal = np.asarray(out["normal_map"]).reshape(H, W, 3)
    panel = np.concatenate([
        (np.clip(gt[:, :, ::-1], 0, 1) * 255).astype(np.uint8),
        (np.clip(pred[:, :, ::-1], 0, 1) * 255).astype(np.uint8),
        ((np.clip(normal[:, :, ::-1], -1, 1) + 1) / 2 * 255).astype(
            np.uint8),
    ], axis=1)
    cv2.imwrite(os.path.join(args.out, "panel.png"), panel)
    print(f"[check] wrote {os.path.join(args.out, 'panel.png')}")
    assert p1 > p0 + 5.0, f"PSNR did not improve enough: {p0} -> {p1}"
    print("[check] OK")


if __name__ == "__main__":
    main()
