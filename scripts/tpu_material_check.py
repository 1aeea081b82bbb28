"""Real-TPU gate for the material-optimization stage.

Runs the full material pipeline on a generated scene with a
freshly-initialized (geometric-init sphere) reconstruction model:
emitter discovery, geometry bake through the eval render path, and N
jitted train steps with the FUSED Pallas SDF visibility path (the
Mosaic-lowered kernel under shade's spp-vmap — the one lowering CPU
interpret mode cannot prove). Asserts the loss is finite and decreasing
and prints one JSON line.

Usage: JAX_COMPILATION_CACHE_DIR=~/.jax_cache python scripts/tpu_material_check.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    import jax
    import numpy as np

    from i2sdf_tpu.config import CfgNode
    from i2sdf_tpu.data import generate_synthetic_scene
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.train.material import MaterialTrainer

    steps = int(os.environ.get("MAT_CHECK_STEPS", "60"))
    root = tempfile.mkdtemp(prefix="i2sdf_mat_check_")
    generate_synthetic_scene(os.path.join(root, "demo"), n_images=4,
                             img_res=(48, 64))

    conf = CfgNode({
        "train": {"split_n_pixels": 3072},
        "dataset": {"data_dir": "demo", "img_res": [48, 64],
                    "downsample": 1},
        "model": {
            "feature_vector_size": 256,
            "scene_bounding_sphere": 4.0,
            "implicit_network": {
                "d_in": 3, "d_out": 1, "dims": [256] * 8,
                "geometric_init": True, "bias": 0.6, "skip_in": [4],
                "weight_norm": True, "embed_type": "positional",
                "multires": 6,
            },
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [256] * 3,
                "weight_norm": True, "embed_type": "positional",
                "multires": 4,
            },
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {
                "near": 0.0, "N_samples": 64, "N_samples_eval": 128,
                "N_samples_extra": 32, "eps": 0.1, "beta_iters": 10,
                "max_total_iters": 5,
            },
        },
        "material": {
            "steps": steps, "batch_size": 1024, "spp": 8, "vis_steps": 16,
            "n_emitters": 1, "plot_freq": 0, "checkpoint_freq": 0,
            "min_weight_sum": 0.05,
            "material_network": {"dims": [256] * 4, "multires": 6},
        },
    })
    model_node = conf.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)

    exp_dir = os.path.join(root, "exp")
    os.makedirs(exp_dir, exist_ok=True)
    mt = MaterialTrainer(conf, exp_dir, recon_params=params, model_cfg=cfg,
                         data_root=root)  # fused=None -> Pallas on TPU

    losses = []
    t0 = time.time()
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, k = jax.random.split(key)
        mt.state, metrics = mt.step_fn(mt.state, mt.buffers, k)
        losses.append(float(metrics["rgb_loss"]))
    dt = time.time() - t0

    early = float(np.mean(losses[:5]))
    late = float(np.mean(losses[-5:]))
    ok = bool(np.isfinite(losses).all() and late < early)
    print(json.dumps({
        "ok": ok, "platform": jax.default_backend(),
        "rgb_loss_first5": round(early, 5), "rgb_loss_last5": round(late, 5),
        "steps_per_sec": round(steps / dt, 2),
        "baked_points": int(mt.buffers["points"].shape[0]),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
