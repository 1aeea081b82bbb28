"""DP weak-scaling microbench: per-device step time at 1/2/4/8 devices.

Weak scaling: each device keeps a constant per-device ray load
(`--rays-per-device`), so ideal scaling is FLAT per-step time as
devices are added (the only added cost is the gradient psum over ICI).
Runs on any backend:

* CPU shape-check (this environment):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/bench_scaling.py --tiny
  (virtual CPU devices share one socket, so per-step time GROWS with
  device count here — the run validates shardings and measures psum
  overhead shape, not real scaling)
* Real slice (when multi-chip hardware is available): run as-is; the
  flat-curve check becomes meaningful.

Prints one JSON line per device count + a summary line with the
parallel efficiency vs 1 device.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays-per-device", type=int, default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + 16 rays/device (CPU shape-check)")
    ap.add_argument("--max-devices", type=int, default=None)
    args = ap.parse_args()

    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()  # per-host subdir (stale cross-host CPU AOT crashes)
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import CfgNode, load_cfg
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.parallel import make_mesh, replicate_params
    from i2sdf_tpu.train import create_train_state, make_train_step

    n_avail = jax.device_count()
    rays_per_dev = args.rays_per_device or (16 if args.tiny else 1600)

    if args.tiny:
        model = {
            "feature_vector_size": 32,
            "scene_bounding_sphere": 3.0,
            "implicit_network": {
                "d_in": 3, "d_out": 1, "dims": [32, 32, 32, 32],
                "geometric_init": True, "bias": 0.6, "skip_in": [2],
                "weight_norm": True, "embed_type": "positional",
                "multires": 4},
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [32, 32],
                "weight_norm": True, "embed_type": "positional",
                "multires": 2},
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {
                "near": 0.0, "N_samples": 12, "N_samples_eval": 24,
                "N_samples_extra": 6, "eps": 0.1, "beta_iters": 4,
                "max_total_iters": 2},
        }
        node = CfgNode(model)
        lr, decay_steps = 5e-4, 1000
    else:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        conf = load_cfg(os.path.join(repo, "configs", "synthetic.yml"))
        node = conf.model
        lr, decay_steps = conf.train.learning_rate, conf.train.steps
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)

    # tiny device-resident dataset
    n_img, H, W = 2, 48, 64
    hw = H * W
    rng = np.random.default_rng(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 55.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.0]
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    uv = np.stack([jj, ii], -1).reshape(-1, 2).astype(np.float32)
    data = DeviceArrays(
        uv=jnp.asarray(uv),
        intrinsics=jnp.asarray(np.broadcast_to(K, (n_img, 4, 4))),
        pose=jnp.asarray(np.broadcast_to(pose, (n_img, 4, 4))),
        rgb=jnp.asarray(rng.uniform(0, 1, (n_img, hw, 3)), jnp.float32),
        mask=None, light_mask=None,
        depth=jnp.asarray(rng.uniform(0.5, 4, (n_img, hw)), jnp.float32),
        depth_mask=jnp.ones((n_img, hw), bool),
        normal=jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_img, hw, 1)),
                           jnp.float32),
        normal_mask=jnp.ones((n_img, hw), bool),
        pointcloud=None, pointlinks=None, pixlinks=None,
    )
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    w = loss_cfg.dynamic_weights(0)

    limit = min(n_avail, args.max_devices or n_avail)
    counts = [n for n in (1, 2, 4, 8) if n <= limit]
    rows = []
    for n_dev in counts:
        mesh = make_mesh(n_dev)
        batch = rays_per_dev * n_dev
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        params = replicate_params(mesh, params)
        state, tx = create_train_state(params, learning_rate=lr,
                                       decay_steps=decay_steps)
        step = make_train_step(cfg, tx, batch_size=batch, mesh=mesh,
                               donate=False)
        key = jax.random.PRNGKey(1)
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        float(metrics["loss"])  # compile + settle
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            state, metrics = step(state, data, k, w)
        assert np.isfinite(float(metrics["loss"]))
        dt = (time.perf_counter() - t0) / args.steps
        rows.append({"devices": n_dev, "batch": batch,
                     "ms_per_step": round(dt * 1e3, 2),
                     "rays_per_sec": round(batch / dt, 1)})
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["ms_per_step"]
    summary = {
        "metric": "dp_weak_scaling",
        "rays_per_device": rays_per_dev,
        "efficiency_vs_1dev": {
            str(r["devices"]): round(base / r["ms_per_step"], 3)
            for r in rows},
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
