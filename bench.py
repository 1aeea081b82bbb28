"""Benchmark: training rays/sec/chip on the flagship (synthetic.yml) config.

Runs the full jitted train step — on-device ray-batch gather, 5-round
error-bounded sampling (capacity for the reference's worst case of
~640 no-grad SDF evals/ray; converged rounds short-circuit via
lax.cond exactly like the reference's while-loop), forward, all
losses, eikonal double differentiation, Adam — at the reference's
shipped batch size (1600 rays/step,
`/root/reference/config/synthetic.yml:8`).

Baseline: the reference publishes no absolute throughput (BASELINE.md).
We use an estimated A6000 reference throughput of 4 steps/s x 1600 rays
= 6400 rays/s for `vs_baseline` (PyTorch step with ~5 sampler rounds +
double-backward on an A6000; documented estimate — reference hardware
is not available in this environment). Measured same-hardware anchor:
`scripts/bench_reference_torch.py` runs a clean-room torch re-creation
of the reference step next to this framework's step on THIS machine's
CPU — torch 4.3 rays/s vs jax 8.9 rays/s (2.05x on identical silicon),
so the A6000 estimate is the only remaining assumption in vs_baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 6400.0  # estimated A6000 reference (see docstring)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.jax_cache"))
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import CfgNode, load_cfg
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step

    conf = load_cfg(os.path.join(os.path.dirname(__file__),
                                 "configs", "synthetic.yml"))
    batch_size = conf.train.batch_size
    model_node = conf.model
    model_node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)

    # synthetic device-resident dataset at the reference's resolution
    n_img, H, W = 4, 480, 640
    hw = H * W
    rng = np.random.default_rng(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 550.0
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

    state, tx = create_train_state(
        params, learning_rate=conf.train.learning_rate,
        decay_steps=conf.train.steps)
    loss_cfg = LossConfig.from_cfgnode(conf.loss)
    step = make_train_step(cfg, tx, batch_size=batch_size)
    w = loss_cfg.dynamic_weights(0)

    key = jax.random.PRNGKey(1)

    # warmup / compile (value fetch, not block_until_ready: the axon
    # backend defers execution past block_until_ready, only a host
    # transfer forces the chain)
    key, k = jax.random.split(key)
    state, metrics = step(state, data, k, w)
    float(metrics["loss"])

    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
    assert np.isfinite(float(metrics["loss"]))  # forces the whole chain
    dt = time.perf_counter() - t0

    rays_per_sec = batch_size * n_steps / dt
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
