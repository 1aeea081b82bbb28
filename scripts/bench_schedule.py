"""Schedule sweep: train-step time across the beta ladder, +/- per-ray.

The learned beta decays ~0.1 -> ~9e-4 over the 200k reference schedule,
and the sampler's cost regime changes with it (global early exit
converges by round 1-2 at large beta; at small beta all 5 rounds run —
docs/PERFORMANCE.md). This sweep measures the full jitted train step at
a ladder of pinned betas, with the per-ray compacted sampler off and on
(at the beta-matched capacity phase, train/step.py PER_RAY_PHASES), and
prints a JSON table plus a schedule-weighted average.

The weights approximate the fraction of the 200k run spent in each beta
decade (from the quality-run TB beta curve: beta passes 0.05 by ~2k
steps, 0.02 by ~8k, 0.005 by ~35k, so ~80% of the schedule runs at
beta < 5e-3).

Usage (real TPU; cache set up automatically, env var overrides base): \
    python scripts/bench_schedule.py [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (beta, schedule weight): fraction of the 200k run spent near this beta
LADDER = (
    (0.1, 0.01),
    (0.03, 0.03),
    (0.01, 0.08),
    (0.003, 0.28),
    (0.001, 0.60),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()  # per-host subdir (stale cross-host CPU AOT crashes)
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step
    from i2sdf_tpu.train.step import per_ray_fracs_for_beta

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_cfg(os.path.join(repo, "configs", "synthetic.yml"))
    batch_size = args.batch or conf.train.batch_size

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

    def measure(beta, per_ray):
        import copy

        node = copy.deepcopy(conf.model)
        node.use_normal = True
        node.density.params_init.beta = float(beta)
        fracs = per_ray_fracs_for_beta(beta) if per_ray else None
        if per_ray and fracs is not None:
            node.ray_sampler.per_ray_exit = True
            node.ray_sampler.per_ray_fracs = list(fracs)
        cfg = renderer.I2SDFConfig.from_cfgnode(node)
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        state, tx = create_train_state(
            params, learning_rate=conf.train.learning_rate,
            decay_steps=conf.train.steps)
        loss_cfg = LossConfig.from_cfgnode(conf.loss)
        step = make_train_step(cfg, tx, batch_size=batch_size)
        w = loss_cfg.dynamic_weights(0)
        key = jax.random.PRNGKey(1)
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        float(metrics["loss"])  # force compile + run
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            state, metrics = step(state, data, k, w)
        assert np.isfinite(float(metrics["loss"]))
        dt = (time.perf_counter() - t0) / args.steps
        return dt * 1e3, fracs

    rows = []
    for beta, weight in LADDER:
        ms_off, _ = measure(beta, per_ray=False)
        ms_on, fracs = measure(beta, per_ray=True)
        rows.append({"beta": beta, "weight": weight,
                     "ms_global": round(ms_off, 2),
                     "ms_per_ray": round(ms_on, 2),
                     "fracs": list(fracs) if fracs else None,
                     "speedup": round(ms_off / ms_on, 3)})
        print(json.dumps(rows[-1]), flush=True)

    wavg_off = sum(r["ms_global"] * r["weight"] for r in rows)
    wavg_on = sum(r["ms_per_ray"] * r["weight"] for r in rows)
    summary = {
        "schedule_weighted_ms_global": round(wavg_off, 2),
        "schedule_weighted_ms_per_ray": round(wavg_on, 2),
        "schedule_weighted_rays_per_sec_global":
            round(batch_size / wavg_off * 1e3, 1),
        "schedule_weighted_rays_per_sec_per_ray":
            round(batch_size / wavg_on * 1e3, 1),
        "batch_size": batch_size,
        "steps": args.steps,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
