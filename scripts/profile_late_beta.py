"""Decompose the late-beta (beta=1e-3) train step cost on the real chip.

VERDICT round-2 #1: the schedule-weighted sustained rate is set by the
beta<=3e-3 regime (88% of the 200k schedule) where all 5 sampler rounds
run; the step measured 36.2 ms vs 28.3 ms at beta=0.1. This script
times, at a pinned beta:

  * the full jitted train step (reference point),
  * the sampler alone (error_bound_z_vals, fused kernels, jitted),
  * the sampler's building blocks in isolation at each round's S:
      - fused SDF MLP eval of one round's new points (1600 x 128),
      - the Pallas round kernel at S in {128, 256, 384, 512, 640},
      - the key+payload lax.sort merge at each S,
      - the final (R, 98) sort tail.

Prints one JSON line per measurement. Run on TPU:
    python scripts/profile_late_beta.py [--beta 1e-3] [--steps 30]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=30, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beta", type=float, default=1e-3)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=1600)
    args = ap.parse_args()

    from i2sdf_tpu.utils.jax_cache import set_compilation_cache
    set_compilation_cache()
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.sampler import error_bound_z_vals
    from i2sdf_tpu.ops.pallas.fused_mlp import fused_sdf_mlp
    from i2sdf_tpu.ops.pallas.sampler_round import (make_conv_check_impl,
                                                    make_round_impl,
                                                    sampler_round_pallas)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_cfg(os.path.join(repo, "configs", "synthetic.yml"))
    import copy
    node = copy.deepcopy(conf.model)
    node.use_normal = True
    node.density.params_init.beta = float(args.beta)
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    R = args.batch
    scfg = cfg.sampler

    out = {"beta": args.beta, "batch": R,
           "platform": jax.devices()[0].platform}

    # --- full train step ---------------------------------------------------
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step
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
    step = make_train_step(cfg, tx, batch_size=R)
    w = loss_cfg.dynamic_weights(0)

    # the train step donates state — rebind it each call
    key0 = jax.random.PRNGKey(1)
    st = state
    for _ in range(2):
        key0, k = jax.random.split(key0)
        st, m = step(st, data, k, w)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        key0, k = jax.random.split(key0)
        st, m = step(st, data, k, w)
    float(m["loss"])
    out["full_step_ms"] = (time.perf_counter() - t0) / args.steps * 1e3

    # --- sampler alone -----------------------------------------------------
    # the step donated `state` (which shared buffers with `params`) —
    # re-init fresh params for the isolated measurements
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(2)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ray_dirs = jnp.asarray(rd)
    cam_loc = jnp.asarray(np.tile([0.0, 0.0, -2.0], (R, 1)),
                          dtype=jnp.float32)

    def sdf_fn(pts):
        return fused_sdf_mlp(params["implicit"], cfg.implicit, pts)

    round_impl = make_round_impl(scfg)
    conv_impl = make_conv_check_impl(scfg)

    @jax.jit
    def sampler_only(key, ray_dirs, cam_loc):
        z, zbg, zeik = error_bound_z_vals(
            scfg, sdf_fn, key, ray_dirs, cam_loc, args.beta, True,
            round_impl=round_impl, conv_impl=conv_impl)
        return z

    out["sampler_ms"] = timeit(sampler_only, key, ray_dirs, cam_loc,
                               steps=args.steps)

    # --- in-context ablations ------------------------------------------------
    # (a) trivial SDF fn -> sampler minus MLP cost
    def cheap_sdf(pts):
        return pts[:, 0] * 0.1 + 0.05

    @jax.jit
    def sampler_cheap(key, ray_dirs, cam_loc):
        z, _, _ = error_bound_z_vals(
            scfg, cheap_sdf, key, ray_dirs, cam_loc, args.beta, True,
            round_impl=round_impl, conv_impl=conv_impl)
        return z

    out["sampler_cheap_sdf_ms"] = timeit(sampler_cheap, key, ray_dirs,
                                         cam_loc, steps=args.steps)

    # (b) beta_iters=2 -> bisection share of the round kernel
    import dataclasses as _dc
    scfg_b2 = _dc.replace(scfg, beta_iters=2)
    round_b2 = make_round_impl(scfg_b2)

    @jax.jit
    def sampler_b2(key, ray_dirs, cam_loc):
        z, _, _ = error_bound_z_vals(
            scfg_b2, sdf_fn, key, ray_dirs, cam_loc, args.beta, True,
            round_impl=round_b2)
        return z

    out["sampler_beta_iters2_ms"] = timeit(sampler_b2, key, ray_dirs,
                                           cam_loc, steps=args.steps)

    # (c) XLA round math instead of the Pallas kernel
    @jax.jit
    def sampler_xla_round(key, ray_dirs, cam_loc):
        z, _, _ = error_bound_z_vals(
            scfg, sdf_fn, key, ray_dirs, cam_loc, args.beta, True,
            round_impl=None)
        return z

    out["sampler_xla_round_ms"] = timeit(sampler_xla_round, key, ray_dirs,
                                         cam_loc, steps=args.steps)

    # (d) rounds 1..5
    for k_rounds in (1, 3):
        scfg_k = _dc.replace(scfg, max_total_iters=k_rounds)
        round_k = make_round_impl(scfg_k)

        @jax.jit
        def sampler_k(key, ray_dirs, cam_loc, _r=round_k, _c=scfg_k):
            z, _, _ = error_bound_z_vals(
                _c, sdf_fn, key, ray_dirs, cam_loc, args.beta, True,
                round_impl=_r)
            return z

        out[f"sampler_{k_rounds}rounds_ms"] = timeit(
            sampler_k, key, ray_dirs, cam_loc, steps=args.steps)

    # --- building blocks ----------------------------------------------------
    @jax.jit
    def mlp_round(pts):
        return sdf_fn(pts.reshape(-1, 3))

    pts = jax.random.normal(key, (R, scfg.N_samples_eval, 3))
    out["mlp_eval_per_round_ms"] = timeit(mlp_round, pts, steps=args.steps)

    n_eval = scfg.N_samples_eval
    rounds = []
    for i in range(scfg.max_total_iters):
        S = n_eval * (i + 1)
        z = jnp.sort(jax.random.uniform(key, (R, S)) * 6.0, axis=-1)
        s = jax.random.normal(key, (R, S)) * 0.3
        beta = jnp.full((R,), 0.05)
        final = i == scfg.max_total_iters - 1
        n_out = scfg.N_samples if final else n_eval
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_out), (R, n_out))

        def krn(z, s, beta, u):
            return sampler_round_pallas(
                z, s, beta, u, args.beta, beta_iters=scfg.beta_iters,
                eps=scfg.eps, add_tiny=scfg.add_tiny, final=final,
                block_rows=8)

        k_ms = timeit(krn, z, s, beta, u, steps=args.steps)

        new_z = jnp.sort(jax.random.uniform(key, (R, n_eval)) * 6.0, -1)
        new_s = jax.random.normal(key, (R, n_eval)) * 0.3

        @jax.jit
        def merge(z, s, nz, ns):
            return jax.lax.sort(
                (jnp.concatenate([z, nz], -1), jnp.concatenate([s, ns], -1)),
                dimension=-1, num_keys=1)

        m_ms = timeit(merge, z, s, new_z, new_s, steps=args.steps)
        rounds.append({"S": S, "round_kernel_ms": round(k_ms, 3),
                       "merge_sort_ms": round(m_ms, 3)})
    out["rounds"] = rounds

    # final (R, 64+32+2) sort tail
    zf = jax.random.uniform(key, (R, scfg.total_fg_samples)) * 6.0

    @jax.jit
    def fsort(z):
        return jnp.sort(z, axis=-1)

    out["final_sort_ms"] = round(timeit(fsort, zf, steps=args.steps), 3)

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
