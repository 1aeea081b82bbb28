"""Diagnostic: per-ray sampler convergence statistics at a trained ckpt.

Measures, for a real training-batch ray population at the checkpoint's
learned beta, the fraction of rays whose VolSDF error bound at beta0 is
already <= eps after each refinement round. This is the quantity that
decides whether the per-ray early exit (SamplerConfig.per_ray_exit)
pays: the global exit (jnp.all) needs EVERY ray converged, while the
compacted eval only needs the converged FRACTION to be large, and the
measured per-round fractions directly calibrate `per_ray_fracs`.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_per_ray.py \
      [exp_dir] [n_rays]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data.recon import ReconData, sample_batch
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.density import effective_beta
    from i2sdf_tpu.models.sampler import (_d_star, _get_error_bound,
                                          round_update, uniform_z_vals)
    from i2sdf_tpu.ops.pallas.fused_mlp import fused_sdf_mlp
    from i2sdf_tpu.models import mlp
    from i2sdf_tpu.train import create_train_state
    from i2sdf_tpu.train.checkpoint import CheckpointManager
    from i2sdf_tpu.utils.cameras import get_camera_params

    exp = sys.argv[1] if len(sys.argv) > 1 else "exps/quality_1/version_0"
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1600

    conf = load_cfg(os.path.join(exp, "config.yml"))
    model_node = conf.model
    model_node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params0 = renderer.init(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params0)
    ckpt = CheckpointManager(os.path.join(exp, "checkpoints", "orbax"))
    try:
        state, _ = ckpt.restore(state)
    except ValueError:
        # mid-bubble-window checkpoint: carries a pdf/sample_count entry
        # whose shape we can recover from the pdf snapshot next to it
        pdf = np.load(os.path.join(exp, "checkpoints", "pdf.npy"))
        tmpl = {"pdf": jnp.zeros(pdf.shape, jnp.float32),
                "sample_count": jnp.zeros(pdf.shape, jnp.int32)}
        state, _ = ckpt.restore(state, bubble_template=tmpl)
    params = state.params
    beta0 = float(effective_beta(params["beta"], cfg.beta_min))
    print(f"checkpoint step={int(state.step)} beta0={beta0:.3e}")

    ds_conf = dict(conf.dataset)
    ds_conf.pop("downsample", None)
    rd = ReconData(data_root="data", **ds_conf)
    data = rd.to_device()
    _, inputs, _ = sample_batch(data, jax.random.PRNGKey(7), n_rays)
    ray_dirs, cam_loc = get_camera_params(inputs["uv"], inputs["pose"],
                                          inputs["intrinsics"])
    ray_dirs = ray_dirs.reshape(-1, 3)
    cam_loc = cam_loc.reshape(-1, 3)
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)

    scfg = cfg.sampler

    def sdf_fn(p):
        return mlp.sdf_vals(params["implicit"], cfg.implicit, p)[:, 0]

    from functools import partial

    @partial(jax.jit, static_argnames=("beta0",))
    def probe(key, beta0):
        import math as _math
        R = ray_dirs.shape[0]
        z_vals = uniform_z_vals(scfg, key, ray_dirs, cam_loc,
                                scfg.N_samples_eval, True)
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        bound = (1.0 / (4.0 * _math.log(scfg.eps + 1.0))) \
            * jnp.sum(dists**2, -1)
        beta = jnp.sqrt(bound)
        samples = z_vals
        sdf = None
        fractions = []
        for it in range(scfg.max_total_iters - 1):
            pts = cam_loc[:, None, :] \
                + samples[..., None] * ray_dirs[:, None, :]
            new_sdf = sdf_fn(pts.reshape(-1, 3)).reshape(samples.shape)
            if sdf is None:
                sdf = new_sdf
            else:
                z_vals, sdf = jax.lax.sort(
                    (jnp.concatenate([z_vals, samples], -1),
                     jnp.concatenate([sdf, new_sdf], -1)),
                    dimension=-1, num_keys=1)
            d_star, dists = _d_star(z_vals, sdf)
            err = _get_error_bound(beta0, sdf, z_vals, dists, d_star)
            fractions.append(jnp.mean((err <= scfg.eps).astype(jnp.float32)))
            u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, scfg.N_samples_eval),
                                 (R, scfg.N_samples_eval))
            samples, beta = round_update(scfg, z_vals, sdf, beta, beta0, u,
                                         False)
        return jnp.stack(fractions)

    ladder = sorted({0.1, 0.03, 0.01, 0.003, 0.001, round(beta0, 6)},
                    reverse=True)
    for b in ladder:
        fr = np.asarray(probe(jax.random.PRNGKey(3), float(b)))
        tag = " (checkpoint)" if abs(b - beta0) < 1e-9 else ""
        print(f"beta0={b:.3e}{tag}: converged fraction after each round = "
              + ", ".join(f"{f:.3f}" for f in fr))


if __name__ == "__main__":
    main()
