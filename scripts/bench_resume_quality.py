"""Sustained late-schedule throughput on the REAL quality run.

Resumes the 200k-step quality checkpoint (exps/quality_1) — real scene
data, trained weights, the final learned beta (~9e-4: the regime that
dominates the 200k schedule's wall clock) — and measures full train-step
time with the per-ray compacted sampler off and on. This is the honest
"sustained" number to report next to the early/mid-regime bench.py peak
(VERDICT r1 weak #2).

Usage (real TPU; cache set up automatically, env var overrides base): \
    python scripts/bench_resume_quality.py [--steps 100] [--exp ...]
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
    ap.add_argument("--exp", default="exps/quality_1/version_0")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=None,
                    help="override train.batch_size (CPU smoke tests)")
    ap.add_argument("--beta", type=float, default=None,
                    help="override the learned beta leaf before "
                         "measuring (mid-schedule regimes where the "
                         "error-bound-gated per-ray ladder is active)")
    args = ap.parse_args()

    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()  # per-host subdir (stale cross-host CPU AOT crashes)
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data.recon import ReconData
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.density import effective_beta
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step
    from i2sdf_tpu.train.checkpoint import CheckpointManager
    from i2sdf_tpu.train.step import per_ray_fracs_for_beta

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = args.exp if os.path.isabs(args.exp) else os.path.join(repo,
                                                                args.exp)
    conf = load_cfg(os.path.join(exp, "config.yml"))
    node = conf.model
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params0 = renderer.init(jax.random.PRNGKey(0), cfg)
    state0, tx = create_train_state(
        params0, learning_rate=conf.train.learning_rate,
        decay_steps=conf.train.steps)
    ckpt = CheckpointManager(os.path.join(exp, "checkpoints", "orbax"))
    state0, _ = ckpt.restore(state0)
    ckpt.close()
    if args.beta is not None:
        state0 = state0._replace(params={
            **state0.params,
            "beta": jnp.asarray(args.beta, jnp.float32)})
    beta = float(effective_beta(state0.params["beta"], cfg.beta_min))
    step_at = int(state0.step)
    print(f"# resumed step {step_at}, beta {beta:.3e}", file=sys.stderr)

    ds_conf = dict(conf.dataset)
    ds_conf.pop("downsample", None)
    rd = ReconData(data_root=os.path.join(repo, "data"), use_depth=True,
                   use_normal=True, **ds_conf)
    data = rd.to_device()
    loss_cfg = LossConfig.from_cfgnode(conf.loss)
    w = loss_cfg.dynamic_weights(step_at)
    batch = args.batch or conf.train.batch_size

    def measure(per_ray):
        import dataclasses

        fr = per_ray_fracs_for_beta(beta) if per_ray else None
        c = cfg
        if fr is not None:
            c = dataclasses.replace(
                cfg, sampler=dataclasses.replace(
                    cfg.sampler, per_ray_exit=True, per_ray_fracs=fr))
        step = make_train_step(c, tx, batch_size=batch, donate=False)
        st = state0
        key = jax.random.PRNGKey(5)
        key, k = jax.random.split(key)
        st, m = step(st, data, k, w)
        loss0 = float(m["loss"])  # compile + settle
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            st, m = step(st, data, k, w)
        loss1 = float(m["loss"])
        assert np.isfinite(loss1)
        dt = (time.perf_counter() - t0) / args.steps
        return dt * 1e3, loss0, loss1, fr

    ms_off, l0a, l1a, _ = measure(False)
    ms_on, l0b, l1b, fr = measure(True)
    print(json.dumps({
        "metric": "sustained_late_schedule",
        "resume_step": step_at, "beta": round(beta, 6),
        "batch": batch, "steps": args.steps,
        "ms_global": round(ms_off, 2),
        "rays_per_sec_global": round(batch / ms_off * 1e3, 1),
        "ms_per_ray": round(ms_on, 2),
        "rays_per_sec_per_ray": round(batch / ms_on * 1e3, 1),
        "per_ray_fracs": list(fr) if fr else None,
        "speedup": round(ms_off / ms_on, 3),
        "loss_final_global": round(l1a, 6),
        "loss_final_per_ray": round(l1b, 6),
    }))


if __name__ == "__main__":
    main()
