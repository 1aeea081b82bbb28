"""Capture a device trace of the late-beta train step and print the
top ops by self time (parsed from the profiler xplane via the
tensorboard profile plugin). Instrumentation companion to
scripts/profile_late_beta.py.

Usage: python scripts/trace_op_stats.py [--beta 1e-3] [--steps 8]
"""

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beta", type=float, default=1e-3)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/i2sdf_trace")
    args = ap.parse_args()

    from i2sdf_tpu.utils.jax_cache import set_compilation_cache
    set_compilation_cache()
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data.recon import DeviceArrays
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_cfg(os.path.join(repo, "configs", "synthetic.yml"))
    import copy
    node = copy.deepcopy(conf.model)
    node.use_normal = True
    node.density.params_init.beta = float(args.beta)
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    R = conf.train.batch_size

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

    key = jax.random.PRNGKey(1)
    st = state
    for _ in range(3):  # compile + settle
        key, k = jax.random.split(key)
        st, m = step(st, data, k, w)
    float(m["loss"])

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        st, m = step(st, data, k, w)
    float(m["loss"])
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured"}))
        return
    xplane = xplanes[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data_out, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats", {"tqx": "out:csv"})
    if isinstance(data_out, bytes):
        data_out = data_out.decode()
    import csv
    import io
    rows = list(csv.DictReader(io.StringIO(data_out)))
    # device-side ops only, sorted by total self time
    dev = [r for r in rows if r.get("host_or_device", "").lower() != "host"]
    key_f = None
    for cand in ("total_self_time", "total_self_time_in_us",
                 "self_time_us", "total_self_time_us"):
        if dev and cand in dev[0]:
            key_f = cand
            break
    if key_f is None and dev:
        print("columns:", list(dev[0].keys()))
        return
    dev.sort(key=lambda r: -float(r[key_f] or 0))
    total = sum(float(r[key_f] or 0) for r in dev)
    print(f"# total device self time: {total/1e3:.2f} ms over "
          f"{args.steps} steps -> {total/1e3/args.steps:.3f} ms/step")
    for r in dev[:args.top]:
        t = float(r[key_f] or 0)
        print(f"{t/args.steps/1e3:8.3f} ms/step  {100*t/total:5.1f}%  "
              f"{r.get('operation', r.get('op_name', '?'))[:110]}")


if __name__ == "__main__":
    main()
