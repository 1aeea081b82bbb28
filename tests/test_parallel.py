"""Multi-chip data parallelism on the 8-virtual-device CPU mesh:
sharded training must match single-device numerics (same program, XLA
inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.config import CfgNode
from i2sdf_tpu.data.recon import DeviceArrays
from i2sdf_tpu.models import renderer
from i2sdf_tpu.models.losses import LossConfig
from i2sdf_tpu.parallel import make_mesh, replicate_params, shard_batch
from i2sdf_tpu.train import create_train_state, make_train_step

TINY = {
    "feature_vector_size": 16,
    "scene_bounding_sphere": 3.0,
    "implicit_network": {
        "d_in": 3, "d_out": 1, "dims": [16, 16], "geometric_init": True,
        "bias": 0.6, "skip_in": [], "weight_norm": True,
        "embed_type": "positional", "multires": 2,
    },
    "rendering_network": {
        "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [16],
        "weight_norm": True, "embed_type": "positional", "multires": 2,
    },
    "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
    "ray_sampler": {
        "near": 0.0, "N_samples": 8, "N_samples_eval": 16,
        "N_samples_extra": 4, "eps": 0.1, "beta_iters": 2,
        "max_total_iters": 2,
    },
}


def make_data(n_img=2, hw=64):
    rng = np.random.default_rng(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 10.0
    K[0, 2] = K[1, 2] = 4.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.0]
    jj, ii = np.meshgrid(np.arange(8), np.arange(8))
    uv = np.stack([jj, ii], -1).reshape(-1, 2).astype(np.float32)
    return DeviceArrays(
        uv=jnp.asarray(uv),
        intrinsics=jnp.asarray(np.broadcast_to(K, (n_img, 4, 4))),
        pose=jnp.asarray(np.broadcast_to(pose, (n_img, 4, 4))),
        rgb=jnp.asarray(rng.uniform(0, 1, (n_img, hw, 3)), jnp.float32),
        mask=None, light_mask=None,
        depth=jnp.asarray(rng.uniform(1, 3, (n_img, hw)), jnp.float32),
        depth_mask=jnp.ones((n_img, hw), bool),
        normal=jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_img, hw, 1)),
                           jnp.float32),
        normal_mask=jnp.ones((n_img, hw), bool),
        pointcloud=None, pointlinks=None, pixlinks=None,
    )


def setup():
    node = CfgNode(TINY)
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=100)
    w = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                   normal_weight=0.05).dynamic_weights(0)
    return cfg, state, tx, w


@pytest.mark.multidevice
def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.multidevice
def test_sharded_step_matches_single_device():
    cfg, state, tx, w = setup()
    data = make_data()
    key = jax.random.PRNGKey(3)
    batch = 32  # divisible by 8

    step_single = make_train_step(cfg, tx, batch_size=batch, donate=False)
    s1, m1 = step_single(state, data, key, w)

    mesh = make_mesh(8)
    params_r = replicate_params(mesh, state.params)
    state_r = state._replace(params=params_r)
    step_sharded = make_train_step(cfg, tx, batch_size=batch, mesh=mesh,
                                   donate=False)
    s2, m2 = step_sharded(state_r, data, key, w)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


@pytest.mark.multidevice
def test_sharded_multi_step_stays_finite():
    cfg, state, tx, w = setup()
    data = make_data()
    mesh = make_mesh(8)
    state = state._replace(params=replicate_params(mesh, state.params))
    step = make_train_step(cfg, tx, batch_size=64, mesh=mesh)
    key = jax.random.PRNGKey(0)
    for _ in range(5):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 5


@pytest.mark.multidevice
def test_sharded_bubble_step_matches_single_device():
    """The bubble path under DP: (P,) pdf replicated, batch (and the
    gathered pointcloud rows) sharded; the scatter update and sample
    counts must match single-device numerics."""
    cfg, state, tx, w = setup()
    data = make_data()
    rng = np.random.default_rng(1)
    P = 50
    data = data._replace(
        pointcloud=jnp.asarray(rng.uniform(-1, 1, (P, 3)), jnp.float32),
        pointlinks=jnp.asarray(rng.integers(-1, P, size=(2 * 64,)),
                               jnp.int32))
    w = LossConfig(eikonal_weight=0.1, depth_weight=0.1, bubble_weight=0.5,
                   min_bubble_iter=0, max_bubble_iter=10
                   ).dynamic_weights(0)
    pdf0 = jnp.asarray(rng.uniform(0.1, 1.0, (P,)), jnp.float32)
    sc0 = jnp.zeros((P,), jnp.int32)
    key = jax.random.PRNGKey(5)
    kwargs = dict(batch_size=32, bubble=True, pdf_prune=0.05, pdf_max=0.2,
                  donate=False)

    step1 = make_train_step(cfg, tx, **kwargs)
    s1, m1, pdf1, sc1 = step1(state, data, key, w, pdf0, sc0)

    mesh = make_mesh(8)
    state_r = state._replace(params=replicate_params(mesh, state.params))
    step8 = make_train_step(cfg, tx, mesh=mesh, **kwargs)
    s8, m8, pdf8, sc8 = step8(state_r, data, key, w,
                              replicate_params(mesh, pdf0),
                              replicate_params(mesh, sc0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["bubble_loss"]),
                               float(m8["bubble_loss"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(pdf1), np.asarray(pdf8),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc8))


def test_graft_entry_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.multidevice
def test_sharded_eval_render():
    from i2sdf_tpu.train.step import make_eval_render_fn

    cfg, state, _, _ = setup()
    mesh = make_mesh(8)
    params = replicate_params(mesh, state.params)
    render_image, _ = make_eval_render_fn(cfg, chunk_size=64, mesh=mesh,
                                          fused_sampler=False)
    K = jnp.eye(4).at[0, 0].set(10.0).at[1, 1].set(10.0) \
        .at[0, 2].set(4.0).at[1, 2].set(4.0)
    pose = jnp.eye(4).at[2, 3].set(-2.0)
    jj, ii = np.meshgrid(np.arange(8), np.arange(8))
    uv = jnp.asarray(np.stack([jj, ii], -1).reshape(-1, 2), jnp.float32)
    out = render_image(params, uv, K, pose)
    assert out["rgb_values"].shape == (64, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb_values"])))


@pytest.mark.multidevice
def test_sharded_fused_train_step_matches_single_device(monkeypatch):
    """The fused custom-VJP kernels (v2/v3) under the DP mesh: XLA's
    SPMD partitioner must handle the pallas custom-calls (interpret
    mode on CPU) and reproduce the single-device loss exactly."""
    from functools import partial

    from i2sdf_tpu.ops.pallas import fused_rev as _frev
    from i2sdf_tpu.ops.pallas import fused_train as _ftrain

    monkeypatch.setattr(
        _ftrain, "render_core_fused",
        partial(_ftrain.render_core_fused, block_rows=8, interpret=True))
    monkeypatch.setattr(
        _frev, "sdf_outputs_fused_rev",
        partial(_frev.sdf_outputs_fused_rev, block_rows=8,
                interpret=True))

    cfg, state, tx, w = setup()
    data = make_data()
    mesh = make_mesh(8)
    state_m = state._replace(params=replicate_params(mesh, state.params))
    step_m = make_train_step(cfg, tx, batch_size=32, mesh=mesh,
                             donate=False, fused_sampler=False,
                             fused_train_grad=True)
    step_1 = make_train_step(cfg, tx, batch_size=32, donate=False,
                             fused_sampler=False, fused_train_grad=True)
    key = jax.random.PRNGKey(5)
    _, m_m = step_m(state_m, data, key, w)
    _, m_1 = step_1(state, data, key, w)
    np.testing.assert_allclose(float(m_m["loss"]), float(m_1["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
@pytest.mark.multidevice
def test_weak_scaling_bench_runs():
    """The DP weak-scaling microbench (scripts/bench_scaling.py) must run
    end-to-end on the virtual mesh and report sane rows (SURVEY §2c:
    scaling harness ready for real multi-chip hardware)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "bench_scaling.py"),
         "--tiny", "--steps", "2", "--max-devices", "2"],
        capture_output=True, text=True, timeout=900,
        cwd=repo, env=os.environ)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    rows = [l for l in lines if "devices" in l]
    summary = [l for l in lines if l.get("metric") == "dp_weak_scaling"]
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[1]["batch"] == 2 * rows[0]["batch"]
    assert summary and "2" in summary[0]["efficiency_vs_1dev"]


@pytest.mark.multidevice
def test_per_ray_sharded_step_matches_single_device():
    """Per-ray compaction under DP sharding: the global unconverged-first
    argsort + gather/scatter induce cross-shard collectives — the
    sharded step must still match single-device numerics exactly."""
    import dataclasses

    cfg, state, tx, w = setup()
    cfg = dataclasses.replace(
        cfg, sampler=dataclasses.replace(
            cfg.sampler, per_ray_exit=True, per_ray_fracs=(0.5,),
            max_total_iters=3, eps=1e-6))  # tight eps: real overflow
    data = make_data()
    mesh = make_mesh(8)
    state_m = state._replace(params=replicate_params(mesh, state.params))
    step_m = make_train_step(cfg, tx, batch_size=32, mesh=mesh,
                             donate=False, fused_sampler=False)
    step_1 = make_train_step(cfg, tx, batch_size=32, donate=False,
                             fused_sampler=False)
    key = jax.random.PRNGKey(9)
    _, m_m = step_m(state_m, data, key, w)
    _, m_1 = step_1(state, data, key, w)
    assert np.isfinite(float(m_m["loss"]))
    np.testing.assert_allclose(float(m_m["loss"]), float(m_1["loss"]),
                               rtol=1e-4)


def test_multihost_placement_path_matches_device_put():
    """parallel/mesh.py routes array creation through
    make_array_from_callback when process_count > 1 (device_put cannot
    place cross-host shards). Fake a 2-process world on the CPU mesh:
    the callback path must produce identical values and shardings."""
    import numpy as np

    from i2sdf_tpu.parallel import make_mesh, replicate_params, shard_batch
    from i2sdf_tpu.parallel import mesh as mesh_mod

    mesh = make_mesh(4)
    x = np.arange(4 * 6, dtype=np.float32).reshape(4, 6)
    ref_sharded = shard_batch(mesh, {"x": x})["x"]
    ref_repl = replicate_params(mesh, {"w": x})["w"]

    orig = mesh_mod.jax.process_count
    mesh_mod.jax.process_count = lambda: 2
    try:
        got_sharded = shard_batch(mesh, {"x": x})["x"]
        got_repl = replicate_params(mesh, {"w": x})["w"]
    finally:
        mesh_mod.jax.process_count = orig

    np.testing.assert_array_equal(np.asarray(got_sharded), x)
    np.testing.assert_array_equal(np.asarray(got_repl), x)
    assert got_sharded.sharding == ref_sharded.sharding
    assert got_repl.sharding == ref_repl.sharding


def test_initialize_multihost_exported():
    from i2sdf_tpu.parallel import initialize_multihost  # noqa: F401
