from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.config import CfgNode
from i2sdf_tpu.models import renderer
from i2sdf_tpu.models.losses import LossConfig, compute_losses


def jit_render(cfg):
    """Jit the forward (eager per-op dispatch is ~2ms — see conftest)."""
    @partial(jax.jit, static_argnames=("training", "predict_only"))
    def f(params, inputs, key, training, predict_only=False):
        return renderer.render_rays(params, cfg, inputs, key,
                                    training=training,
                                    predict_only=predict_only)
    return f

TINY_MODEL = {
    "feature_vector_size": 32,
    "scene_bounding_sphere": 3.0,
    "implicit_network": {
        "d_in": 3, "d_out": 1, "dims": [32, 32, 32, 32],
        "geometric_init": True, "bias": 0.6, "skip_in": [2],
        "weight_norm": True, "embed_type": "positional", "multires": 4,
    },
    "rendering_network": {
        "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [32, 32],
        "weight_norm": True, "embed_type": "positional", "multires": 2,
    },
    "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
    "ray_sampler": {
        "near": 0.0, "N_samples": 12, "N_samples_eval": 24,
        "N_samples_extra": 6, "eps": 0.1, "beta_iters": 4,
        "max_total_iters": 2, "N_samples_inverse_sphere": 8,
        "add_tiny": 1e-6,
    },
}


def make_cfg(extra=None, use_normal=True):
    d = dict(TINY_MODEL)
    if extra:
        d.update(extra)
    node = CfgNode(d)
    node.use_normal = use_normal
    return renderer.I2SDFConfig.from_cfgnode(node)


def make_inputs(B=1, N=6):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2] = K[1, 2] = 50.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -2.0]
    rng = np.random.default_rng(0)
    uv = rng.uniform(30, 70, (B, N, 2)).astype(np.float32)
    return {
        "uv": jnp.asarray(uv),
        "intrinsics": jnp.asarray(np.broadcast_to(K, (B, 4, 4))),
        "pose": jnp.asarray(np.broadcast_to(pose, (B, 4, 4))),
    }


def test_train_forward_outputs():
    cfg = make_cfg()
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    out = jit_render(cfg)(params, make_inputs(), jax.random.PRNGKey(1),
                          training=True)
    R = 6
    assert out["rgb_values"].shape == (R, 3)
    assert out["depth_values"].shape == (R,)
    assert out["weight_sum"].shape == (R, 1)
    assert out["grad_theta"].shape == (2 * R, 3)
    assert out["diff_norm"].shape == (R,)
    assert out["normal_values"].shape == (R, 3)
    for v in out.values():
        assert bool(jnp.all(jnp.isfinite(v)))
    rgb = np.asarray(out["rgb_values"])
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_eval_forward_has_normal_map():
    cfg = make_cfg()
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    out = jit_render(cfg)(params, make_inputs(), jax.random.PRNGKey(1),
                          training=False)
    assert "normal_map" in out and "grad_theta" not in out
    n = np.asarray(out["normal_map"])
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_predict_only_short_circuit():
    cfg = make_cfg()
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    out = jit_render(cfg)(params, make_inputs(), jax.random.PRNGKey(1),
                          training=True, predict_only=True)
    assert set(out.keys()) == {"rgb_values", "depth_values", "weight_sum"}


def test_light_mask_model():
    cfg = make_cfg({"light_network": {"dims": [16], "skip_in": []}})
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    assert "light" in params
    out = jit_render(cfg)(params, make_inputs(), jax.random.PRNGKey(1),
                          training=True)
    lm = np.asarray(out["light_mask"])
    assert lm.shape == (6, 1)
    assert lm.min() >= 0.0 and lm.max() <= 1.0


def test_bg_network_model():
    cfg = make_cfg({
        "bg_network": {
            "feature_vector_size": 16,
            "implicit_network": {
                "d_in": 4, "d_out": 1, "dims": [16, 16],
                "geometric_init": False, "embed_type": "positional",
                "multires": 2,
            },
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [16],
                "embed_type": "positional", "multires": 2,
            },
        }
    })
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    assert "bg_implicit" in params
    out = jit_render(cfg)(params, make_inputs(), jax.random.PRNGKey(1),
                          training=True)
    assert bool(jnp.all(jnp.isfinite(out["rgb_values"])))


def test_bubble_pointcloud_sdf():
    cfg = make_cfg()
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    inputs = make_inputs()
    inputs["pointcloud"] = jax.random.normal(jax.random.PRNGKey(5), (17, 3))
    out = jit_render(cfg)(params, inputs, jax.random.PRNGKey(1),
                          training=True)
    assert out["surface_sdf"].shape == (17, 1)


def test_gradients_flow_to_all_params():
    cfg = make_cfg()
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    inputs = make_inputs()
    gt = {
        "rgb": jnp.ones((6, 3)) * 0.5,
        "depth": jnp.ones((6,)) * 2.0,
        "depth_mask": jnp.ones((6,), bool),
        "normal": jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (6, 1)),
        "normal_mask": jnp.ones((6,), bool),
    }
    lw = LossConfig(depth_weight=0.1, normal_weight=0.05,
                    smooth_weight=0.01).dynamic_weights(200000)

    def loss_fn(p):
        out = renderer.render_rays(p, cfg, inputs, jax.random.PRNGKey(1),
                                   training=True)
        return compute_losses(out, gt, lw)["loss"]

    val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(val))
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    nonzero = [float(jnp.abs(g).max()) > 0 for g in flat]
    assert sum(nonzero) > len(nonzero) * 0.8


def test_depth2pts_outside_on_unit_sphere():
    ray_o = jnp.array([[0.0, 0.0, -2.0]])
    ray_d = jnp.array([[0.0, 0.0, 1.0]])
    depth = jnp.array([[0.5]])  # inverse distance
    pts = renderer.depth2pts_outside(ray_o[:, None, :], ray_d[:, None, :],
                                     depth[..., None][:, :, 0], 3.0)
    p = np.asarray(pts)[0, 0]
    np.testing.assert_allclose(np.linalg.norm(p[:3]), 1.0, atol=1e-5)
    assert p[3] == 0.5


def test_idr_rendering_mode():
    """idr mode feeds points+normals+view into the radiance net
    (reference mlp.py:212-213); gradients must flow in training."""
    cfg = make_cfg({
        "rendering_network": {
            "mode": "idr", "d_in": 9, "d_out": 3, "dims": [32, 32],
            "weight_norm": True, "embed_type": "positional", "multires": 2,
        },
    }, use_normal=False)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    out = jit_render(cfg)(params, make_inputs(), jax.random.PRNGKey(1),
                          training=True)
    rgb = np.asarray(out["rgb_values"])
    assert rgb.shape == (6, 3) and np.isfinite(rgb).all()

    gt = {"rgb": jnp.ones((6, 3)) * 0.5}
    lw = LossConfig().dynamic_weights(0)

    def loss_fn(p):
        o = renderer.render_rays(p, cfg, make_inputs(),
                                 jax.random.PRNGKey(1), training=True)
        return compute_losses(o, gt, lw)["loss"]

    grads = jax.jit(jax.grad(loss_fn))(params)
    g = grads["rendering"]["lin0"]["v"]
    assert float(jnp.abs(g).max()) > 0


def test_fused_train_grad_v3_matches_xla(monkeypatch):
    """render_rays(fused_train_grad=True) on a flagship-shaped (nerf,
    no-light) config must match the XLA path: outputs AND loss-gradients.
    Kernels run in interpret mode on CPU via monkeypatched entry points."""
    from functools import partial as _partial

    from i2sdf_tpu.ops.pallas import fused_rev as _frev
    from i2sdf_tpu.ops.pallas import fused_train as _ftrain

    monkeypatch.setattr(
        _ftrain, "render_core_fused",
        _partial(_ftrain.render_core_fused.__wrapped__
                 if hasattr(_ftrain.render_core_fused, "__wrapped__")
                 else _ftrain.render_core_fused,
                 block_rows=8, interpret=True))
    monkeypatch.setattr(
        _frev, "sdf_outputs_fused_rev",
        _partial(_frev.sdf_outputs_fused_rev, block_rows=8,
                 interpret=True))

    cfg = make_cfg()
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    inputs = make_inputs()
    key = jax.random.PRNGKey(3)

    def run(fused):
        return renderer.render_rays(params, cfg, inputs, key,
                                    training=True, fused_train_grad=fused)

    o_x = run(False)
    o_f = run(True)
    assert set(o_f) == set(o_x)
    np.testing.assert_allclose(np.asarray(o_f["rgb_values"]),
                               np.asarray(o_x["rgb_values"]),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(o_f["normal_values"]),
                               np.asarray(o_x["normal_values"]), atol=0.05)

    gt = jnp.zeros_like(o_x["rgb_values"])

    def loss(p, fused):
        o = renderer.render_rays(p, cfg, inputs, key, training=True,
                                 fused_train_grad=fused)
        return (jnp.mean(jnp.abs(o["rgb_values"] - gt))
                + 0.1 * jnp.mean((jnp.linalg.norm(o["grad_theta"], axis=-1)
                                  - 1.0) ** 2)
                + 0.05 * jnp.mean(jnp.abs(o["normal_values"])))

    g_x = jax.grad(lambda p: loss(p, False))(params)
    g_f = jax.grad(lambda p: loss(p, True))(params)
    flat_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(g_f)[0])
    a = np.concatenate([np.asarray(v).ravel() for _, v in flat_x])
    b = np.concatenate([np.asarray(flat_f[p]).ravel() for p, _ in flat_x])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99, cos
