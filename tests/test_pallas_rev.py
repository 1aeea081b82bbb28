"""Reverse-sweep custom-VJP fused forward (ops/pallas/fused_rev.py):
values AND parameter gradients (incl. the second-order normal-map path)
must match jax.grad of the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.models.mlp import (ImplicitNetConfig, implicit_net_init,
                                  sdf_outputs)
from i2sdf_tpu.ops.pallas.fused_rev import sdf_outputs_fused_rev

SMALL = ImplicitNetConfig(
    feature_vector_size=16, sdf_bounding_sphere=0.0,
    dims=(64, 64, 64, 64), skip_in=(2,), bias=0.6,
    embed_type="positional", multires=4)


def _loss_terms(sdf, feat, grad, gt_n):
    normals = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return (jnp.mean(sdf**2) + 0.1 * jnp.mean(feat**2)
            + 0.5 * jnp.mean(jnp.abs(1 - jnp.sum(normals * gt_n, -1)))
            + 0.1 * jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1) ** 2))


@pytest.fixture(scope="module")
def setup():
    params = implicit_net_init(jax.random.PRNGKey(0), SMALL)
    pts = jax.random.normal(jax.random.PRNGKey(1), (96, 3)) * 0.8
    gt_n = jax.random.normal(jax.random.PRNGKey(2), (96, 3))
    gt_n = gt_n / jnp.linalg.norm(gt_n, axis=-1, keepdims=True)
    return params, pts, gt_n


def test_forward_values_match(setup):
    params, pts, _ = setup
    s_ref, f_ref, g_ref = sdf_outputs(params, SMALL, pts, returns_grad=True)
    s, f, g = sdf_outputs_fused_rev(params, SMALL, pts, block_rows=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               atol=0.02, rtol=0.02)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=0.05, rtol=0.08)


def test_param_gradients_match(setup):
    params, pts, gt_n = setup

    def loss_ref(p):
        s, f, g = sdf_outputs(p, SMALL, pts, returns_grad=True)
        return _loss_terms(s, f, g, gt_n)

    def loss_ker(p):
        s, f, g = sdf_outputs_fused_rev(p, SMALL, pts, block_rows=32,
                                        interpret=True)
        return _loss_terms(s, f, g, gt_n)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    v_ker, g_ker = jax.value_and_grad(loss_ker)(params)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=5e-3)

    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_ker = dict(jax.tree_util.tree_flatten_with_path(g_ker)[0])
    for path, ref in flat_ref:
        ker = flat_ker[path]
        ref, ker = np.asarray(ref), np.asarray(ker)
        scale = max(np.abs(ref).max(), 1e-3)
        err = np.abs(ker - ref).max() / scale
        # bf16 matmuls in all three sweeps: relative-to-max tolerance
        assert err < 0.05, (jax.tree_util.keystr(path), err)
    a = np.concatenate([np.asarray(v).ravel() for _, v in flat_ref])
    b = np.concatenate([np.asarray(flat_ker[p]).ravel()
                        for p, _ in flat_ref])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999


def test_no_skip_config(setup):
    cfg = ImplicitNetConfig(
        feature_vector_size=8, sdf_bounding_sphere=0.0,
        dims=(32, 32), geometric_init=False, embed_type="positional",
        multires=2)
    params = implicit_net_init(jax.random.PRNGKey(3), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(4), (16, 3)) * 0.5
    s_ref, f_ref, g_ref = sdf_outputs(params, cfg, pts, returns_grad=True)
    s, f, g = sdf_outputs_fused_rev(params, cfg, pts, block_rows=8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=0.02)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=0.05)

    gt_n = jnp.ones((16, 3)) / np.sqrt(3.0)

    def loss_ref(p):
        return _loss_terms(*sdf_outputs(p, cfg, pts, returns_grad=True),
                           gt_n)

    def loss_ker(p):
        return _loss_terms(
            *sdf_outputs_fused_rev(p, cfg, pts, block_rows=8,
                                   interpret=True), gt_n)

    g_ref_t = jax.grad(loss_ref)(params)
    g_ker_t = jax.grad(loss_ker)(params)
    for (pa, ref), (_, ker) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref_t)[0],
            jax.tree_util.tree_flatten_with_path(g_ker_t)[0]):
        scale = max(np.abs(np.asarray(ref)).max(), 1e-3)
        # wider tolerance: at width 32 the bf16 rounding doesn't average
        # out the way it does at the flagship's 256 lanes
        assert np.abs(np.asarray(ker) - np.asarray(ref)).max() / scale \
            < 0.08, jax.tree_util.keystr(pa)


def test_clamped_sphere_grad(setup):
    cfg = ImplicitNetConfig(
        feature_vector_size=8, sdf_bounding_sphere=1.2,
        dims=(32, 32), geometric_init=False, embed_type=None)
    params = implicit_net_init(jax.random.PRNGKey(3), cfg)
    pts = jnp.asarray([[2.0, 0.0, 0.0], [0.1, 0.1, 0.0]])
    s_ref, _, g_ref = sdf_outputs(params, cfg, pts, returns_grad=True)
    s, _, g = sdf_outputs_fused_rev(params, cfg, pts, block_rows=8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=0.01)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=0.02)
