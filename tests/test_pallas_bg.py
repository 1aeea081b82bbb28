"""Fused NeRF++ background MLP pair (ops/pallas/fused_bg.py): forward
values and weight/bias gradients must match the XLA bg pair (interpret
mode), and the renderer's fused bg branch must match its XLA branch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.models.mlp import (ImplicitNetConfig, RenderingNetConfig,
                                  implicit_net_apply, implicit_net_init,
                                  rendering_net_apply, rendering_net_init)
from i2sdf_tpu.ops.pallas.fused_bg import bg_core_fused, supports_bg_core

ICFG = ImplicitNetConfig(
    feature_vector_size=16, sdf_bounding_sphere=0.0, d_in=4,
    dims=(48, 48, 48), skip_in=(1,), geometric_init=False,
    embed_type="positional", multires=3)
RCFG = RenderingNetConfig(
    feature_vector_size=16, mode="nerf", d_in=3, dims=(32, 32),
    embed_type="positional", multires=2)
# the reference's bg default leaves the bg implicit un-embedded
ICFG_RAW = ImplicitNetConfig(
    feature_vector_size=16, sdf_bounding_sphere=0.0, d_in=4,
    dims=(32, 32), skip_in=(), geometric_init=False, embed_type=None)


def _xla_pair(pi, pr, icfg, rcfg, x, dirs):
    out = implicit_net_apply(pi, icfg, x)
    sigma, feat = out[:, :1], out[:, 1:]
    rgb = rendering_net_apply(pr, rcfg, None, None, dirs, feat)
    return sigma, rgb


@pytest.fixture(scope="module", params=["pe", "raw"])
def setup(request):
    icfg = ICFG if request.param == "pe" else ICFG_RAW
    pi = implicit_net_init(jax.random.PRNGKey(0), icfg)
    pr = rendering_net_init(jax.random.PRNGKey(1), RCFG)
    x = jax.random.normal(jax.random.PRNGKey(2), (70, 4)) * 0.7
    dirs = jax.random.normal(jax.random.PRNGKey(3), (70, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return icfg, pi, pr, x, dirs


def test_supports_guard():
    assert supports_bg_core(ICFG, RCFG)
    assert not supports_bg_core(
        ICFG, RCFG.__class__(**{**RCFG.__dict__, "mode": "idr"}))


def test_forward_values_match(setup):
    icfg, pi, pr, x, dirs = setup
    s_ref, rgb_ref = _xla_pair(pi, pr, icfg, RCFG, x, dirs)
    s, rgb = bg_core_fused(pi, icfg, pr, RCFG, x, dirs,
                           block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               atol=0.02, rtol=0.02)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=0.01, rtol=0.02)


def test_param_gradients_match(setup):
    import dataclasses

    icfg, pi, pr, x, dirs = setup
    c_s = jax.random.normal(jax.random.PRNGKey(4), (70, 1))
    c_rgb = jax.random.normal(jax.random.PRNGKey(5), (70, 3))

    def loss(fn):
        def f(both):
            s, rgb = fn(both["i"], both["r"])
            return jnp.sum(s * c_s) + jnp.sum(rgb * c_rgb)
        return f

    # per-leaf check vs a bf16-COMPUTE XLA reference (the kernel's own
    # precision: vs f32 XLA, relu-mask flips at near-zero z dominate
    # and only the cosine check below is meaningful)
    icfg_b = dataclasses.replace(icfg, compute_dtype="bfloat16")
    rcfg_b = dataclasses.replace(RCFG, compute_dtype="bfloat16")
    ref = loss(lambda pi_, pr_: _xla_pair(pi_, pr_, icfg_b, rcfg_b,
                                          x, dirs))
    ref32 = loss(lambda pi_, pr_: _xla_pair(pi_, pr_, icfg, RCFG,
                                            x, dirs))
    ker = loss(lambda pi_, pr_: bg_core_fused(
        pi_, icfg, pr_, RCFG, x, dirs, block_rows=32, interpret=True))
    both = {"i": pi, "r": pr}
    v_ref, g_ref = jax.value_and_grad(ref)(both)
    v_ker, g_ker = jax.value_and_grad(ker)(both)
    g_ref32 = jax.grad(ref32)(both)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=5e-3,
                               atol=1e-3)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_ker = dict(jax.tree_util.tree_flatten_with_path(g_ker)[0])
    for path, r in flat_ref:
        k = flat_ker[path]
        r, k = np.asarray(r), np.asarray(k)
        scale = max(np.abs(r).max(), 1e-3)
        assert np.abs(k - r).max() / scale < 0.05, (
            jax.tree_util.keystr(path))
    a = np.concatenate([np.asarray(v).ravel() for v in
                        jax.tree_util.tree_leaves(g_ref32)])
    b = np.concatenate([np.asarray(v).ravel() for v in
                        jax.tree_util.tree_leaves(g_ker)])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999


def test_renderer_bg_fused_matches_xla(monkeypatch):
    """render_rays' fused bg branch (forced to interpret mode on CPU)
    must match the XLA branch end-to-end, including the training-loss
    gradient through both bg nets."""
    import functools

    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.ops.pallas import fused_bg
    from tests.test_renderer import jit_render, make_cfg, make_inputs

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
    inputs = make_inputs()

    out_xla = renderer.render_rays(
        params, cfg, inputs, jax.random.PRNGKey(1), training=True,
        fused_sampler=False, fused_train_grad=False)

    # force ONLY the bg branch fused (interpret mode) — the fg path
    # stays XLA, so the comparison isolates the new kernel
    monkeypatch.setattr(renderer, "_bg_fused_enabled",
                        lambda *a: True)
    monkeypatch.setattr(
        fused_bg, "bg_core_fused",
        functools.partial(fused_bg.bg_core_fused, interpret=True))

    def render_fused(p):
        return renderer.render_rays(
            p, cfg, inputs, jax.random.PRNGKey(1), training=True,
            fused_sampler=False, fused_train_grad=False)

    out_fused = render_fused(params)
    np.testing.assert_allclose(
        np.asarray(out_fused["rgb_values"]),
        np.asarray(out_xla["rgb_values"]), atol=0.02, rtol=0.02)

    def loss(fn):
        def f(p):
            out = fn(p)
            return jnp.sum(out["rgb_values"] ** 2)
        return f

    g_ref = jax.grad(loss(lambda p: renderer.render_rays(
        p, cfg, inputs, jax.random.PRNGKey(1), training=True,
        fused_sampler=False, fused_train_grad=False)))(params)
    g_ker = jax.grad(loss(render_fused))(params)
    for net in ("bg_implicit", "bg_rendering"):
        ar = np.concatenate([np.asarray(v).ravel() for v in
                             jax.tree_util.tree_leaves(g_ref[net])])
        ak = np.concatenate([np.asarray(v).ravel() for v in
                             jax.tree_util.tree_leaves(g_ker[net])])
        cos = ar @ ak / max(np.linalg.norm(ar) * np.linalg.norm(ak), 1e-12)
        assert cos > 0.999, net
