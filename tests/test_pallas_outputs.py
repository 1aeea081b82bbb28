"""Fused forward+gradient kernel vs the XLA sdf_outputs (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.models.mlp import (ImplicitNetConfig, implicit_net_init,
                                  sdf_outputs)
from i2sdf_tpu.ops.pallas.fused_outputs import fused_sdf_outputs

SMALL = ImplicitNetConfig(
    feature_vector_size=16, sdf_bounding_sphere=0.0,
    dims=(64, 64, 64, 64), skip_in=(2,), bias=0.6,
    embed_type="positional", multires=4)

CLAMPED = ImplicitNetConfig(
    feature_vector_size=8, sdf_bounding_sphere=1.5,
    dims=(32, 32), geometric_init=False, embed_type=None)

# geometric_init=False with positional PE: nonzero first-layer PE rows, so
# the gradient check is sensitive to the tangent column layout (the
# geometric init zeroes all PE rows and would mask a layout mismatch).
NONGEO_PE = ImplicitNetConfig(
    feature_vector_size=16, sdf_bounding_sphere=0.0,
    dims=(64, 64, 64), skip_in=(2,), geometric_init=False,
    embed_type="positional", multires=4)


@pytest.mark.parametrize("cfg", [SMALL, CLAMPED, NONGEO_PE],
                         ids=["small", "clamped", "nongeo_pe"])
def test_fused_outputs_match_xla(cfg):
    params = implicit_net_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (200, 3))
    s_ref, f_ref, g_ref = sdf_outputs(params, cfg, pts, returns_grad=True)
    s, f, g = fused_sdf_outputs(params, cfg, pts, block_rows=64,
                                interpret=True)
    assert s.shape == s_ref.shape and f.shape == f_ref.shape
    assert g.shape == (200, 3)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               atol=0.02, rtol=0.02)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=0.05, rtol=0.05)
    # gradients: compare directionally (bf16 tangent accumulation)
    gr, gk = np.asarray(g_ref), np.asarray(g)
    np.testing.assert_allclose(gk, gr, atol=0.05, rtol=0.08)
    cos = np.sum(gr * gk, -1) / np.maximum(
        np.linalg.norm(gr, axis=-1) * np.linalg.norm(gk, axis=-1), 1e-9)
    assert cos.min() > 0.995


def test_fused_outputs_flagship_shapes():
    cfg = ImplicitNetConfig(
        feature_vector_size=256, sdf_bounding_sphere=0.0,
        dims=(256,) * 8, skip_in=(4,), bias=0.6,
        embed_type="positional", multires=6)
    params = implicit_net_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (130, 3))
    s, f, g = fused_sdf_outputs(params, cfg, pts, block_rows=128,
                                interpret=True)
    assert s.shape == (130, 1) and f.shape == (130, 256)
    assert bool(jnp.all(jnp.isfinite(g)))
