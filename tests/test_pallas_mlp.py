"""Fused Pallas MLP kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.models.mlp import (ImplicitNetConfig, implicit_net_init,
                                  sdf_vals)
from i2sdf_tpu.ops.pallas.fused_mlp import fused_sdf_mlp

FLAGSHIP = ImplicitNetConfig(
    feature_vector_size=256, sdf_bounding_sphere=0.0,
    dims=(256,) * 8, skip_in=(4,), bias=0.6,
    embed_type="positional", multires=6)

SMALL = ImplicitNetConfig(
    feature_vector_size=16, sdf_bounding_sphere=0.0,
    dims=(64, 64, 64, 64), skip_in=(2,), bias=0.6,
    embed_type="positional", multires=4)

NO_EMBED = ImplicitNetConfig(
    feature_vector_size=8, sdf_bounding_sphere=1.5,
    dims=(32, 32), geometric_init=False, embed_type=None)


@pytest.mark.parametrize("cfg", [SMALL, FLAGSHIP, NO_EMBED],
                         ids=["small", "flagship", "no_embed"])
def test_fused_matches_xla(cfg):
    params = implicit_net_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (300, 3)) * 1.5
    ref = np.asarray(sdf_vals(params, cfg, pts))[:, 0]
    got = np.asarray(fused_sdf_mlp(params, cfg, pts, block_rows=128,
                                   interpret=True))
    assert got.shape == ref.shape
    # bf16 matmuls: tolerate ~1% relative on O(1) SDF values
    np.testing.assert_allclose(got, ref, atol=0.02, rtol=0.02)


def test_fused_handles_nonmultiple_rows():
    params = implicit_net_init(jax.random.PRNGKey(0), SMALL)
    for n in (1, 127, 129):
        pts = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        out = fused_sdf_mlp(params, SMALL, pts, block_rows=128,
                            interpret=True)
        assert out.shape == (n,)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_fused_in_sampler():
    """The kernel slots into the error-bound sampler as sdf_fn."""
    from i2sdf_tpu.models.sampler import SamplerConfig, error_bound_z_vals

    params = implicit_net_init(jax.random.PRNGKey(0), SMALL)
    scfg = SamplerConfig(scene_bounding_sphere=3.0, N_samples=8,
                         N_samples_eval=16, N_samples_extra=4,
                         max_total_iters=2, beta_iters=4)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    cam = jnp.asarray([[0.0, 0.0, -2.0]] * 4)

    def sdf_fn(pts):
        return fused_sdf_mlp(params, SMALL, pts, block_rows=128,
                             interpret=True)

    z, _, _ = error_bound_z_vals(scfg, sdf_fn, jax.random.PRNGKey(0),
                                 dirs, cam, 0.1, False)
    assert z.shape == (4, 14)
    assert bool(jnp.all(jnp.isfinite(z)))


def test_fused_act_none_roof_runs():
    """act_impl='none' is the no-epilogue diagnostic roof used by
    scripts/bench_fused_mlp.py to bound the softplus chain's VPU cost.
    Its VALUES are meaningless; it just has to compile and stay finite
    (cheaper epilogues were measured and rejected — see fused_mlp.py)."""
    params = implicit_net_init(jax.random.PRNGKey(0), FLAGSHIP)
    pts = jax.random.normal(jax.random.PRNGKey(3), (300, 3)) * 1.5
    out = np.asarray(fused_sdf_mlp(params, FLAGSHIP, pts, block_rows=128,
                                   interpret=True, act_impl="none"))
    assert out.shape == (300,)
    assert np.all(np.isfinite(out))
