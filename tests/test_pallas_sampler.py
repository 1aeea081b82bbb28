"""Pallas sampler-round kernel vs the pure-JAX round_update (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.models.sampler import SamplerConfig, round_update
from i2sdf_tpu.ops.pallas.sampler_round import (make_round_impl,
                                                sampler_round_pallas)

CFG = SamplerConfig(scene_bounding_sphere=3.0, N_samples=16,
                    N_samples_eval=32, N_samples_extra=8, eps=0.1,
                    beta_iters=6, max_total_iters=3, add_tiny=1e-6)


def _round_inputs(R=40, S=128, seed=0):
    rng = np.random.default_rng(seed)
    z = np.sort(rng.uniform(0.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    # plausible SDF along rays: signed distance to a wall at z=3
    sdf = (3.0 - z + 0.1 * rng.normal(size=(R, S))).astype(np.float32)
    beta = rng.uniform(0.05, 0.8, (R,)).astype(np.float32)
    u = rng.uniform(0.0, 1.0, (R, 24)).astype(np.float32)
    return (jnp.asarray(z), jnp.asarray(sdf), jnp.asarray(beta),
            jnp.asarray(u))


@pytest.mark.parametrize("final", [False, True])
def test_kernel_matches_reference_round(final):
    z, sdf, beta, u = _round_inputs()
    beta0 = 0.1
    s_ref, b_ref = round_update(CFG, z, sdf, beta, beta0, u, final)
    s_ker, b_ker = sampler_round_pallas(
        z, sdf, beta, u, beta0, beta_iters=CFG.beta_iters, eps=CFG.eps,
        add_tiny=CFG.add_tiny, final=final, block_rows=8, interpret=True)
    assert s_ker.shape == s_ref.shape
    # betas bisect to the same bracket
    np.testing.assert_allclose(np.asarray(b_ker), np.asarray(b_ref),
                               rtol=2e-2, atol=1e-3)
    # samples land in the same bins; bf16 prefix sums can shift a draw
    # across near-empty (flat-cdf) bins, so compare by quantile
    diff = np.abs(np.asarray(s_ker) - np.asarray(s_ref))
    assert np.quantile(diff, 0.99) < 0.08
    assert diff.max() < 0.5
    # distributional agreement: per-ray mean sample position
    np.testing.assert_allclose(np.asarray(s_ker).mean(-1),
                               np.asarray(s_ref).mean(-1), atol=0.02)


def test_kernel_handles_row_padding():
    z, sdf, beta, u = _round_inputs(R=13)
    s, b = sampler_round_pallas(
        z, sdf, beta, u, 0.1, beta_iters=4, eps=0.1, add_tiny=1e-6,
        final=False, block_rows=8, interpret=True)
    assert s.shape == (13, 24)
    assert b.shape == (13,)
    assert bool(jnp.all(jnp.isfinite(s)))


def test_full_sampler_with_pallas_round():
    """End-to-end error_bound_z_vals with the kernel round vs JAX round."""
    from i2sdf_tpu.models.sampler import error_bound_z_vals

    def sphere_sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 1.0

    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    cam = np.stack([2.5 * np.cos(ang), 2.5 * np.sin(ang), np.zeros(8)],
                   -1).astype(np.float32)
    dirs = (-cam / np.linalg.norm(cam, axis=-1, keepdims=True)).astype(
        np.float32)
    impl = make_round_impl(CFG, block_rows=8, interpret=True)
    z_ker, _, _ = error_bound_z_vals(
        CFG, sphere_sdf, jax.random.PRNGKey(0), jnp.asarray(dirs),
        jnp.asarray(cam), 0.05, False, round_impl=impl)
    z_ref, _, _ = error_bound_z_vals(
        CFG, sphere_sdf, jax.random.PRNGKey(0), jnp.asarray(dirs),
        jnp.asarray(cam), 0.05, False)
    zk, zr = np.asarray(z_ker), np.asarray(z_ref)
    assert np.all(np.diff(zk, axis=-1) >= -1e-6)
    # same sampling concentration near the surface hit at t=1.5
    frac_k = np.mean((zk > 1.3) & (zk < 1.7))
    frac_r = np.mean((zr > 1.3) & (zr < 1.7))
    assert abs(frac_k - frac_r) < 0.1
    np.testing.assert_allclose(zk.mean(), zr.mean(), atol=0.15)


def test_kernel_cdf_edge_values():
    """u=0 and u=1 must bracket like searchsorted (first bin / last bin)."""
    z, sdf, beta, _ = _round_inputs(R=8, S=128)
    u = jnp.concatenate([jnp.zeros((8, 4)), jnp.ones((8, 4))], axis=1)
    s_ref, _ = round_update(CFG, z, sdf, beta, 0.1, u, True)
    s_ker, _ = sampler_round_pallas(
        z, sdf, beta, u, 0.1, beta_iters=CFG.beta_iters, eps=CFG.eps,
        add_tiny=CFG.add_tiny, final=True, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(s_ker), np.asarray(s_ref),
                               atol=0.05)
    # u=1 lands on (or at) the last bin
    assert np.all(np.asarray(s_ker[:, 4:]) >= np.asarray(z[:, -2]).min())


def test_conv_check_kernel_matches_xla():
    """Fused convergence check vs the XLA d*/error-bound check."""
    from i2sdf_tpu.models.sampler import _d_star, _get_error_bound
    from i2sdf_tpu.ops.pallas.sampler_round import conv_check_pallas

    for seed, beta0 in ((0, 0.1), (1, 0.02), (2, 0.4)):
        z, sdf, _, _ = _round_inputs(R=37, S=128, seed=seed)
        d_star, dists = _d_star(z, sdf)
        err = _get_error_bound(beta0, sdf, z, dists, d_star)
        ref = np.asarray(err <= CFG.eps)
        ker = np.asarray(conv_check_pallas(z, sdf, beta0, eps=CFG.eps,
                                           interpret=True))
        # bf16-prefix rounding can only flip rays whose bound sits on
        # the eps boundary; everything else must agree exactly
        disagree = ref != ker
        if disagree.any():
            margin = np.abs(np.asarray(err)[disagree] - CFG.eps)
            assert margin.max() < 0.02 * CFG.eps
        assert disagree.mean() <= 0.05
