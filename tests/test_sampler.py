import jax
import jax.numpy as jnp
import numpy as np
import pytest

from functools import partial

from i2sdf_tpu.models.sampler import SamplerConfig, error_bound_z_vals


@partial(jax.jit, static_argnames=("cfg", "sdf_scale", "training"))
def _run(cfg, key, dirs, cam, beta, training, sdf_scale=1.0):
    return error_bound_z_vals(
        cfg, lambda p: sphere_sdf(p) * sdf_scale, key, dirs, cam, beta,
        training)


CFG = SamplerConfig(
    scene_bounding_sphere=3.0, near=0.0, N_samples=16, N_samples_eval=32,
    N_samples_extra=8, eps=0.1, beta_iters=10, max_total_iters=3)


def sphere_sdf(pts):
    """Analytic unit sphere at origin."""
    return jnp.linalg.norm(pts, axis=-1) - 1.0


def _rays(n=8):
    # cameras on a ring at radius 2.5 looking at origin
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    cam = np.stack([2.5 * np.cos(ang), 2.5 * np.sin(ang), np.zeros(n)], -1)
    dirs = -cam / np.linalg.norm(cam, axis=-1, keepdims=True)
    return jnp.asarray(dirs, jnp.float32), jnp.asarray(cam, jnp.float32)


@pytest.mark.parametrize("training", [True, False])
def test_shapes_sorted_in_range(training):
    dirs, cam = _rays()
    z, z_bg, z_eik = _run(CFG, jax.random.PRNGKey(0), dirs, cam, 0.1, training)
    assert z.shape == (8, CFG.N_samples + CFG.N_samples_extra + 2)
    assert z_bg is None
    assert z_eik.shape == (8, 1)
    zn = np.asarray(z)
    assert np.all(np.diff(zn, axis=-1) >= -1e-6)
    assert zn.min() >= CFG.near - 1e-6
    assert zn.max() <= CFG.far + 1e-5


def test_samples_concentrate_near_surface():
    """With a small beta, samples should cluster near the sphere hit at
    distance 1.5 from camera (camera at 2.5, surface radius 1)."""
    dirs, cam = _rays()
    z, _, _ = _run(CFG, jax.random.PRNGKey(0), dirs, cam, 0.01, False)
    zn = np.asarray(z)
    near_surface = np.mean((zn > 1.3) & (zn < 1.7))
    uniform_frac = 0.4 / 6.0  # fraction a uniform sampler would place there
    assert near_surface > 3 * uniform_frac


def test_eval_deterministic():
    dirs, cam = _rays()
    z1, _, _ = _run(CFG, jax.random.PRNGKey(0), dirs, cam, 0.05, False)
    z2, _, _ = _run(CFG, jax.random.PRNGKey(99), dirs, cam, 0.05, False)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)


def test_training_stochastic():
    dirs, cam = _rays()
    z1, _, _ = _run(CFG, jax.random.PRNGKey(0), dirs, cam, 0.05, True)
    z2, _, _ = _run(CFG, jax.random.PRNGKey(1), dirs, cam, 0.05, True)
    assert np.abs(np.asarray(z1) - np.asarray(z2)).max() > 1e-4


def test_inverse_sphere_bg_samples():
    cfg = SamplerConfig(
        scene_bounding_sphere=3.0, N_samples=16, N_samples_eval=32,
        N_samples_extra=8, max_total_iters=2, inverse_sphere_bg=True,
        N_samples_inverse_sphere=12)
    dirs, cam = _rays()
    z, z_bg, _ = _run(cfg, jax.random.PRNGKey(0), dirs, cam, 0.1, False)
    assert z_bg.shape == (8, 12)
    zb = np.asarray(z_bg)
    assert zb.min() >= 0.0 and zb.max() <= 1.0 / 3.0 + 1e-6
    # far column equals the sphere far intersection (cam at 2.5, R=3)
    zn = np.asarray(z)
    far_expected = 2.5 + 3.0  # chord length along the center ray
    np.testing.assert_allclose(zn[:, -1], far_expected, atol=1e-4)


def test_no_gradient_through_sampler():
    dirs, cam = _rays(4)

    def f(scale):
        z, _, _ = error_bound_z_vals(
            CFG, lambda p: sphere_sdf(p) * scale, jax.random.PRNGKey(0),
            dirs, cam, 0.05, False)
        return jnp.sum(z)

    g = jax.jit(jax.grad(f))(jnp.float32(1.0))
    assert float(g) == 0.0


def test_jit_compiles():
    dirs, cam = _rays(4)
    fn = jax.jit(lambda k, d, c, b: error_bound_z_vals(
        CFG, sphere_sdf, k, d, c, b, True)[0])
    z = fn(jax.random.PRNGKey(0), dirs, cam, jnp.float32(0.1))
    assert z.shape == (4, 26)


def test_early_exit_matches_when_not_converged():
    """With an impossible eps the early-exit path must be numerically
    identical to the plain unrolled sampler."""
    import dataclasses

    cfg_tight = dataclasses.replace(CFG, eps=1e-12, early_exit=False)
    cfg_ee = dataclasses.replace(CFG, eps=1e-12, early_exit=True)
    key = jax.random.PRNGKey(0)
    R = 8
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = jnp.zeros((R, 3)) + jnp.asarray([0.0, 0.0, -2.0])

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - 1.0

    z0, _, e0 = error_bound_z_vals(cfg_tight, sdf_fn, key, dirs, cam,
                                   0.1, True)
    z1, _, e1 = error_bound_z_vals(cfg_ee, sdf_fn, key, dirs, cam,
                                   0.1, True)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), atol=1e-6)


def test_early_exit_skips_when_converged():
    """With a huge eps every refinement round is skipped: the SDF must be
    evaluated only for round 0's samples, and the output stays sorted
    and in range."""
    import dataclasses

    cfg = dataclasses.replace(CFG, eps=1e9, early_exit=True)
    key = jax.random.PRNGKey(1)
    R = 8
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = jnp.zeros((R, 3)) + jnp.asarray([0.0, 0.0, -2.0])

    calls = []

    def sdf_fn(p):
        calls.append(p.shape[0])
        return jnp.linalg.norm(p, axis=-1) - 1.0

    z, _, _ = error_bound_z_vals(cfg, sdf_fn, key, dirs, cam, 0.1, True)
    z = np.asarray(z)
    assert np.all(np.diff(z, axis=-1) >= 0)
    assert np.isfinite(z).all()
    # tracing still visits sdf_fn inside the cond branches, but the
    # duplicate-emitting path means every post-round-0 evaluation is
    # branch-gated; correctness of the gating is covered by the
    # not-converged equivalence test above.
    assert z.shape[1] == cfg.N_samples + cfg.N_samples_extra + 2


def _unit_rays(key, R):
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = jnp.zeros((R, 3)) + jnp.asarray([0.0, 0.0, -2.0])
    return dirs, cam


def test_per_ray_compacted_eval_shapes():
    """With per_ray_exit and frac 0.5 the post-round-0 MLP evaluations
    must trace at the compacted size (cap x N_samples_eval points)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, per_ray_exit=True, per_ray_fracs=(0.5,), max_total_iters=3)
    R = 8
    dirs, cam = _unit_rays(jax.random.PRNGKey(0), R)

    shapes = []

    def sdf_fn(p):
        shapes.append(p.shape[0])
        return jnp.linalg.norm(p, axis=-1) - 1.0

    error_bound_z_vals(cfg, sdf_fn, jax.random.PRNGKey(0), dirs, cam,
                       0.1, True)
    # round 0: full R*N_eval; rounds 1..2: ceil(0.5*R)*N_eval
    assert shapes[0] == R * cfg.N_samples_eval
    assert all(s == 4 * cfg.N_samples_eval for s in shapes[1:])
    assert len(shapes) == cfg.max_total_iters


def test_per_ray_selected_rows_match_plain():
    """Never-converging SDF (eps=1e-12): rays inside the capacity follow
    the exact plain-sampler refinement; rays beyond it still produce
    sorted, in-range samples. Uses 2 total rounds (one emission) so the
    selected set is unambiguous — with more rounds the per-round
    rotation deliberately spreads refinement across overflow rays."""
    import dataclasses

    cfg_plain = dataclasses.replace(CFG, eps=1e-12, early_exit=False,
                                    max_total_iters=2)
    cfg_pr = dataclasses.replace(
        CFG, eps=1e-12, early_exit=True, per_ray_exit=True,
        per_ray_fracs=(0.5,), max_total_iters=2)
    key = jax.random.PRNGKey(3)
    R = 8
    dirs, cam = _unit_rays(key, R)

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - 1.0

    z0, _, e0 = error_bound_z_vals(cfg_plain, sdf_fn, key, dirs, cam,
                                   0.1, True)
    z1, _, e1 = error_bound_z_vals(cfg_pr, sdf_fn, key, dirs, cam,
                                   0.1, True)
    # round-0 emission rotation is the identity: rows 0..3 are selected
    # and refined exactly like the plain path
    np.testing.assert_allclose(np.asarray(z1)[:4], np.asarray(z0)[:4],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1)[:4], np.asarray(e0)[:4],
                               atol=1e-6)
    zn = np.asarray(z1)
    assert np.all(np.diff(zn, axis=-1) >= -1e-6)
    assert zn.min() >= cfg_pr.near - 1e-6 and zn.max() <= cfg_pr.far + 1e-5
    assert np.isfinite(zn).all()


def test_per_ray_overflow_rotation_spreads_refinement():
    """With a persistent overflow (all rays unconverged, cap < R) the
    per-round rotation must select DIFFERENT rays each round instead of
    starving a fixed trailing set (r2 review finding)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, eps=1e-12, early_exit=True, per_ray_exit=True,
        per_ray_fracs=(0.5,), max_total_iters=3)
    R = 8
    dirs, cam = _unit_rays(jax.random.PRNGKey(6), R)

    eval_points = []

    def sdf_fn(p):
        eval_points.append(p.shape[0])
        return jnp.linalg.norm(p, axis=-1) - 1.0

    z, _, _ = error_bound_z_vals(cfg, sdf_fn, jax.random.PRNGKey(0),
                                 dirs, cam, 0.1, True)
    # round 0 full (8 rays x N_eval), rounds 1-2 compacted to 4 rays
    ne = cfg.N_samples_eval
    assert eval_points == [8 * ne, 4 * ne, 4 * ne]
    assert np.isfinite(np.asarray(z)).all()
    # the rotated ranking selects DISJOINT halves on consecutive rounds
    # when everything stays unconverged
    conv = np.zeros(R, bool)
    cap = 4
    idx = np.arange(R)
    sels = []
    for it in range(2):
        key_order = conv.astype(np.int32) * R + (idx + it * cap) % R
        sels.append(set(np.argsort(key_order, kind="stable")[:cap]))
    assert sels[0] == {0, 1, 2, 3}
    assert sels[1] == {4, 5, 6, 7}


def test_per_ray_converged_matches_global_exit():
    """When every ray converges in round 0 (huge eps), selected rows are
    bit-identical to the global early-exit path; unselected rows carry
    far-duplicate padding instead of merged leading-duplicates (both are
    zero-width sections) and must stay sorted and in range."""
    import dataclasses

    # single emission round (max_total_iters=2): the rotation is the
    # identity there, so rows 0..3 are the selected set
    cfg_g = dataclasses.replace(CFG, eps=1e9, early_exit=True,
                                max_total_iters=2)
    cfg_pr = dataclasses.replace(
        CFG, eps=1e9, early_exit=True, per_ray_exit=True,
        per_ray_fracs=(0.5,), max_total_iters=2)
    key = jax.random.PRNGKey(4)
    dirs, cam = _unit_rays(key, 8)

    def sdf_fn(p):
        return jnp.linalg.norm(p, axis=-1) - 1.0

    z0, _, e0 = error_bound_z_vals(cfg_g, sdf_fn, key, dirs, cam, 0.1, True)
    z1, _, e1 = error_bound_z_vals(cfg_pr, sdf_fn, key, dirs, cam, 0.1, True)
    # rows 0..3 selected (identity rotation on the only emission round)
    np.testing.assert_allclose(np.asarray(z1)[:4], np.asarray(z0)[:4],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1)[:4], np.asarray(e0)[:4],
                               atol=1e-6)
    zn = np.asarray(z1)
    assert np.all(np.diff(zn, axis=-1) >= -1e-6)
    assert zn.min() >= cfg_pr.near - 1e-6 and zn.max() <= cfg_pr.far + 1e-5
    assert np.isfinite(np.asarray(e1)).all()


def test_per_ray_jit_and_grad_free():
    import dataclasses

    cfg = dataclasses.replace(CFG, per_ray_exit=True, per_ray_fracs=(0.5,))
    dirs, cam = _unit_rays(jax.random.PRNGKey(5), 8)

    def f(scale):
        z, _, _ = error_bound_z_vals(
            cfg, lambda p: sphere_sdf(p) * scale, jax.random.PRNGKey(0),
            dirs, cam, 0.05, True)
        return jnp.sum(z)

    g = jax.jit(jax.grad(f))(jnp.float32(1.0))
    assert float(g) == 0.0


def test_sorted_uniform_is_sorted_and_uniform():
    """Exponential-spacings construction: rows sorted, marginals
    uniform (KS-style moment check at loose tolerance)."""
    from i2sdf_tpu.models.sampler import _sorted_uniform

    u = np.asarray(_sorted_uniform(jax.random.PRNGKey(3), 512, 64))
    assert u.shape == (512, 64)
    assert np.all(np.diff(u, axis=-1) >= 0)
    assert 0.0 <= u.min() and u.max() <= 1.0
    # pooled draws must be U(0,1): mean 1/2, var 1/12
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1.0 / 12.0) < 5e-3


def test_merge_sorted_matches_sort():
    from i2sdf_tpu.models.sampler import _merge_sorted

    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(0, 8, (64, 17)).astype(np.float32), axis=-1)
    b = np.sort(rng.uniform(0, 8, (64, 9)).astype(np.float32), axis=-1)
    # inject ties within and across arrays (early-exit emits duplicates),
    # re-sorting to preserve each input's row-sorted invariant
    a[:, 5] = a[:, 4]
    b[:, 3] = a[:, 7]
    b = np.sort(b, axis=-1)
    got = np.asarray(_merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_array_equal(got, want)


def test_round_eval_counts_taper():
    """Tapering per-round eval budgets: each round's MLP evaluation
    traces at that round's count, the output shape is unchanged, and
    the samples still concentrate near the surface like the flat-budget
    sampler (the budget changes WHERE refinement effort goes, not the
    final sample-set semantics)."""
    import dataclasses

    counts = (32, 32, 16)
    cfg = dataclasses.replace(CFG, early_exit=False,
                              round_eval_counts=counts)
    dirs, cam = _rays()
    shapes = []

    def sdf_fn(p):
        shapes.append(p.shape[0])
        return sphere_sdf(p)

    z, _, _ = error_bound_z_vals(cfg, sdf_fn, jax.random.PRNGKey(0),
                                 dirs, cam, 0.01, False)
    assert shapes == [8 * c for c in counts]
    zn = np.asarray(z)
    assert z.shape == (8, cfg.N_samples + cfg.N_samples_extra + 2)
    assert np.all(np.diff(zn, axis=-1) >= -1e-6)
    assert np.isfinite(zn).all()
    near_surface = np.mean((zn > 1.3) & (zn < 1.7))
    assert near_surface > 3 * (0.4 / 6.0)

    # early-exit variant keeps shapes/order too (cond-gated evals)
    cfg_ee = dataclasses.replace(cfg, early_exit=True)
    z2, _, _ = _run(cfg_ee, jax.random.PRNGKey(0), dirs, cam, 0.01, False)
    z2n = np.asarray(z2)
    assert z2.shape == z.shape
    assert np.all(np.diff(z2n, axis=-1) >= -1e-6)


def test_round_eval_counts_validation():
    import dataclasses

    cfg = dataclasses.replace(CFG, round_eval_counts=(32, 32))
    with pytest.raises(ValueError):
        cfg.eval_counts
