import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.models import brdf
from i2sdf_tpu.models.rendering_layer import RenderingLayerConfig, shade


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_onb_orthonormal():
    n = jnp.asarray(_unit(np.random.default_rng(0).normal(size=(64, 3))))
    t, b = brdf.build_onb(n)
    for pair in [(t, b), (t, n), (b, n)]:
        dots = np.asarray(jnp.sum(pair[0] * pair[1], -1))
        np.testing.assert_allclose(dots, 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(t, axis=-1)), 1.0,
                               atol=1e-5)
    # right-handed: t x b = n
    np.testing.assert_allclose(np.asarray(jnp.cross(t, b)), np.asarray(n),
                               atol=1e-5)


def test_local_world_roundtrip():
    rng = np.random.default_rng(1)
    n = jnp.asarray(_unit(rng.normal(size=(16, 3))))
    v = jnp.asarray(_unit(rng.normal(size=(16, 3))))
    v2 = brdf.to_world(brdf.to_local(v, n), n)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_metallic_conversion():
    albedo = jnp.asarray([[0.8, 0.4, 0.2]])
    kd0, ks0 = brdf.metallic_to_kd_ks(albedo, jnp.asarray([0.0])[:, None])
    np.testing.assert_allclose(np.asarray(kd0), np.asarray(albedo), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ks0), 0.04, atol=1e-6)
    kd1, ks1 = brdf.metallic_to_kd_ks(albedo, jnp.asarray([1.0])[:, None])
    np.testing.assert_allclose(np.asarray(kd1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ks1), np.asarray(albedo), atol=1e-6)


def test_ggx_ndf_normalizes():
    """Integral of D(h) cos(h) over the hemisphere must be ~1."""
    alpha = 0.3
    n_samples = 200_000
    rng = np.random.default_rng(0)
    # uniform hemisphere sampling
    u = rng.random((n_samples, 2))
    cos_t = u[:, 0]
    d = np.asarray(brdf.ggx_ndf(jnp.asarray(cos_t), alpha))
    # E[D cos / p] with p = 1/(2pi)
    integral = np.mean(d * cos_t) * 2 * np.pi
    np.testing.assert_allclose(integral, 1.0, rtol=0.02)


def test_cosine_sampling_distribution():
    n = jnp.asarray(np.tile(_unit([0.0, 0.0, 1.0]), (4096, 1)))
    l, pdf = brdf.sample_cosine_hemisphere(jax.random.PRNGKey(0), n)
    cos = np.asarray(l[:, 2])
    assert cos.min() > 0
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=0.02)
    np.testing.assert_allclose(np.asarray(pdf), cos / np.pi, atol=1e-5)


def test_ld_hemisphere_correct_and_low_variance():
    """cosine_hemisphere_ld: cosine-weighted, unit, hemisphere-bound,
    and its spp-mean estimator has far lower variance than iid MC —
    the round-4 fix for the indirect-bake noise floor."""
    spp, npts = 64, 512
    n = jnp.asarray(np.tile(_unit([0.0, 1.0, 0.0]), (npts, 1)))
    d, pdf = brdf.cosine_hemisphere_ld(jax.random.PRNGKey(0), n, spp)
    assert d.shape == (spp, npts, 3) and pdf.shape == (spp, npts)
    nrm = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    cos = np.asarray(d[..., 1])
    assert cos.min() > -1e-6
    np.testing.assert_allclose(np.asarray(pdf),
                               np.maximum(cos, 1e-9) / np.pi, atol=1e-5)
    # per-point estimate of E[cos] = 2/3 under the cosine pdf
    est_ld = cos.mean(0)
    np.testing.assert_allclose(est_ld.mean(), 2.0 / 3.0, atol=0.01)
    est_iid = np.zeros(npts)
    for k in jax.random.split(jax.random.PRNGKey(0), spp):
        l, _ = brdf.sample_cosine_hemisphere(k, n)
        est_iid += np.asarray(l[:, 1])
    est_iid /= spp
    # measured: 0.0045 vs 0.0297 — require at least 3x tighter
    assert est_ld.std() < est_iid.std() / 3.0


def test_ld_hemisphere_bakes_independent_across_keys():
    """Independent Cranley–Patterson rotations: two keys give distinct
    sample sets (no bake-to-bake correlation of the raw noise)."""
    n = jnp.asarray(np.tile(_unit([0.0, 1.0, 0.0]), (64, 1)))
    d0, _ = brdf.cosine_hemisphere_ld(jax.random.PRNGKey(1), n, 16)
    d1, _ = brdf.cosine_hemisphere_ld(jax.random.PRNGKey(2), n, 16)
    assert float(np.abs(np.asarray(d0) - np.asarray(d1)).max()) > 0.1


def test_vndf_sampling_reflects_above_surface():
    rng = np.random.default_rng(2)
    n = jnp.asarray(np.tile(_unit([0.0, 0.0, 1.0]), (2048, 1)))
    v = jnp.asarray(_unit(np.abs(rng.normal(size=(2048, 3)))
                          * np.array([1, 1, 1.0])))
    rough = jnp.full((2048,), 0.4)
    l, h = brdf.sample_ggx_vndf(jax.random.PRNGKey(1), n, v, rough)
    # half vectors are in the upper hemisphere
    assert float(jnp.min(h[:, 2])) > 0
    # l = reflect(v, h) is unit
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(l, axis=-1)), 1.0,
                               atol=1e-4)


def test_white_furnace_diffuse():
    """MC estimate of a white Lambertian under unit ambient light ~ albedo."""
    n_pts = 512
    rng = np.random.default_rng(3)
    normals = jnp.asarray(_unit(rng.normal(size=(n_pts, 3))))
    view = jnp.asarray(_unit(np.asarray(normals)
                             + 0.3 * rng.normal(size=(n_pts, 3))))
    kd = jnp.full((n_pts, 3), 0.7)
    ks = jnp.full((n_pts, 3), 0.0001)
    rough = jnp.full((n_pts,), 0.5)

    out = shade(RenderingLayerConfig(spp=256), jax.random.PRNGKey(0),
                jnp.zeros((n_pts, 3)), normals, view, kd, ks, rough,
                lambda p, d: jnp.ones((p.shape[0], 3)))
    mean_diff = float(out["color_diffuse"].mean())
    np.testing.assert_allclose(mean_diff, 0.7, rtol=0.05)


def test_combined_pdf_positive_and_normalized_choice():
    rng = np.random.default_rng(4)
    n = jnp.asarray(np.tile(_unit([0.0, 0.0, 1.0]), (128, 1)))
    v = jnp.asarray(_unit(np.abs(rng.normal(size=(128, 3)))))
    l = jnp.asarray(_unit(np.abs(rng.normal(size=(128, 3)))))
    kd = jnp.full((128, 3), 0.5)
    ks = jnp.full((128, 3), 0.2)
    pdf = brdf.combined_pdf(kd, ks, jnp.full((128,), 0.3), n, v, l)
    assert np.asarray(pdf).min() > 0


def test_sample_uniform_cone_statistics():
    """Directions land inside the cone; the mean z (in cone frame) of a
    uniform-solid-angle cap is (1 + cos_half)/2."""
    axis = jnp.asarray(np.tile(_unit([0.3, -0.2, 0.9]), (4096, 1)))
    cos_half = jnp.full((4096,), 0.8)
    l, pdf = brdf.sample_uniform_cone(jax.random.PRNGKey(0), axis,
                                      cos_half)
    cos_t = np.asarray(jnp.sum(l * axis, -1))
    assert cos_t.min() >= 0.8 - 1e-5
    np.testing.assert_allclose(cos_t.mean(), 0.9, atol=0.01)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(l), axis=-1),
                               1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf),
                               1.0 / (2 * np.pi * (1 - 0.8)), rtol=1e-5)


def test_shade_emitters_matches_brdf_sampling():
    """Next-event estimation and BRDF importance sampling estimate the
    same integral: their high-spp means must agree (the NEE estimator
    at spp=256 is already near-exact; BRDF sampling needs 4096)."""
    from i2sdf_tpu.models.rendering_layer import shade_emitters

    rng = np.random.default_rng(7)
    n_pts = 128
    pts = jnp.asarray(
        np.concatenate([rng.uniform(-1, 1, (n_pts, 2)),
                        np.zeros((n_pts, 1))], -1), jnp.float32)
    normals = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_pts, 1)),
                          jnp.float32)
    view = jnp.asarray(_unit(np.abs(rng.normal(size=(n_pts, 3)))),
                       jnp.float32)
    kd = jnp.full((n_pts, 3), 0.6)
    ks = jnp.full((n_pts, 3), 0.04)
    rough = jnp.full((n_pts,), 0.5)
    centers = jnp.asarray([[0.3, 0.2, 1.8]])
    radii = jnp.asarray([0.9])
    radiance = jnp.asarray([[2.0, 3.0, 1.0]])

    def li(p, d):
        oc = p - centers[0]
        b = jnp.sum(oc * d, -1)
        c = jnp.sum(oc * oc, -1) - radii[0] ** 2
        hit = (b * b - c > 0) & (-b - jnp.sqrt(
            jnp.maximum(b * b - c, 0.0)) > 1e-3)
        return radiance[0][None, :] * hit[:, None]

    a = shade(RenderingLayerConfig(spp=4096), jax.random.PRNGKey(1),
              pts, normals, view, kd, ks, rough, li)
    b = shade_emitters(RenderingLayerConfig(spp=256),
                       jax.random.PRNGKey(2), pts, normals, view, kd,
                       ks, rough, centers, radii, radiance)
    ta = np.asarray(a["color_diffuse"] + a["color_specular"]).mean(0)
    tb = np.asarray(b["color_diffuse"] + b["color_specular"]).mean(0)
    np.testing.assert_allclose(ta, tb, rtol=0.05)


def test_shade_emitters_gradient_signal_small_emitter():
    """The motivating case for NEE: a compact emitter (2% of the
    hemisphere) still yields a nonzero, finite kd gradient at spp=4,
    where BRDF sampling's gradient is almost always exactly zero."""
    from i2sdf_tpu.models.rendering_layer import shade_emitters

    n_pts = 32
    pts = jnp.zeros((n_pts, 3))
    normals = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_pts, 1)),
                          jnp.float32)
    centers = jnp.asarray([[0.0, 0.0, 2.0]])
    radii = jnp.asarray([0.15])
    radiance = jnp.asarray([[5.0, 5.0, 5.0]])

    def loss(kd):
        out = shade_emitters(RenderingLayerConfig(spp=4),
                             jax.random.PRNGKey(0), pts, normals,
                             normals, kd, jnp.full((n_pts, 3), 0.04),
                             jnp.full((n_pts,), 0.5), centers, radii,
                             radiance)
        return (out["color_diffuse"] + out["color_specular"]).sum()

    g = np.asarray(jax.grad(loss)(jnp.full((n_pts, 3), 0.5)))
    assert np.isfinite(g).all()
    assert (np.abs(g).sum(axis=-1) > 0).all()  # every point has signal


def test_shade_emitters_two_emitters_additive():
    """Direct light from independent emitters adds linearly."""
    from i2sdf_tpu.models.rendering_layer import shade_emitters

    n_pts = 64
    pts = jnp.zeros((n_pts, 3))
    normals = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n_pts, 1)),
                          jnp.float32)
    kd = jnp.full((n_pts, 3), 0.5)
    ks = jnp.full((n_pts, 3), 0.04)
    rough = jnp.full((n_pts,), 0.5)
    cfg = RenderingLayerConfig(spp=512)
    c1 = jnp.asarray([[0.8, 0.0, 1.5]])
    c2 = jnp.asarray([[-0.8, 0.0, 1.5]])
    r1 = jnp.asarray([0.5])
    l1 = jnp.asarray([[2.0, 1.0, 0.5]])
    l2 = jnp.asarray([[0.5, 1.0, 2.0]])

    def total(centers, radii, radiance, key):
        o = shade_emitters(cfg, jax.random.PRNGKey(key), pts, normals,
                           normals, kd, ks, rough, centers, radii,
                           radiance)
        return np.asarray(o["color_diffuse"] + o["color_specular"])

    both = total(jnp.concatenate([c1, c2]), jnp.concatenate([r1, r1]),
                 jnp.concatenate([l1, l2]), 0)
    a = total(c1, r1, l1, 1)
    b = total(c2, r1, l2, 2)
    np.testing.assert_allclose(both.mean(0), (a + b).mean(0), rtol=0.05)
