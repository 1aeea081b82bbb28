"""JAX LPIPS (eval/lpips.py): formula contract + perceptual ordering.

The reference reports LPIPS per image and mean
(`/root/reference/model/eval/recon.py:197-203`); this environment has no
pretrained weights, so these tests pin the properties that hold for both
the vendored-weight and random-feature variants.
"""

import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.eval.lpips import (_random_params, lpips_distance,
                                  load_params, make_lpips)


def _img(seed, h=64, w=64):
    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(seed), (h, w, 3)))


def test_identical_images_zero():
    fn = make_lpips()
    a = _img(0)
    assert fn(a, a) == 0.0


def test_symmetry_and_positivity():
    fn = make_lpips()
    a, b = _img(0), _img(1)
    d_ab, d_ba = fn(a, b), fn(b, a)
    assert d_ab > 0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_monotone_in_noise():
    # larger perturbations must read as perceptually farther
    fn = make_lpips()
    base = _img(3)
    rng = np.random.default_rng(0)
    noise = rng.normal(size=base.shape).astype(np.float32)
    d_small = fn(base, np.clip(base + 0.05 * noise, 0, 1))
    d_large = fn(base, np.clip(base + 0.4 * noise, 0, 1))
    assert d_small < d_large


def test_deterministic_across_processes():
    # the RF fallback must be seed-stable: same params every build
    p1 = _random_params()
    p2 = _random_params()
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))


def test_batched_distance_shape():
    params, name = load_params()
    assert name in ("lpips", "lpips-rf")
    a = jnp.zeros((2, 64, 64, 3))
    b = jnp.ones((2, 64, 64, 3)) * 0.5
    d = lpips_distance(params, a * 2 - 1, b * 2 - 1)
    assert d.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(d)))


def test_trainer_lpips_never_none():
    from i2sdf_tpu.train.trainer import lpips_fn

    fn = lpips_fn()
    assert fn is not None
    assert getattr(fn, "name", None) in ("lpips", "lpips-rf")
    a = _img(5)
    assert np.isfinite(fn(a, np.clip(a + 0.1, 0, 1)))
