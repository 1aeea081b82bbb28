import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.models.density import (abs_density, effective_beta,
                                      laplace_density)


def test_laplace_density_formula():
    beta = 0.1
    sdf = jnp.array([-0.5, -0.05, 0.0, 0.05, 0.5])
    d = np.asarray(laplace_density(sdf, beta))
    s = np.asarray(sdf)
    # closed form: alpha * (0.5 * exp(s/b)) for s<0 side flipped;
    # Laplace CDF of -s: s>0 -> 0.5*exp(-s/b); s<0 -> 1-0.5*exp(s/b)
    expected = np.where(s > 0, 0.5 * np.exp(-s / beta),
                        1 - 0.5 * np.exp(s / beta)) / beta
    np.testing.assert_allclose(d, expected, rtol=1e-5)


def test_laplace_density_at_zero():
    np.testing.assert_allclose(
        float(laplace_density(jnp.float32(0.0), 0.2)), 0.5 / 0.2, rtol=1e-6)


def test_laplace_monotone_decreasing_in_sdf():
    sdf = jnp.linspace(-1, 1, 101)
    d = np.asarray(laplace_density(sdf, 0.1))
    assert np.all(np.diff(d) <= 1e-7)


def test_effective_beta():
    assert float(effective_beta(jnp.float32(-0.1), 1e-4)) == np.float32(0.1001)
    assert float(effective_beta(jnp.float32(0.0), 1e-4)) > 0


def test_abs_density():
    np.testing.assert_allclose(
        np.asarray(abs_density(jnp.array([-2.0, 3.0]))), [2.0, 3.0])
