import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.ops.sampling import (gumbel_topk_sample, linear_z_vals,
                                    pdf_to_cdf, sample_cdf, stratify)


def test_linear_z_vals():
    near = jnp.array([[0.0], [1.0]])
    far = jnp.array([[6.0], [3.0]])
    z = np.asarray(linear_z_vals(near, far, 4))
    np.testing.assert_allclose(z[0], [0, 2, 4, 6], atol=1e-6)
    np.testing.assert_allclose(z[1], [1, 5 / 3, 7 / 3, 3], atol=1e-6)


def test_stratify_stays_in_bins():
    z = jnp.linspace(0, 1, 16)[None, :].repeat(8, 0)
    zs = np.asarray(stratify(jax.random.PRNGKey(0), z))
    assert np.all(np.diff(zs, axis=-1) > -1e-6)
    assert zs.min() >= 0.0 and zs.max() <= 1.0


def test_sample_cdf_uniform_recovers_bins():
    bins = jnp.linspace(0.0, 1.0, 11)[None, :]
    pdf = jnp.ones((1, 10))
    cdf = pdf_to_cdf(pdf)
    u = jnp.linspace(0.0, 1.0, 21)[None, :]
    s = np.asarray(sample_cdf(bins, cdf, u))
    np.testing.assert_allclose(s[0], np.linspace(0, 1, 21), atol=1e-5)


def test_sample_cdf_concentrates_on_heavy_bin():
    bins = jnp.linspace(0.0, 1.0, 11)[None, :]
    pdf = jnp.ones((1, 10)).at[0, 5].set(1000.0)
    cdf = pdf_to_cdf(pdf)
    u = jax.random.uniform(jax.random.PRNGKey(0), (1, 512))
    s = np.asarray(sample_cdf(bins, cdf, u))
    frac = np.mean((s >= 0.5) & (s <= 0.6))
    assert frac > 0.9


def test_pdf_to_cdf_shapes():
    cdf = pdf_to_cdf(jnp.ones((3, 7)))
    assert cdf.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(cdf[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(cdf[:, -1]), 1.0, rtol=1e-6)


def test_gumbel_topk_no_replacement_and_proportional():
    log_w = jnp.log(jnp.asarray([0.01, 0.01, 10.0, 0.01, 5.0, 0.01]))
    counts = np.zeros(6)
    for i in range(200):
        idx = np.asarray(
            gumbel_topk_sample(jax.random.PRNGKey(i), log_w, 2))
        assert len(set(idx.tolist())) == 2  # without replacement
        counts[idx] += 1
    assert counts[2] > 150 and counts[4] > 120


def test_gumbel_topk_respects_mask():
    log_w = jnp.asarray([0.0, -jnp.inf, 0.0, -jnp.inf])
    for i in range(20):
        idx = np.asarray(gumbel_topk_sample(jax.random.PRNGKey(i), log_w, 2))
        assert set(idx.tolist()) == {0, 2}


def test_trunc_exp_clamped_backward():
    from i2sdf_tpu.ops.activations import trunc_exp

    x = jnp.array([0.0, 1.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([0, 1, 20]),
                               rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    # backward clamps the exponent at 15
    np.testing.assert_allclose(np.asarray(g),
                               np.exp([0, 1, 15]), rtol=1e-5)


def test_prefix_sum_matches_cumsum():
    from i2sdf_tpu.ops.sampling import prefix_sum

    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 256))
    a = np.asarray(prefix_sum(x))
    b = np.cumsum(np.asarray(x), axis=-1)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
    # small case goes through the exact path
    y = jax.random.uniform(jax.random.PRNGKey(1), (4, 32))
    np.testing.assert_allclose(np.asarray(prefix_sum(y)),
                               np.cumsum(np.asarray(y), -1), rtol=1e-6)


def test_pdf_to_cdf_zero_rows_fall_back_to_uniform():
    """All-zero pdf rows (possible with add_tiny=0 at small beta — the
    reference's own default, ray_sampler.py:49) must yield a uniform
    CDF, not 0/0 NaN that permanently poisons training through Adam."""
    from i2sdf_tpu.ops.sampling import pdf_to_cdf

    pdf = jnp.stack([jnp.zeros(8), jnp.ones(8)])
    cdf = pdf_to_cdf(pdf)
    assert bool(jnp.isfinite(cdf).all())
    expected = jnp.concatenate([jnp.zeros(1), jnp.cumsum(jnp.ones(8) / 8)])
    np.testing.assert_allclose(np.asarray(cdf[0]), np.asarray(expected),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cdf[1]), np.asarray(expected),
                               atol=1e-6)
