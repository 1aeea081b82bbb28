import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.models.embedder import (fourier_feature, get_embedder,
                                       positional_encoding,
                                       spherical_harmonics)


def test_pe_layout_and_values():
    # TPU-first block layout: [x | sin dim-major | cos dim-major]
    # (exact permutation of the reference's interleaved layout; the
    # geometric init zeroes every PE channel so training is equivalent)
    embed, out_dim = positional_encoding(multires=2, input_dims=3)
    assert out_dim == 3 * (1 + 2 * 2)
    x = jnp.array([[0.5, -0.25, 1.0]])
    y = np.asarray(embed(x))[0]
    expected = np.concatenate([
        [0.5, -0.25, 1.0],
        np.sin([0.5, 1.0, -0.25, -0.5, 1.0, 2.0]),
        np.cos([0.5, 1.0, -0.25, -0.5, 1.0, 2.0]),
    ])
    np.testing.assert_allclose(y, expected, atol=1e-6)


def test_pe_block_layout_is_permutation_of_reference():
    from i2sdf_tpu.models.embedder import pe_permutation_from_reference

    embed, out_dim = positional_encoding(multires=3, input_dims=3)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (5, 3)))
    # reference interleaved layout, built independently
    parts = [x]
    for f in (1.0, 2.0, 4.0):
        parts += [np.sin(x * f), np.cos(x * f)]
    ref = np.concatenate(parts, axis=-1)
    perm = pe_permutation_from_reference(multires=3, input_dims=3)
    # pin f32: the x @ B basis matmul runs bf16 under TPU DEFAULT
    # precision (fine in production, too coarse for a 1e-6 assert)
    with jax.default_matmul_precision("float32"):
        y = np.asarray(embed(jnp.asarray(x)))
    np.testing.assert_allclose(y, ref[:, perm], atol=1e-6)


def test_pe_frequencies_log_spaced():
    embed, out_dim = positional_encoding(multires=6, input_dims=3)
    assert out_dim == 39  # 3 + 3*2*6 — the implicit-net input width
    x = jnp.ones((1, 3)) * 0.001
    y = embed(x)
    assert y.shape == (1, 39)


def test_sh_constant_and_degree1():
    embed, out_dim = spherical_harmonics(degree=2)
    assert out_dim == 4
    p = jnp.array([[0.0, 0.0, 1.0]])
    y = np.asarray(embed(p))[0]
    np.testing.assert_allclose(y[0], 0.28209479, atol=1e-6)
    np.testing.assert_allclose(y[1], 0.0, atol=1e-7)  # -C1*y
    np.testing.assert_allclose(y[2], 0.48860251, atol=1e-6)  # C1*z
    np.testing.assert_allclose(y[3], 0.0, atol=1e-7)  # -C1*x


def test_sh_degree5_shape():
    embed, out_dim = spherical_harmonics(degree=5)
    assert out_dim == 25
    p = jax.random.normal(jax.random.PRNGKey(0), (7, 3))
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    assert embed(p).shape == (7, 25)


def test_fourier_feature():
    embed, out_dim = fourier_feature(jax.random.PRNGKey(0), channels=16)
    assert out_dim == 2 * 16 + 3
    x = jnp.zeros((2, 3))
    y = np.asarray(embed(x))
    assert y.shape == (2, 35)
    np.testing.assert_allclose(y[:, 3:19], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(y[:, 19:], 1.0, atol=1e-7)  # cos(0)


def test_get_embedder_dispatch():
    fn, d = get_embedder("positional", multires=4, input_dims=3)
    assert d == 27
    fn, d = get_embedder("spherical_harmonics", degree=3)
    assert d == 9
