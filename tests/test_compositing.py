import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.ops.compositing import render_weights, render_weights_bg


def test_weights_manual_case():
    z = jnp.array([[1.0, 2.0, 3.0]])
    z_max = jnp.array([5.0])
    dens = jnp.array([[0.5, 1.0, 0.25]])
    w, bg_t = render_weights(z, z_max, dens)
    # dists = [1, 1, 2]; fe = [.5, 1, .5]
    fe = np.array([0.5, 1.0, 0.5])
    alpha = 1 - np.exp(-fe)
    T = np.exp(-np.cumsum(np.concatenate([[0.0], fe])))
    np.testing.assert_allclose(np.asarray(w)[0], alpha * T[:3], rtol=1e-5)
    np.testing.assert_allclose(float(bg_t[0]), T[3], rtol=1e-5)


def test_weights_sum_plus_bg_equals_one():
    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(0, 5, (4, 16)), axis=-1)
    z_max = z[:, -1] + rng.uniform(0.1, 2, 4)
    dens = rng.uniform(0, 3, (4, 16))
    w, bg_t = render_weights(jnp.asarray(z), jnp.asarray(z_max),
                             jnp.asarray(dens))
    total = np.asarray(w).sum(-1) + np.asarray(bg_t)
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)


def test_opaque_wall_concentrates_weight():
    z = jnp.linspace(0.0, 4.0, 64)[None, :]
    z_max = jnp.array([4.1])
    dens = jnp.where(z > 2.0, 500.0, 0.0)
    w, bg_t = render_weights(z, z_max, dens)
    depth = float(jnp.sum(w * z, axis=-1)[0])
    assert abs(depth - 2.0) < 0.1
    assert float(bg_t[0]) < 1e-6


def test_bg_weights_descending_invdepth():
    z_bg = jnp.linspace(1.0, 0.0, 8)[None, :]  # flipped 1 -> 0
    dens = jnp.full((1, 8), 0.3)
    w = render_weights_bg(z_bg, dens)
    assert w.shape == (1, 8)
    assert float(w.sum()) <= 1.0 + 1e-5
    # last (infinite) interval absorbs everything that remains
    assert float(w[0, -1]) > 0
