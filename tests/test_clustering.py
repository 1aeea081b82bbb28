import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.ops.clustering import (init_emission_groups, kmeans,
                                      kmeans_pp_init)


def _three_blobs(n=300, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0]], np.float32)
    pts = np.concatenate([
        c + 0.2 * rng.normal(size=(n, 3)).astype(np.float32)
        for c in centers])
    return jnp.asarray(pts), centers


def test_kmeans_recovers_blobs():
    pts, centers = _three_blobs()
    init = kmeans_pp_init(jax.random.PRNGKey(0), pts, 3)
    labels, found = kmeans(pts, init, iters=30)
    found = np.sort(np.asarray(found), axis=0)
    expected = np.sort(centers, axis=0)
    np.testing.assert_allclose(found, expected, atol=0.15)
    # each blob maps to one label
    lab = np.asarray(labels)
    for i in range(3):
        blob = lab[i * 300:(i + 1) * 300]
        assert (blob == blob[0]).mean() > 0.99


def test_kmeans_pp_spreads_seeds():
    pts, _ = _three_blobs()
    seeds = np.asarray(kmeans_pp_init(jax.random.PRNGKey(1), pts, 3))
    d01 = np.linalg.norm(seeds[0] - seeds[1])
    d02 = np.linalg.norm(seeds[0] - seeds[2])
    d12 = np.linalg.norm(seeds[1] - seeds[2])
    assert min(d01, d02, d12) > 2.0  # not all from the same blob


def test_init_emission_groups():
    pts, _ = _three_blobs()
    labels, centroids, emissions = init_emission_groups(
        jax.random.PRNGKey(0), pts, 3, init_emission=2.0)
    assert emissions.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(emissions), 2.0)
    assert centroids.shape == (3, 3)
    assert len(np.unique(np.asarray(labels))) == 3
