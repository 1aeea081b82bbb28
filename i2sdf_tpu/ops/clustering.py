"""Point-cloud clustering for emitter grouping (jit K-Means / K-Means++).

Capability parity with `/root/reference/model/network/__init__.py:49-75`
(init_emission_groups) + `utils/__init__.py:111-123` (kmeans_pp_centroid):
the reference shells out to fast_pytorch_kmeans / sklearn DBSCAN; here
K-Means(++), the path actually exercised, is a fixed-iteration
`lax.scan` that runs on device. DBSCAN seeding is provided host-side
via sklearn when available (it's an init-only convenience).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kmeans_pp_init(key, points: jnp.ndarray, k: int) -> jnp.ndarray:
    """K-Means++ seeding (parity utils/__init__.py:111-123)."""
    n = points.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centroids = jnp.zeros((k, 3), points.dtype).at[0].set(points[first])

    def body(carry, i):
        centroids, key = carry
        d2 = jnp.min(
            jnp.sum((points[:, None, :] - centroids[None, :, :]) ** 2,
                    axis=-1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
            axis=-1)
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(jnp.maximum(d2, 1e-12)))
        centroids = centroids.at[i].set(points[idx])
        return (centroids, key), None

    (centroids, _), _ = jax.lax.scan(
        body, (centroids, key), jnp.arange(1, k))
    return centroids


def kmeans(points: jnp.ndarray, centroids: jnp.ndarray,
           iters: int = 50) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd iterations as a lax.scan; returns (labels, centroids)."""
    k = centroids.shape[0]

    def assign(centroids):
        d2 = jnp.sum((points[:, None, :] - centroids[None, :, :]) ** 2, -1)
        return jnp.argmin(d2, axis=-1)

    def body(centroids, _):
        labels = assign(centroids)
        one_hot = jax.nn.one_hot(labels, k, dtype=points.dtype)
        counts = jnp.maximum(one_hot.sum(0), 1.0)
        new_centroids = (one_hot.T @ points) / counts[:, None]
        # keep empty clusters where they were
        new_centroids = jnp.where(
            (one_hot.sum(0) > 0)[:, None], new_centroids, centroids)
        return new_centroids, None

    centroids, _ = jax.lax.scan(body, centroids, None, length=iters)
    return assign(centroids), centroids


def init_emission_groups(key, pointcloud: jnp.ndarray, n_emitters: int,
                         init_emission: float = 1.0,
                         use_dbscan: bool = False):
    """Cluster emitter points and create per-emitter RGB emission params.

    Returns (labels, centroids, emissions (n_emitters, 3)). With
    use_dbscan, DBSCAN seeds the centroids from a 10k random subset and
    errors out on an emitter-count mismatch (reference behavior,
    network/__init__.py:55-60 — raise instead of exit()).
    """
    if use_dbscan:
        from sklearn.cluster import DBSCAN

        rng = np.random.default_rng(0)
        pts = np.asarray(pointcloud)
        sub = pts[rng.permutation(len(pts))[:10_000]]
        labels = DBSCAN(n_jobs=-1).fit_predict(sub)
        uniq = np.unique(labels)
        if n_emitters != len(uniq):
            raise ValueError(
                f"Inconsistent emitter count: {n_emitters} / {len(uniq)}")
        init = np.stack([sub[labels == u][0] for u in uniq])
        centroids = jnp.asarray(init, jnp.float32)
    else:
        centroids = kmeans_pp_init(key, pointcloud, n_emitters)
    labels, centroids = kmeans(pointcloud, centroids)
    emissions = jnp.full((n_emitters, 3), init_emission, jnp.float32)
    return labels, centroids, emissions
