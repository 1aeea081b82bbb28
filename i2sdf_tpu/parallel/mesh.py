"""Device mesh + sharding helpers: rays are the shard axis.

The reference is single-GPU (SURVEY.md §2c: no distributed communication
anywhere); this framework is multi-chip first. The natural parallelism of
per-ray volume rendering is data parallelism over rays:

* params replicated, ray batch sharded over the 'data' mesh axis;
* the loss mean and Adam update induce XLA `psum` collectives over ICI;
* full-image eval shards pixel chunks the same way;
* multi-host slices need no code change (jit + NamedSharding are
  SPMD-global).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a pytree of (B, ...) arrays sharded over the batch axis."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate_params(mesh: Mesh, tree):
    """Replicate a parameter pytree on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
