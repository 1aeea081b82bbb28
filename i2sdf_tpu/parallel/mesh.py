"""Device mesh + sharding helpers: rays are the shard axis.

The reference is single-GPU (SURVEY.md §2c: no distributed communication
anywhere); this framework is multi-chip first. The natural parallelism of
per-ray volume rendering is data parallelism over rays:

* params replicated, ray batch sharded over the 'data' mesh axis;
* the loss mean and Adam update induce XLA `psum` collectives over ICI;
* full-image eval shards pixel chunks the same way;
* multi-host slices: the jitted programs need no change (jit +
  NamedSharding are SPMD-global), but array CREATION does —
  `jax.device_put` cannot place shards on another host's devices, so
  every placement below routes through `make_array_from_callback` when
  more than one process participates (each host materializes only its
  addressable shards; every host holds the full numpy data, which is
  the right trade for this workload's sub-GB datasets). Call
  `initialize_multihost()` (CLI `--multihost`) before any jax API on
  multi-host slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(**kwargs) -> int:
    """`jax.distributed.initialize` (coordinator/process env-driven on
    TPU pods); returns the process count. Safe to skip single-host —
    callers gate on the CLI flag."""
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


def _put(x, sharding: NamedSharding):
    """Place one array under `sharding`, multi-host-safely.

    Single-process: plain device_put (fastest path, unchanged
    behavior). Multi-process: make_array_from_callback, which asks this
    host only for the index-slices of ITS addressable shards; jax
    assembles the global logically-sharded array across hosts.
    """
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])
    return jax.device_put(x, sharding)


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a pytree of (B, ...) arrays sharded over the batch axis."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate_params(mesh: Mesh, tree):
    """Replicate a parameter pytree on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _put(x, sharding), tree)
