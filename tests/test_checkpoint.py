"""Orbax checkpoint roundtrip incl. bubble pdf state."""

import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.train.checkpoint import CheckpointManager
from i2sdf_tpu.train.state import create_train_state


def _params(key):
    k1, k2 = jax.random.split(key)
    return {
        "implicit": {"lin0": {"v": jax.random.normal(k1, (8, 4)),
                              "g": jnp.ones((4,)), "b": jnp.zeros((4,))}},
        "beta": jnp.float32(0.1),
    }


def test_roundtrip(tmp_path):
    params = _params(jax.random.PRNGKey(0))
    state, _ = create_train_state(params)
    state = state._replace(step=jnp.int32(42))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    bubble = {"pdf": jnp.arange(10.0), "sample_count": jnp.ones(10, jnp.int32)}
    mgr.save(42, state, bubble)
    assert mgr.latest_step() == 42

    fresh, _ = create_train_state(_params(jax.random.PRNGKey(1)))
    restored, rb = mgr.restore(fresh, bubble_template={
        "pdf": jnp.zeros(10), "sample_count": jnp.zeros(10, jnp.int32)})
    assert int(restored.step) == 42
    np.testing.assert_allclose(
        np.asarray(restored.params["implicit"]["lin0"]["v"]),
        np.asarray(params["implicit"]["lin0"]["v"]))
    np.testing.assert_allclose(np.asarray(rb["pdf"]), np.arange(10.0))
    mgr.close()


def test_restore_without_bubble(tmp_path):
    params = _params(jax.random.PRNGKey(0))
    state, _ = create_train_state(params)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(7, state)
    restored, rb = mgr.restore(state)
    assert rb is None
    assert int(restored.step) == 0  # fresh state at step 0
    mgr.close()


def test_multiple_saves_keep_latest(tmp_path):
    params = _params(jax.random.PRNGKey(0))
    state, _ = create_train_state(params)
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for s in (10, 20, 30):
        mgr.save(s, state._replace(step=jnp.int32(s)))
    assert mgr.latest_step() == 30
    restored, _ = mgr.restore(state, step=20)
    assert int(restored.step) == 20
    mgr.close()
