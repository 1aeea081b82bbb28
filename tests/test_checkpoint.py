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


def test_resume_is_bit_deterministic(tmp_path):
    """5 steps + checkpoint + resume to 10 must equal 10 straight steps
    bit-for-bit: per-step keys are fold_in(base, step), so a resumed
    run replays the exact RNG stream (the reference's Lightning resume
    does not)."""
    import yaml

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.data import generate_synthetic_scene
    from i2sdf_tpu.train.trainer import ReconstructionTrainer
    from tests.test_trainer_phases import CONF

    root = tmp_path
    generate_synthetic_scene(str(root / "data" / "demo"), n_images=2,
                             img_res=(16, 20))
    conf = yaml.safe_load(yaml.safe_dump(CONF))
    conf["model"]["ray_sampler"]["per_ray_exit"] = False
    conf["train"]["plot_freq"] = 10_000  # no val renders mid-run
    conf_path = str(root / "conf.yml")
    yaml.safe_dump(conf, open(conf_path, "w"))

    def make(exp):
        return ReconstructionTrainer(load_cfg(conf_path),
                                     exp_dir=str(root / exp),
                                     data_root=str(root / "data"))

    straight = make("straight")
    straight.fit(max_steps=10)

    t1 = make("resumed")
    t1.fit(max_steps=5)  # saves a checkpoint at step 5 (== max_steps)
    t2 = make("resumed")
    t2.fit(max_steps=10, resume=True)

    leaves_a = jax.tree_util.tree_leaves(straight.state.params)
    leaves_b = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
