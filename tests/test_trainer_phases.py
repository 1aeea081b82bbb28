"""Trainer-owned per-ray phase selection: the jitted step is swapped
(and cached) when the learned beta crosses PER_RAY_PHASES boundaries."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from i2sdf_tpu.config import load_cfg
from i2sdf_tpu.data import generate_synthetic_scene
from i2sdf_tpu.train.step import PER_RAY_PHASES
from i2sdf_tpu.train.trainer import ReconstructionTrainer

CONF = {
    "train": {"expname": "ph", "learning_rate": 5e-4, "steps": 100,
              "checkpoint_freq": 1000, "plot_freq": 1000,
              "split_n_pixels": 512, "batch_size": 64},
    "plot": {"plot_nimgs": 1, "grid_boundary": [-2.2, 2.2]},
    "loss": {"eikonal_weight": 0.1, "depth_weight": 0.1},
    "dataset": {"data_dir": "demo", "img_res": [16, 20], "downsample": 1},
    "model": {
        "feature_vector_size": 16, "scene_bounding_sphere": 4.0,
        "implicit_network": {
            "d_in": 3, "d_out": 1, "dims": [16, 16],
            "geometric_init": True, "bias": 0.6, "skip_in": [],
            "weight_norm": True, "embed_type": "positional",
            "multires": 2},
        "rendering_network": {
            "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [16],
            "weight_norm": True, "embed_type": "positional",
            "multires": 2},
        "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
        "ray_sampler": {
            "near": 0.0, "N_samples": 8, "N_samples_eval": 16,
            "N_samples_extra": 4, "eps": 0.1, "beta_iters": 3,
            "max_total_iters": 2, "per_ray_exit": True},
    },
}


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("phases")
    generate_synthetic_scene(str(root / "data" / "demo"), n_images=2,
                             img_res=(16, 20))
    conf_path = str(root / "conf.yml")
    yaml.safe_dump(CONF, open(conf_path, "w"))
    return ReconstructionTrainer(load_cfg(conf_path),
                                 exp_dir=str(root / "exp"),
                                 data_root=str(root / "data"))


def test_trainer_amortized_bubble_fit(tmp_path):
    """End-to-end trainer loop with train.bubble_draw_every > 1: the
    bubble window opens, the queue initializes, steps run through the
    6-leaf bubble step, and the window closes cleanly."""
    import copy

    conf = copy.deepcopy(CONF)
    conf["train"]["steps"] = 24
    conf["train"]["bubble_draw_every"] = 4
    conf["loss"].update(bubble_weight=0.5, min_bubble_iter=4,
                        max_bubble_iter=20)
    generate_synthetic_scene(str(tmp_path / "data" / "demo"), n_images=2,
                             img_res=(16, 20))
    conf_path = str(tmp_path / "conf.yml")
    yaml.safe_dump(conf, open(conf_path, "w"))
    tr = ReconstructionTrainer(load_cfg(conf_path),
                               exp_dir=str(tmp_path / "exp"),
                               data_root=str(tmp_path / "data"))
    tr.fit(max_steps=24)
    assert int(tr.state.step) == 24
    assert not tr.bubble_activated  # window closed at 20
    assert tr.bubble_queue is None and tr.queue_pos is None


def test_base_cfg_keeps_per_ray_off(trainer):
    # the trainer owns phase selection: the base model cfg must not
    # bake compaction in
    assert trainer.auto_per_ray
    assert not trainer.model_cfg.sampler.per_ray_exit


def _set_beta(trainer, beta):
    trainer.state = trainer.state._replace(
        params=dict(trainer.state.params, beta=jnp.float32(beta)))


def test_phase_swaps_follow_beta(trainer):
    _set_beta(trainer, 0.1)
    trainer._update_per_ray_phase()
    assert trainer._per_ray_fracs is None  # global exit suffices
    step_large_beta = trainer._step_plain

    _set_beta(trainer, 0.01)
    trainer._update_per_ray_phase()
    assert trainer._per_ray_fracs == PER_RAY_PHASES[2][1]
    assert trainer._step_plain is not step_large_beta

    _set_beta(trainer, 3e-3)
    trainer._update_per_ray_phase()
    assert trainer._per_ray_fracs == PER_RAY_PHASES[3][1]

    # dominant small-beta regime: nothing to compact (round-5 measured
    # ladder) — falls back to the plain global-exit step, which is the
    # SAME cached jitted fn as the large-beta phase
    _set_beta(trainer, 5e-4)
    trainer._update_per_ray_phase()
    assert trainer._per_ray_fracs is None
    assert trainer._step_plain is step_large_beta

    # returning to a previous phase reuses the cached jitted step
    _set_beta(trainer, 0.1)
    trainer._update_per_ray_phase()
    assert trainer._per_ray_fracs is None
    assert trainer._step_plain is step_large_beta


def test_phase_specialized_step_runs(trainer):
    _set_beta(trainer, 0.01)
    trainer._update_per_ray_phase()
    import jax

    w = trainer.loss_cfg.dynamic_weights(0)
    state, metrics = trainer._step_plain(
        trainer.state, trainer.device_data, jax.random.PRNGKey(0), w)
    trainer.state = state  # the step donates its input state buffers
    assert np.isfinite(float(metrics["loss"]))


@pytest.fixture(scope="module")
def pinned_trainer(tmp_path_factory):
    """Same tiny setup but with ray_sampler.per_ray_fracs pinned in the
    config: the trainer must honor it at EVERY beta (no auto ladder)."""
    root = tmp_path_factory.mktemp("pinned")
    generate_synthetic_scene(str(root / "data" / "demo"), n_images=2,
                             img_res=(16, 20))
    conf = yaml.safe_load(yaml.safe_dump(CONF))
    conf["model"]["ray_sampler"]["per_ray_fracs"] = [1.0, 0.5]
    conf_path = str(root / "conf.yml")
    yaml.safe_dump(conf, open(conf_path, "w"))
    return ReconstructionTrainer(load_cfg(conf_path),
                                 exp_dir=str(root / "exp"),
                                 data_root=str(root / "data"))


def test_pinned_fracs_override_ladder(pinned_trainer):
    t = pinned_trainer
    assert t._fixed_per_ray_fracs == (1.0, 0.5)
    for beta in (0.1, 0.01, 5e-4):
        _set_beta(t, beta)
        t._update_per_ray_phase()
        assert t._per_ray_fracs == (1.0, 0.5), beta
