"""Relight test mode (eval/relight.py): emitter discovery from light
masks, sphere-traced visibility, and the end-to-end relit render."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.config import CfgNode
from i2sdf_tpu.data import ReconData, generate_synthetic_scene
from i2sdf_tpu.eval.relight import (Emitters, carve_emitters_sdf,
                                    find_emitters,
                                    make_incident_radiance_fn, run_relight,
                                    sphere_trace_visibility)
from i2sdf_tpu.models import renderer

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
    root = tmp_path_factory.mktemp("relight_scene")
    generate_synthetic_scene(str(root / "demo"), n_images=3,
                             img_res=(20, 24))
    return str(root)


def test_find_emitters(scene):
    rd = ReconData("demo", scan_id=0, data_root=scene, use_depth=True,
                   use_lightmask=True)
    em = find_emitters(rd, n_emitters=1, emitter_scale=2.0)
    assert em.count == 1
    assert float(em.radii[0]) > 0
    assert np.isfinite(np.asarray(em.centers)).all()
    # the synthetic emitter is a bright panel: radiance should be bright
    assert float(np.asarray(em.radiance).max()) > 0.0


def test_sphere_trace_visibility_analytic():
    # analytic unit-sphere SDF: rays from outside toward the sphere are
    # occluded; tangent rays that miss it are visible
    def sdf(p):
        return jnp.linalg.norm(p, axis=-1) - 1.0

    origins = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 2.0, -3.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    vis = sphere_trace_visibility(sdf, origins, dirs,
                                  jnp.asarray([6.0, 6.0]), n_steps=48)
    assert float(vis[0]) == 0.0  # hits the sphere
    assert float(vis[1]) == 1.0  # passes above it


def test_find_emitters_locates_fixture(tmp_path):
    """With a mask-covered view, the clustered emitter must land on the
    scene's spherical light fixture (synth.py::_LIGHT_POS)."""
    from i2sdf_tpu.data.synth import _LIGHT_POS, _LIGHT_RADIUS

    generate_synthetic_scene(str(tmp_path / "demo"), n_images=4,
                             img_res=(32, 40))
    rd = ReconData("demo", scan_id=0, data_root=str(tmp_path),
                   use_depth=True, use_lightmask=True)
    em = find_emitters(rd, n_emitters=1)
    center = np.asarray(em.centers)[0]
    # the visible part of the fixture is its lower dome, so the cluster
    # centroid sits inside the ball, below the true center
    assert np.linalg.norm(center - np.asarray(_LIGHT_POS)) < 1.5 * _LIGHT_RADIUS
    assert 0.02 < float(em.radii[0]) < 3.0 * _LIGHT_RADIUS


def test_find_emitters_two_fixtures(tmp_path):
    """Scene-level multi-emitter discovery: a TWO_LIGHTS scan's masks
    must cluster into two emitters, one on each physical fixture."""
    from i2sdf_tpu.data.synth import TWO_LIGHTS

    generate_synthetic_scene(str(tmp_path / "demo"), n_images=8,
                             img_res=(48, 64), lights=TWO_LIGHTS)
    rd = ReconData("demo", scan_id=0, data_root=str(tmp_path),
                   use_depth=True, use_lightmask=True)
    em = find_emitters(rd, n_emitters=2)
    centers = np.asarray(em.centers)
    gts = np.stack([np.asarray(pos) for pos, _, _ in TWO_LIGHTS])
    # each recovered emitter matches a DISTINCT fixture
    d = np.linalg.norm(centers[:, None] - gts[None], axis=-1)  # (2, 2)
    best = d.argmin(axis=1)
    assert set(best.tolist()) == {0, 1}
    assert float(d.min(axis=1).max()) < 0.5


def test_carve_emitters_sdf():
    """Emitter balls must read as free space for visibility: a light
    embedded in the ceiling must not shadow its own illumination."""
    def ceiling_sdf(p):  # solid above y=2 (a ceiling plane)
        return 2.0 - p[..., 1]

    centers = jnp.asarray([[0.0, 2.0, 0.0]])  # ON the ceiling surface
    radii = jnp.asarray([0.3])
    carved = carve_emitters_sdf(ceiling_sdf, centers, radii)

    # inside the ball: free space; far free-space points: unchanged;
    # solid points outside the ball: still occluders (negative)
    inside = jnp.asarray([[0.0, 1.9, 0.0], [0.1, 2.05, 0.0]])
    assert float(jnp.min(carved(inside))) > 0.0
    free = jnp.asarray([[1.5, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(carved(free)),
                               np.asarray(ceiling_sdf(free)), atol=1e-6)
    solid = jnp.asarray([[0.0, 2.5, 0.0], [1.0, 2.4, 0.0]])
    assert float(jnp.max(carved(solid))) < 0.0

    # visibility from the floor toward the embedded emitter's center:
    # occluded under the raw SDF (the march reaches the emitting
    # surface, min sdf -> 0), clear under the carved one
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    t_max = jnp.asarray([2.0])  # to the ball center, ON the ceiling
    raw = sphere_trace_visibility(ceiling_sdf, origin, d, t_max, n_steps=24)
    crv = sphere_trace_visibility(carved, origin, d, t_max, n_steps=24)
    assert float(raw[0]) == 0.0
    assert float(crv[0]) == 1.0


def test_incident_radiance_hits_emitter():
    def sdf(p):  # empty scene
        return jnp.full(p.shape[:1], 10.0)

    em = Emitters(centers=[[0.0, 0.0, 2.0]], radii=[0.5],
                  radiance=[[3.0, 2.0, 1.0]])
    li = make_incident_radiance_fn(sdf, em, n_steps=16)
    pts = jnp.zeros((2, 3))
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    out = np.asarray(li(pts, dirs))
    np.testing.assert_allclose(out[0], [3.0, 2.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_run_relight_end_to_end(scene, tmp_path):
    node = CfgNode({
        "train": {"split_n_pixels": 512},
        "dataset": {"data_dir": "demo", "img_res": [20, 24],
                    "downsample": 1},
        "model": dict(TINY_MODEL),
    })
    model_node = node.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    res = run_relight(params, cfg, node, str(tmp_path),
                      data_root=scene, indices=[0], spp=2,
                      n_emitters=1, chunk=256, vis_steps=8,
                      fused=False)
    assert res["emitters"] == 1
    out = os.path.join(str(tmp_path), "eval", "relight")
    assert os.path.exists(os.path.join(out, "0000_relit.png"))
    assert os.path.exists(os.path.join(out, "0000_diffuse.png"))
    assert os.path.exists(os.path.join(out, "0000_specular.png"))
    # linear-radiance EXR (or .npy fallback) next to the tonemapped PNG
    assert (os.path.exists(os.path.join(out, "0000_relit.exr"))
            or os.path.exists(os.path.join(out, "0000_relit.npy")))
    img = np.asarray(res["images"][0]["mean_radiance"])
    assert np.isfinite(img)


def _light_model():
    node = dict(TINY_MODEL)
    node["light_network"] = {"dims": [16]}
    cfg_node = CfgNode({
        "train": {"split_n_pixels": 512},
        "dataset": {"data_dir": "demo", "img_res": [20, 24],
                    "downsample": 1},
        "model": node,
    })
    model_node = cfg_node.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    return cfg_node, cfg, renderer.init(jax.random.PRNGKey(0), cfg)


def test_find_emitters_from_model(scene):
    """Emitter discovery from the model's own light-mask head +
    rendered depth (no GT masks/depth needed)."""
    from i2sdf_tpu.data.plot import PlotData
    from i2sdf_tpu.eval.relight import find_emitters_from_model
    from i2sdf_tpu.train.step import make_eval_render_fn

    _, cfg, params = _light_model()
    render_image, _ = make_eval_render_fn(cfg, chunk_size=512,
                                          fused_sampler=False)
    pd = PlotData("demo", data_root=scene, plot_nimgs=-1)
    # untrained light head hovers near 0.5 * weight_sum: use a low
    # threshold so pixels qualify — this tests the machinery
    em = find_emitters_from_model(params, render_image, pd,
                                  n_emitters=1, mask_thresh=0.05)
    assert em.count == 1
    assert np.isfinite(np.asarray(em.centers)).all()
    assert float(em.radii[0]) > 0


def test_relight_falls_back_to_model_head(tmp_path, monkeypatch):
    """A scan without GT light masks must route emitter discovery to
    the model's light head (for light_network models)."""
    import shutil

    import i2sdf_tpu.eval.relight as rl

    root = tmp_path / "root"
    scan = generate_synthetic_scene(str(root / "demo"), n_images=3,
                                    img_res=(20, 24))
    shutil.rmtree(os.path.join(scan, "light_mask"))
    shutil.rmtree(os.path.join(scan, "depth"))

    node, cfg, params = _light_model()
    called = {}

    def fake(params_, render_image_, pd_, **kw):
        called["hit"] = True
        return rl.Emitters([[0.0, 1.8, 0.0]], [0.2], [[1.0, 1.0, 1.0]])

    monkeypatch.setattr(rl, "find_emitters_from_model", fake)
    res = rl.run_relight(params, cfg, node, str(tmp_path / "out"),
                         data_root=str(root), indices=[0], spp=1,
                         n_emitters=1, chunk=256, vis_steps=4,
                         fused=False)
    assert called.get("hit")
    assert res["emitters"] == 1


@pytest.mark.slow
def test_trained_light_head_discriminates_fixture(tmp_path):
    """Closed loop: train a light_network model briefly with the
    light-mask loss; the model-head discovery's relative threshold must
    then select pixels strongly enriched in the GT emitter region
    (exact 3D localization needs a full-strength recon — this checks
    the head learned WHERE the light is in mask space)."""
    from i2sdf_tpu.data import ReconData
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step
    from i2sdf_tpu.train.step import make_eval_render_fn

    root = tmp_path / "root"
    generate_synthetic_scene(str(root / "demo"), n_images=4,
                             img_res=(32, 40))
    node, cfg, params = _light_model()
    ds = ReconData("demo", scan_id=0, data_root=str(root), use_depth=True,
                   use_normal=False, use_lightmask=True)
    data = ds.to_device()
    state, tx = create_train_state(params, learning_rate=1e-3,
                                   decay_steps=8000)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          light_mask_weight=0.5)
    step = make_train_step(cfg, tx, batch_size=256)
    w = loss_cfg.dynamic_weights(0)
    key = jax.random.PRNGKey(1)
    for _ in range(2000):
        key, k = jax.random.split(key)
        state, _ = step(state, data, k, w)

    render_image, _ = make_eval_render_fn(cfg, chunk_size=1280,
                                          fused_sampler=False)
    gmax, enrich = 0.0, []
    base_rate = None
    for i in range(ds.n_images):
        uv = jnp.asarray(ds.uv)
        out = render_image(state.params, uv,
                           jnp.asarray(ds.intrinsics_all[i]),
                           jnp.asarray(ds.pose_all[i]))
        lm = np.asarray(out["light_mask"]).reshape(-1)
        gmax = max(gmax, float(lm.max()))
        gt = np.asarray(ds.lightmask_images[i]).reshape(-1) > 0.5
        if gt.any():
            sel = lm > 0.5 * float(lm.max())
            enrich.append((gt[sel].mean(), gt.mean()))
    assert enrich, "no view sees the fixture"
    # selected pixels must be enriched in the GT emitter region far
    # beyond chance in at least one fixture view (measured ~0.4+ hit
    # rate vs ~0.02 base)
    ratios = [hit / max(base, 1e-6) for hit, base in enrich]
    assert max(ratios) > 5, ratios
    assert gmax > 0.05  # the head actually fires somewhere


def test_emission_scale_edit(scene, tmp_path):
    """edit_conf.emission_scale recolors/rescales the light: shading is
    linear in emitter radiance, so doubling it doubles the relit image
    (same seed, no ambient/material stage)."""
    node = CfgNode({
        "train": {"split_n_pixels": 512},
        "dataset": {"data_dir": "demo", "img_res": [20, 24],
                    "downsample": 1},
        "model": dict(TINY_MODEL),
    })
    model_node = node.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    from i2sdf_tpu.eval.relight import _RelightContext

    base = _RelightContext(params, cfg, node, scene, 1, 1.0, 2, 4,
                           False, None)
    edited = _RelightContext(params, cfg, node, scene, 1, 1.0, 2, 4,
                             False, None,
                             edit_conf={"emission_scale": [1.0, 2.0, 0.5]})
    np.testing.assert_allclose(
        np.asarray(edited.emitters.radiance),
        np.asarray(base.emitters.radiance) * np.asarray([[1.0, 2.0, 0.5]]),
        rtol=1e-6)
    # and the edited config renders end to end
    res = run_relight(params, cfg, node, str(tmp_path),
                      data_root=scene, indices=[0], spp=2, n_emitters=1,
                      chunk=256, vis_steps=4, fused=False,
                      edit_conf={"emission_scale": 2.0})
    assert np.isfinite(res["images"][0]["mean_radiance"])


def test_run_relight_video_end_to_end(scene, tmp_path):
    """relight_video: interpolated-pose relit flythrough (the
    reference's RelightVideoDataset has no driver; this one does)."""
    from i2sdf_tpu.eval.relight import run_relight_video

    node = CfgNode({
        "train": {"split_n_pixels": 512},
        "dataset": {"data_dir": "demo", "img_res": [20, 24],
                    "downsample": 1},
        "model": dict(TINY_MODEL),
    })
    model_node = node.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    res = run_relight_video(params, cfg, node, str(tmp_path),
                            data_root=scene, id0=0, id1=2, n_frames=3,
                            spp=2, n_emitters=1, chunk=256, vis_steps=4,
                            fused=False)
    assert res["frames"] == 3
    for i in range(3):
        assert os.path.exists(os.path.join(res["frame_dir"],
                                           f"{i:04d}.png"))
    assert np.isfinite(res["mean_radiance"]).all()


def test_run_relight_full_res_with_downsample_conf(scene, tmp_path):
    """Regression (ADVICE r1): with dataset.downsample set in the conf,
    --full_res used to pass 'downsample' twice into RelightData and
    crash with TypeError. The conf key must always be popped."""
    node = CfgNode({
        "train": {"split_n_pixels": 512},
        "dataset": {"data_dir": "demo", "img_res": [20, 24],
                    "downsample": 2},
        "model": dict(TINY_MODEL),
    })
    model_node = node.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    res = run_relight(params, cfg, node, str(tmp_path),
                      data_root=scene, indices=[0], spp=1,
                      n_emitters=1, chunk=256, vis_steps=4,
                      fused=False, full_res=True)
    assert res["emitters"] == 1
