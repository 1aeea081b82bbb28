"""Material-optimization stage (models/material.py + train/material.py):
the trainable intrinsic-decomposition branch the reference scaffolds but
never released (`/root/reference/README.md:77-79`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.config import CfgNode
from i2sdf_tpu.data import generate_synthetic_scene
from i2sdf_tpu.models import renderer
from i2sdf_tpu.models.material import (MaterialNetConfig, emission_apply,
                                       emission_init, material_net_apply,
                                       material_net_init)
from i2sdf_tpu.models.rendering_layer import RenderingLayerConfig, shade
from i2sdf_tpu.train.material import (MaterialTrainConfig, MaterialTrainer,
                                      make_material_train_step)
from i2sdf_tpu.train.state import create_train_state


def empty_sdf(p):
    """Nothing to occlude: visibility is always 1."""
    return jnp.full(p.shape[:1], 10.0)


@pytest.mark.slow
def test_two_emitter_emission_chroma_recovery(tmp_path):
    """Closed loop on a TWO_LIGHTS scene: with mask-DISCOVERED emitters
    and analytic geometry, the per-emitter learnable emission must
    recover each fixture's chroma — warm (R>B) for the ceiling light,
    cool (B>R) for the sconce — from shading alone (emitter pixels are
    excluded from the fit; LDR pixel inits are clipped white)."""
    import jax.numpy as jnp

    from i2sdf_tpu.data import ReconData, generate_synthetic_scene
    from i2sdf_tpu.data.synth import (TWO_LIGHTS, is_emitter, scene_normal,
                                      scene_sdf, sphere_trace)
    from i2sdf_tpu.data.material import MaterialData
    from i2sdf_tpu.eval.relight import find_emitters
    from i2sdf_tpu.models.material import (MaterialNetConfig,
                                           emission_apply, emission_init,
                                           material_net_init)
    from i2sdf_tpu.train.material import (MaterialTrainConfig,
                                          make_material_train_step)
    from i2sdf_tpu.train.state import TrainState, make_optimizer
    from i2sdf_tpu.utils.cameras import get_camera_params

    root = tmp_path / "root"
    generate_synthetic_scene(str(root / "demo"), n_images=8,
                             img_res=(36, 48), lights=TWO_LIGHTS)
    rd = ReconData("demo", scan_id=0, data_root=str(root), use_depth=True,
                   use_lightmask=True)
    em = find_emitters(rd, n_emitters=2)

    md = MaterialData("demo", scan_id=0, data_root=str(root), is_hdr=True)
    flat = {k: [] for k in ("points", "normals", "view_dirs", "rgb")}
    for i in range(md.n_images):
        uv = jnp.asarray(md.uv)
        ray_dirs, cam_loc = get_camera_params(
            uv[None], jnp.asarray(md.pose_all[i])[None],
            jnp.asarray(md.intrinsics_all[i])[None])
        units = ray_dirs[0] / jnp.linalg.norm(ray_dirs[0], axis=-1,
                                              keepdims=True)
        cams = jnp.broadcast_to(cam_loc[0], units.shape)
        t, hit = sphere_trace(cams, units, lights=TWO_LIGHTS)
        p = cams + t[:, None] * units
        sel = np.asarray(hit) & (np.asarray(
            is_emitter(p, TWO_LIGHTS)) < 0.5)
        flat["points"].append(np.asarray(p)[sel])
        flat["normals"].append(np.asarray(
            scene_normal(p, TWO_LIGHTS))[sel])
        flat["view_dirs"].append(np.asarray(-units)[sel])
        flat["rgb"].append(np.asarray(md.rgb_images[i])[sel])
    buffers = {k: jnp.asarray(np.concatenate(v), jnp.float32)
               for k, v in flat.items()}

    mat_cfg = MaterialNetConfig(dims=(64,) * 3, multires=4)
    tcfg = MaterialTrainConfig(batch_size=1024, spp=8, vis_steps=12,
                               learning_rate=5e-3, steps=2000,
                               smooth_weight=1e-4)
    params = {
        "material": material_net_init(jax.random.PRNGKey(5), mat_cfg),
        "emission": emission_init(em.radiance),
    }
    tx = make_optimizer(5e-3, decay_steps=2000)
    step_fn, _, calibrate = make_material_train_step(
        mat_cfg, tcfg, lambda p: scene_sdf(p, TWO_LIGHTS),
        em.centers, em.radii, tx)
    key = jax.random.PRNGKey(9)
    key, k_cal = jax.random.split(key)
    params = calibrate(params, buffers, k_cal)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))
    for _ in range(2000):
        key, k = jax.random.split(key)
        state, _ = step_fn(state, buffers, k)

    learned = np.asarray(emission_apply(state.params["emission"]))
    centers = np.asarray(em.centers)
    gts = np.stack([np.asarray(pos) for pos, _, _ in TWO_LIGHTS])
    which = np.linalg.norm(centers[:, None] - gts[None], axis=-1).argmin(1)
    assert set(which.tolist()) == {0, 1}, \
        f"clusters did not match distinct fixtures: {centers}"
    ceil_rgb = learned[list(which).index(0)]
    sconce_rgb = learned[list(which).index(1)]
    # ceiling fixture is warm (true 110/100/90), sconce cool (35/60/110)
    assert ceil_rgb[0] > ceil_rgb[2], ceil_rgb
    assert sconce_rgb[2] > sconce_rgb[0], sconce_rgb
    assert np.isfinite(learned).all() and (learned > 0).all()


def test_project_to_surface_reduces_sdf():
    """Newton projection must pull points (far) closer to the zero
    level-set of the implicit net."""
    from i2sdf_tpu.models import mlp
    from i2sdf_tpu.train.material import project_to_surface

    icfg = mlp.ImplicitNetConfig(
        feature_vector_size=16, sdf_bounding_sphere=4.0, d_in=3,
        dims=(32, 32, 32), skip_in=(1,), geometric_init=True, bias=0.6,
        embed_type="positional", multires=2)
    params = mlp.implicit_net_init(jax.random.PRNGKey(0), icfg)
    # geometric init ~ sphere of radius `bias`: points near it project
    # onto it
    pts = jax.random.normal(jax.random.PRNGKey(1), (300, 3)) * 0.8
    before = np.abs(np.asarray(mlp.sdf_vals(params, icfg, pts)[:, 0]))
    proj = project_to_surface(params, icfg, pts, chunk=128)
    after = np.abs(np.asarray(mlp.sdf_vals(params, icfg, proj)[:, 0]))
    assert proj.shape == pts.shape
    assert np.isfinite(np.asarray(proj)).all()
    assert after.mean() < 0.2 * before.mean()
    assert np.median(after) < 1e-3


def test_material_net_shapes_and_ranges():
    cfg = MaterialNetConfig(dims=(32, 32), multires=2)
    params = material_net_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 3))
    out = material_net_apply(params, cfg, x)
    assert out["kd"].shape == (17, 3)
    assert out["ks"].shape == (17, 3)
    assert out["rough"].shape == (17,)
    assert float(out["kd"].min()) >= 0.0 and float(out["kd"].max()) <= 1.0
    assert float(out["rough"].min()) >= cfg.min_roughness
    assert float(out["rough"].max()) <= 1.0


def test_emission_log_parameterization():
    rad = jnp.asarray([[2.0, 0.5, 0.001]])
    p = emission_init(rad)
    np.testing.assert_allclose(np.asarray(emission_apply(p)),
                               [[2.0, 0.5, 0.001]], rtol=1e-5)
    # positivity even after a large negative update
    p2 = {"log_radiance": p["log_radiance"] - 10.0}
    assert float(emission_apply(p2).min()) > 0.0


def test_detach_sampling_keeps_grads_finite():
    """With detach_sampling the material gradient flows only through
    the BRDF value, not the 1/pdf weights (grazing-sample blowups)."""
    cfg = RenderingLayerConfig(spp=4, detach_sampling=True)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
    v = n
    pts = jnp.zeros((8, 3))

    def li(p, d):
        return jnp.ones_like(p)

    def loss(kd, ks, rough):
        out = shade(cfg, jax.random.PRNGKey(0), pts, n, v, kd, ks, rough,
                    li)
        return (out["color_diffuse"] + out["color_specular"]).sum()

    kd = jnp.full((8, 3), 0.5)
    ks = jnp.full((8, 3), 0.04)
    rough = jnp.full((8,), 0.05)  # near-specular: worst case for 1/pdf
    grads = jax.grad(loss, argnums=(0, 1, 2))(kd, ks, rough)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_train_step_recovers_material_product():
    """End-to-end gradient check on analytic geometry: points on a
    plane lit by one sphere emitter, GT rendered with known kd — after
    optimization the re-render matches and the kd*emission product is
    recovered (kd and emission individually have a scale ambiguity)."""
    key = jax.random.PRNGKey(0)
    # each surface point observed from several view directions (as in
    # real multi-view training) — one observation per point would leave
    # diffuse kd vs specular ks fundamentally unidentifiable
    n_base, n_views = 128, 4
    n_pts = n_base * n_views
    k1, k2, key = jax.random.split(key, 3)
    xy = jax.random.uniform(k1, (n_base, 2), minval=-1.0, maxval=1.0)
    base = jnp.concatenate([xy, jnp.zeros((n_base, 1))], -1)  # z=0 plane
    pts = jnp.repeat(base, n_views, axis=0)
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_pts, 1))
    view = jax.random.normal(k2, (n_pts, 3))
    view = view.at[:, 2].set(jnp.abs(view[:, 2]) + 0.4)  # up-hemisphere
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)

    # a large nearby emitter (sin^2(half-angle) ~ 0.64 of the cosine-
    # weighted hemisphere) keeps the MC gradient signal-dominated
    centers = jnp.asarray([[0.0, 0.0, 1.5]])
    radii = jnp.asarray([1.2])
    true_rad = jnp.asarray([[2.0, 2.0, 2.0]])
    true_kd = jnp.asarray([0.6, 0.3, 0.2])

    from i2sdf_tpu.eval.relight import incident_radiance

    def li(p, d):
        return incident_radiance(empty_sdf, centers, radii, true_rad,
                                 p, d, n_steps=4)

    gt_cfg = RenderingLayerConfig(spp=256)
    kd_gt = jnp.tile(true_kd[None], (n_pts, 1))
    ks_gt = jnp.full((n_pts, 3), 0.04)
    rough_gt = jnp.full((n_pts,), 0.7)
    out = shade(gt_cfg, jax.random.PRNGKey(42), pts, normals, view,
                kd_gt, ks_gt, rough_gt, li)
    gt = out["color_diffuse"] + out["color_specular"]

    mat_cfg = MaterialNetConfig(dims=(32, 32), multires=2)
    tcfg = MaterialTrainConfig(batch_size=256, spp=16, vis_steps=4,
                               smooth_weight=1e-3, learning_rate=1e-2,
                               steps=500, ks_prior_weight=0.05)
    params = {
        "material": material_net_init(jax.random.PRNGKey(7), mat_cfg),
        "emission": emission_init(true_rad),
    }
    state, tx = create_train_state(params, learning_rate=tcfg.learning_rate,
                                   decay_steps=tcfg.steps)
    step, predict, _ = make_material_train_step(mat_cfg, tcfg, empty_sdf,
                                                centers, radii, tx)
    buffers = {"points": pts, "normals": normals, "view_dirs": view,
               "rgb": gt}
    first = None
    for i in range(tcfg.steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, buffers, k)
        if first is None:
            first = float(metrics["rgb_loss"])
    final = float(metrics["rgb_loss"])
    assert final < 0.2 * first, (first, final)

    # the learned field times learned emission must reproduce the true
    # product (per-channel), even if each factor drifts individually
    mats = material_net_apply(state.params["material"], mat_cfg, base)
    learned_rad = emission_apply(state.params["emission"])[0]
    prod = np.asarray(mats["kd"]).mean(0) * np.asarray(learned_rad)
    true_prod = np.asarray(true_kd) * np.asarray(true_rad[0])
    np.testing.assert_allclose(prod, true_prod, rtol=0.2)
    # the dielectric prior must pull ks back to the true 0.04 (without
    # it the optimizer parks diffuse energy in a rough specular lobe)
    np.testing.assert_allclose(np.asarray(mats["ks"]).mean(0), 0.04,
                               atol=0.05)

    # re-render PSNR against GT, averaged over fresh keys (a single
    # spp=16 estimate sits at the MC noise floor ~19 dB)
    preds = []
    for _ in range(4):
        key, k = jax.random.split(key)
        preds.append(predict(state.params, k, pts, normals, view)[0])
    pred = jnp.stack(preds).mean(0)
    mse = float(jnp.mean((pred - gt) ** 2))
    assert -10.0 * np.log10(max(mse, 1e-12)) > 22.0, mse


@pytest.mark.multidevice
def test_material_step_dp_equivalence():
    """The sharded material step (batch over the 8-device 'data' axis)
    must match the unsharded step numerically — same DP guarantee the
    reconstruction step has (tests/test_parallel.py)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    from i2sdf_tpu.parallel import make_mesh, replicate_params

    key = jax.random.PRNGKey(3)
    k1, k2, k3, key = jax.random.split(key, 4)
    n = 512
    pts = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    view = jax.random.normal(k2, (n, 3))
    view = view.at[:, 2].set(jnp.abs(view[:, 2]) + 0.4)
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)
    gt = jax.random.uniform(k3, (n, 3))
    buffers = {"points": pts, "normals": normals, "view_dirs": view,
               "rgb": gt}
    centers = jnp.asarray([[0.0, 0.0, 2.0]])
    radii = jnp.asarray([1.0])

    mat_cfg = MaterialNetConfig(dims=(16, 16), multires=2)
    tcfg = MaterialTrainConfig(batch_size=64, spp=2, vis_steps=4)
    params0 = {
        "material": material_net_init(jax.random.PRNGKey(7), mat_cfg),
        "emission": emission_init(jnp.ones((1, 3))),
    }

    results = []
    for mesh in (None, make_mesh(8)):
        params = (params0 if mesh is None
                  else replicate_params(mesh, params0))
        bufs = (buffers if mesh is None
                else replicate_params(mesh, buffers))
        state, tx = create_train_state(params, learning_rate=1e-3,
                                       decay_steps=100)
        step, _, _ = make_material_train_step(mat_cfg, tcfg, empty_sdf,
                                              centers, radii, tx,
                                              mesh=mesh)
        k = jax.random.PRNGKey(11)
        for _ in range(3):
            k, ks = jax.random.split(k)
            state, metrics = step(state, bufs, ks)
        results.append((jax.tree.map(np.asarray, state.params),
                        float(metrics["loss"])))

    (p_single, l_single), (p_mesh, l_mesh) = results
    assert abs(l_single - l_mesh) < 1e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
        p_single, p_mesh)


@pytest.mark.slow  # 4 independent train-step traces (~40 s compile)
def test_relative_mse_pow_weighting():
    """`relative_mse_pow` (round 4, ks-identifiability estimator fix):
    pow=0 must reproduce the UNWEIGHTED loss exactly (w == 1), pow
    must actually enter the data term, and the knob must ride the
    generic from_cfgnode plumbing."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    n = 256
    pts = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    view = jax.random.normal(k2, (n, 3))
    view = view.at[:, 2].set(jnp.abs(view[:, 2]) + 0.4)
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)
    # HDR-ish spread so the relative weight is far from constant
    gt = jax.random.uniform(k3, (n, 3)) * jnp.asarray([8.0, 1.0, 0.1])
    buffers = {"points": pts, "normals": normals, "view_dirs": view,
               "rgb": gt}
    centers = jnp.asarray([[0.0, 0.0, 2.0]])
    radii = jnp.asarray([1.0])
    mat_cfg = MaterialNetConfig(dims=(16, 16), multires=2)
    params = {
        "material": material_net_init(jax.random.PRNGKey(7), mat_cfg),
        "emission": emission_init(jnp.ones((1, 3))),
    }

    def total_loss_for(**kw):
        # The `loss` metric carries the weighted data term (the
        # `rgb_loss` metric is deliberately the unweighted diagnostic
        # MSE of the mean prediction, identical across weightings).
        tcfg = MaterialTrainConfig(batch_size=64, spp=2, vis_steps=4,
                                   **kw)
        state, tx = create_train_state(params, learning_rate=1e-3,
                                       decay_steps=100)
        step, _, _ = make_material_train_step(mat_cfg, tcfg, empty_sdf,
                                              centers, radii, tx)
        _, metrics = step(state, buffers, jax.random.PRNGKey(11))
        return float(metrics["loss"])

    unweighted = total_loss_for(relative_mse=False)
    pow0 = total_loss_for(relative_mse=True, relative_mse_pow=0.0)
    pow1 = total_loss_for(relative_mse=True, relative_mse_pow=1.0)
    pow2 = total_loss_for(relative_mse=True)  # default stays 2.0
    np.testing.assert_allclose(pow0, unweighted, rtol=1e-6)
    assert abs(pow1 - pow2) > 1e-8 and abs(pow1 - pow0) > 1e-8

    node = CfgNode({"relative_mse_pow": 1.0})
    assert MaterialTrainConfig.from_cfgnode(node).relative_mse_pow == 1.0


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
    root = tmp_path_factory.mktemp("material_scene")
    generate_synthetic_scene(str(root / "demo"), n_images=3,
                             img_res=(20, 24))
    return str(root)


@pytest.mark.slow
def test_material_trainer_end_to_end(scene, tmp_path):
    conf = CfgNode({
        "train": {"split_n_pixels": 512},
        "plot": {"plot_nimgs": 1, "grid_boundary": [-2.2, 2.2]},
        "dataset": {"data_dir": "demo", "img_res": [20, 24],
                    "downsample": 1},
        "model": dict(TINY_MODEL),
        "material": {
            "steps": 6, "batch_size": 64, "spp": 2, "vis_steps": 4,
            "n_emitters": 1, "plot_freq": 5, "checkpoint_freq": 5,
            "min_weight_sum": 0.05,
            "material_network": {"dims": [16, 16], "multires": 2},
        },
    })
    model_node = conf.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)

    mt = MaterialTrainer(conf, str(tmp_path), recon_params=params,
                         model_cfg=cfg, data_root=scene, fused=False)
    assert mt.emitters.count == 1
    assert int(mt.buffers["points"].shape[0]) > 0
    state = mt.fit(max_steps=6)
    assert int(state.step) == 6

    plots = os.listdir(mt.plot_dir)
    assert any(f.startswith("kd_") for f in plots)
    assert any(f.startswith("rough_") for f in plots)
    assert any(f.startswith("render_") for f in plots)
    assert mt.ckpt.latest_step() == 6
    # the emission parameters must be finite and positive after training
    emission = np.asarray(emission_apply(state.params["emission"]))
    assert np.isfinite(emission).all() and (emission > 0).all()

    # restore the stage and drive relight off the LEARNED materials —
    # the full recon -> material -> edit pipeline
    from i2sdf_tpu.eval.relight import run_relight
    from i2sdf_tpu.train.material import load_material_stage

    material = load_material_stage(str(tmp_path), conf)
    assert material[2].count == 1
    res = run_relight(params, cfg, conf, str(tmp_path), data_root=scene,
                      indices=[0], spp=2, chunk=256, vis_steps=4,
                      fused=False, material=material)
    assert res["emitters"] == 1
    out = os.path.join(str(tmp_path), "eval", "relight")
    assert os.path.exists(os.path.join(out, "0000_relit.png"))

    # resume: a fresh trainer restores step 6 and continues to a global
    # target of 8 (fit treats max_steps as the global step target)
    mt2 = MaterialTrainer(conf, str(tmp_path), recon_params=params,
                          model_cfg=cfg, data_root=scene, fused=False)
    assert mt2.resume() == 6
    state2 = mt2.fit(max_steps=8)
    assert int(state2.step) == 8

    # mesh export with the learned albedo baked as vertex colors
    from i2sdf_tpu.eval.mesh import run_mesh_eval

    ply = run_mesh_eval(params, cfg, conf, str(tmp_path),
                        data_root=scene, resolution=48, fused=False,
                        material=material)
    assert ply is not None
    with open(ply, "rb") as f:
        head = f.read(400).decode("ascii", "ignore")
    assert "property uchar red" in head
    from i2sdf_tpu.eval import mesh_io

    verts, tris = mesh_io.read_ply(ply)  # reader handles color props
    assert len(verts) > 0 and len(tris) > 0
    assert np.isfinite(verts).all()


@pytest.mark.slow
def test_demo_editing_script(tmp_path):
    """The full editing-pipeline demo (recon -> material -> edited
    relight) must run end to end and write its panel."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=repo)
    out = str(tmp_path / "edit_demo")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "demo_editing.py"),
         "--recon_steps", "30", "--material_steps", "4", "--out", out],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "[edit-demo] OK" in proc.stdout
    assert os.path.exists(os.path.join(out, "editing_panel.png"))


def test_write_ply_colors_roundtrip(tmp_path):
    from i2sdf_tpu.eval import mesh_io

    verts = np.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                        [0.0, 1.0, 0.0]], np.float32)
    tris = np.asarray([[0, 1, 2]], np.int32)
    colors = np.asarray([[1.0, 0.0, 0.5], [0.0, 1.0, 0.0],
                         [0.2, 0.2, 0.2]], np.float32)
    p = str(tmp_path / "colored.ply")
    mesh_io.write_ply(p, verts, tris, colors=colors)
    v2, t2 = mesh_io.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)


@pytest.mark.slow
def test_train_step_indirect_irradiance_buffer():
    """One-bounce indirect (VERDICT r2 #3): GT shaded with a spatially
    VARYING indirect irradiance on top of emitter direct light. The
    learnable constant ambient cannot represent the variation, so the
    constant-ambient fit (A) must bias kd where the indirect light is
    strong; supplying the baked `e_ind` buffer (B) restores the true
    albedo. Asserts B's kd error is well below A's."""
    key = jax.random.PRNGKey(3)
    n_base, n_views = 128, 4
    n_pts = n_base * n_views
    k1, k2, key = jax.random.split(key, 3)
    xy = jax.random.uniform(k1, (n_base, 2), minval=-1.0, maxval=1.0)
    base = jnp.concatenate([xy, jnp.zeros((n_base, 1))], -1)
    pts = jnp.repeat(base, n_views, axis=0)
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_pts, 1))
    view = jax.random.normal(k2, (n_pts, 3))
    view = view.at[:, 2].set(jnp.abs(view[:, 2]) + 0.4)
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)

    centers = jnp.asarray([[0.0, 0.0, 1.5]])
    radii = jnp.asarray([1.2])
    true_rad = jnp.asarray([[2.0, 2.0, 2.0]])
    true_kd = jnp.asarray([0.6, 0.3, 0.2])

    # indirect irradiance ramps across x (mean ~0.5 in the red channel):
    # a "red wall on the +x side" color-bleed stand-in
    ramp = (pts[:, 0:1] + 1.0) * 0.5
    e_gt = jnp.concatenate(
        [1.0 * ramp, 0.3 * ramp, 0.1 * ramp], axis=-1)

    from i2sdf_tpu.eval.relight import incident_radiance

    def li(p, d):
        return incident_radiance(empty_sdf, centers, radii, true_rad,
                                 p, d, n_steps=4)

    gt_cfg = RenderingLayerConfig(spp=256)
    kd_gt = jnp.tile(true_kd[None], (n_pts, 1))
    ks_gt = jnp.full((n_pts, 3), 0.04)
    rough_gt = jnp.full((n_pts,), 0.7)
    out = shade(gt_cfg, jax.random.PRNGKey(42), pts, normals, view,
                kd_gt, ks_gt, rough_gt, li)
    gt = out["color_diffuse"] + out["color_specular"] + kd_gt * e_gt

    mat_cfg = MaterialNetConfig(dims=(32, 32), multires=2)
    tcfg = MaterialTrainConfig(batch_size=256, spp=16, vis_steps=4,
                               smooth_weight=1e-3, learning_rate=1e-2,
                               steps=500, ks_prior_weight=0.05,
                               calibrate_emission=False)

    def fit(with_e_ind: bool):
        params = {
            "material": material_net_init(jax.random.PRNGKey(7), mat_cfg),
            "emission": emission_init(true_rad),
        }
        state, tx = create_train_state(
            params, learning_rate=tcfg.learning_rate,
            decay_steps=tcfg.steps)
        step, _, _ = make_material_train_step(mat_cfg, tcfg, empty_sdf,
                                              centers, radii, tx)
        buffers = {"points": pts, "normals": normals, "view_dirs": view,
                   "rgb": gt}
        if with_e_ind:
            buffers["e_ind"] = e_gt
        k = jax.random.PRNGKey(11)
        for _ in range(tcfg.steps):
            k, ks = jax.random.split(k)
            state, metrics = step(state, buffers, k)
        mats = material_net_apply(state.params["material"], mat_cfg, base)
        learned_rad = emission_apply(state.params["emission"])[0]
        prod = np.asarray(mats["kd"]) * np.asarray(learned_rad)[None]
        true_prod = np.asarray(true_kd)[None] * np.asarray(true_rad[0])
        # per-point product error: spatial bias shows up here
        return float(np.abs(prod - true_prod).mean())

    err_b = fit(True)
    err_a = fit(False)
    assert err_b < 0.6 * err_a, (err_a, err_b)
    assert err_b < 0.15, err_b
