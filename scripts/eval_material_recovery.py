"""Material-stage recovery evidence on the analytic demo scene.

Trains the material stage against GROUND-TRUTH geometry (the analytic
SDF of `data/synth.py` provides both the surface bake and the
visibility march), then scores the learned albedo field against the
generator's `scene_albedo` — the intrinsic-decomposition quality
measurement the reference never shipped (its editing branch is
unreleased).

Writes:
  docs/evidence/material_recovery.json        (metrics, one object)
  docs/evidence/material_recovery_albedo.png  (learned kd | GT albedo,
                                               view 0)

Env knobs: REC_STEPS (default 8000), REC_LR (5e-3), REC_RES ("48x64"),
REC_N_IMAGES (4), REC_OUT (evidence dir override).
"""

from __future__ import annotations

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
    import jax.numpy as jnp
    import numpy as np

    from i2sdf_tpu.data import generate_synthetic_scene
    from i2sdf_tpu.data.material import MaterialData
    from i2sdf_tpu.data.synth import (_LIGHT_POS, _LIGHT_RADIUS,
                                      is_emitter, scene_albedo,
                                      scene_normal, scene_sdf,
                                      sphere_trace)
    from i2sdf_tpu.models.material import (MaterialNetConfig,
                                           ambient_apply, emission_apply,
                                           emission_init,
                                           material_net_apply,
                                           material_net_init)
    from i2sdf_tpu.train.material import (MaterialTrainConfig,
                                          make_material_train_step)
    from i2sdf_tpu.train.state import TrainState, make_optimizer
    from i2sdf_tpu.train import artifacts

    # 8000: the HDR fit's emission/ambient separation converges slowly
    # (emission was still climbing at 2000 steps: 92 -> 132 of 110)
    steps = int(os.environ.get("REC_STEPS", "8000"))
    lr = float(os.environ.get("REC_LR", "5e-3"))
    H, W = (int(x) for x in os.environ.get("REC_RES", "48x64").split("x"))
    n_images = int(os.environ.get("REC_N_IMAGES", "4"))
    out_dir = os.environ.get(
        "REC_OUT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "evidence"))
    os.makedirs(out_dir, exist_ok=True)

    # REC_CHROMA=1 (default): per-wall hues + two-channel checker so all
    # three albedo channels carry variance and per-channel correlation
    # is interpretable (VERDICT r4 weak #7). 0 reproduces the legacy
    # near-neutral scene of the round-2/3 evidence.
    chroma = os.environ.get("REC_CHROMA", "1") == "1"
    root = tempfile.mkdtemp(prefix="i2sdf_mat_rec_")
    generate_synthetic_scene(os.path.join(root, "demo"),
                             n_images=n_images, img_res=(H, W),
                             chroma=chroma)
    # fit in linear radiometric units (hdr/): LDR clipping near the
    # radiance-110 fixture otherwise biases emission/albedo low
    md = MaterialData("demo", scan_id=0, data_root=root, is_hdr=True)

    from i2sdf_tpu.utils.cameras import get_camera_params

    flat = {k: [] for k in ("points", "normals", "view_dirs", "rgb")}
    view_masks = []
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
        view_masks.append((sel, np.asarray(p)))
        flat["points"].append(np.asarray(p)[sel])
        flat["normals"].append(np.asarray(scene_normal(p))[sel])
        flat["view_dirs"].append(np.asarray(-units)[sel])
        flat["rgb"].append(np.asarray(md.rgb_images[i])[sel])
    buffers = {k: jnp.asarray(np.concatenate(v), jnp.float32)
               for k, v in flat.items()}
    alb_gt = np.asarray(scene_albedo(buffers["points"], chroma=chroma))

    mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
    tcfg = MaterialTrainConfig(batch_size=1024, spp=8, vis_steps=16,
                               learning_rate=lr, steps=steps,
                               smooth_weight=1e-4, ks_prior_weight=0.02)
    params = {
        "material": material_net_init(jax.random.PRNGKey(5), mat_cfg),
        "emission": emission_init(jnp.asarray([[2.0, 2.0, 2.0]])),
    }
    tx = make_optimizer(lr, decay_steps=steps)
    centers = jnp.asarray(_LIGHT_POS)[None]
    radii = jnp.asarray([_LIGHT_RADIUS])
    step_fn, _, calibrate = make_material_train_step(
        mat_cfg, tcfg, lambda p: scene_sdf(p), centers, radii, tx)
    key = jax.random.PRNGKey(9)
    key, k_cal = jax.random.split(key)
    params = calibrate(params, buffers, k_cal)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))

    t0 = time.time()
    losses = []
    for i in range(steps):
        key, k = jax.random.split(key)
        state, m = step_fn(state, buffers, k)
        losses.append(float(m["rgb_loss"]))
        if (i + 1) % 200 == 0:
            print(f"[recovery {i + 1}/{steps}] rgb={losses[-1]:.5f}",
                  flush=True)
    dt = time.time() - t0

    kd = np.asarray(material_net_apply(
        state.params["material"], mat_cfg, buffers["points"])["kd"])
    corr = [float(np.corrcoef(kd[:, c], alb_gt[:, c])[0, 1])
            for c in range(3)]
    # scale-invariant albedo error: per-channel least-squares scale
    scale = (alb_gt * kd).sum(0) / np.maximum((kd * kd).sum(0), 1e-9)
    si_mae = float(np.abs(kd * scale[None] - alb_gt).mean())
    si_mae_rgb = [float(np.abs(kd[:, c] * scale[c] - alb_gt[:, c]).mean())
                  for c in range(3)]
    gt_std_rgb = [float(alb_gt[:, c].std()) for c in range(3)]

    # learned-kd | GT-albedo panel for view 0
    sel, pts_full = view_masks[0]
    kd_img = np.zeros((H * W, 3), np.float32)
    kd_img[sel] = np.asarray(material_net_apply(
        state.params["material"], mat_cfg,
        jnp.asarray(pts_full[sel]))["kd"]) * scale[None]
    gt_img = np.zeros((H * W, 3), np.float32)
    gt_img[sel] = np.asarray(scene_albedo(jnp.asarray(pts_full[sel]),
                                          chroma=chroma))
    panel = np.concatenate([kd_img.reshape(H, W, 3),
                            gt_img.reshape(H, W, 3)], axis=1)
    png = os.path.join(out_dir, "material_recovery_albedo.png")
    artifacts.write_rgb(png, np.clip(panel, 0, 1))

    result = {
        "platform": jax.default_backend(),
        "steps": steps,
        "steps_per_sec": round(steps / dt, 2),
        "rgb_mse_last5": round(float(np.mean(losses[-5:])), 6),
        "scene": "chroma" if chroma else "legacy (near-neutral G/B)",
        "albedo_corr_rgb": [round(c, 3) for c in corr],
        "albedo_si_mae": round(si_mae, 4),
        "albedo_si_mae_rgb": [round(m, 4) for m in si_mae_rgb],
        "albedo_gt_std_rgb": [round(s, 4) for s in gt_std_rgb],
        "learned_emission": np.round(np.asarray(
            emission_apply(state.params["emission"])), 3).tolist(),
        "learned_ambient": np.round(np.asarray(
            ambient_apply(state.params["emission"])), 3).tolist(),
        "panel_png": os.path.relpath(png),
    }
    with open(os.path.join(out_dir, "material_recovery.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
