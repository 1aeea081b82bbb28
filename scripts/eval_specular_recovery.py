"""Specular (roughness/ks) recovery validation on a glossy scene.

VERDICT round-2 #6: the material stage's roughness and ks channels were
pinned by the dielectric prior and never validated against ground
truth. This script renders GT with a GLOSSY sphere (roughness 0.15,
ks 0.35 — a clear highlight) using the SAME NEE transport the stage
inverts (`models/rendering_layer.py::shade_emitters` at high spp, GT
material fields from `data/synth.py::scene_materials`), fits the
material stage twice —

  A) shipped dielectric prior weight (pulls ks to 0.04 everywhere),
  B) soft prior (10x lower weight),

— and reports roughness/ks correlation and per-object means next to
the albedo metrics. Writes docs/evidence/specular_recovery.json and a
roughness panel.

Env knobs: SPEC_STEPS (default 6000), SPEC_RES ("48x64"),
SPEC_N_IMAGES (8), SPEC_GT_SPP (128), SPEC_OUT (evidence dir override).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2sdf_tpu.data.synth import (_AMBIENT, _LIGHT_POS, _LIGHT_RADIUS,
                                      _LIGHT_RADIANCE, _look_at,
                                      is_emitter, scene_materials,
                                      scene_normal, scene_sdf,
                                      sphere_trace)
    from i2sdf_tpu.eval.relight import sphere_trace_visibility
    from i2sdf_tpu.models.material import (MaterialNetConfig,
                                           ambient_apply, emission_apply,
                                           emission_init,
                                           material_net_apply,
                                           material_net_init)
    from i2sdf_tpu.models.rendering_layer import (RenderingLayerConfig,
                                                  shade_emitters)
    from i2sdf_tpu.train.material import (MaterialTrainConfig,
                                          make_material_train_step)
    from i2sdf_tpu.train.state import TrainState, make_optimizer
    from i2sdf_tpu.train import artifacts

    steps = int(os.environ.get("SPEC_STEPS", "6000"))
    H, W = (int(x) for x in os.environ.get("SPEC_RES", "48x64").split("x"))
    n_images = int(os.environ.get("SPEC_N_IMAGES", "8"))
    gt_spp = int(os.environ.get("SPEC_GT_SPP", "128"))
    out_dir = os.environ.get(
        "SPEC_OUT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "evidence"))
    os.makedirs(out_dir, exist_ok=True)

    centers = jnp.asarray(_LIGHT_POS)[None]
    radii = jnp.asarray([_LIGHT_RADIUS])
    radiance = jnp.asarray(_LIGHT_RADIANCE)[None]

    def vis_fn(pts, dirs, t_max):
        return sphere_trace_visibility(lambda q: scene_sdf(q), pts, dirs,
                                       t_max, n_steps=24)

    # ---- analytic-geometry bake: multi-view surface samples ----------
    focal = 0.8 * W
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    x = (jj.reshape(-1) - W / 2.0) / focal
    y = (ii.reshape(-1) - H / 2.0) / focal
    dirs_cam = np.stack([x, y, np.ones_like(x)], -1).astype(np.float32)

    flat = {k: [] for k in ("points", "normals", "view_dirs")}
    view_masks = []
    for i in range(n_images):
        ang = 2 * np.pi * i / n_images
        eye = np.array([1.2 * np.cos(ang), 0.1 * np.sin(2 * ang),
                        1.2 * np.sin(ang)])
        # aim low, toward the glossy sphere's neighborhood
        target = np.array([0.4 * np.cos(ang + 2.0), -0.7,
                           0.4 * np.sin(ang + 2.0)])
        pose = _look_at(eye, target)
        dw = dirs_cam @ pose[:3, :3].T
        units = jnp.asarray(dw / np.linalg.norm(dw, axis=-1,
                                                keepdims=True))
        cams = jnp.broadcast_to(jnp.asarray(eye, jnp.float32),
                                units.shape)
        t, hit = sphere_trace(cams, units)
        p = cams + t[:, None] * units
        sel = np.asarray(hit) & (np.asarray(is_emitter(p)) < 0.5)
        view_masks.append((sel, np.asarray(p)))
        flat["points"].append(np.asarray(p)[sel])
        flat["normals"].append(np.asarray(scene_normal(p))[sel])
        flat["view_dirs"].append(np.asarray(-units)[sel])
    buffers = {k: jnp.asarray(np.concatenate(v), jnp.float32)
               for k, v in flat.items()}
    n_pts = int(buffers["points"].shape[0])
    print(f"[spec] {n_pts} surface samples over {n_images} views",
          flush=True)

    # ---- GT radiance with GLOSSY materials, same NEE transport -------
    mats_gt = scene_materials(buffers["points"], glossy=True)
    gt_cfg = RenderingLayerConfig(spp=gt_spp)

    @jax.jit
    def render_gt(key, pts, normals, view_dirs, kd, ks, rough):
        out = shade_emitters(gt_cfg, key, pts, normals, view_dirs,
                             kd, ks, rough, centers, radii, radiance,
                             visibility_fn=vis_fn)
        return (out["color_diffuse"] + out["color_specular"]
                + kd * _AMBIENT)

    chunk = 4096
    gt = np.empty((n_pts, 3), np.float32)
    t0 = time.time()
    for s in range(0, n_pts, chunk):
        e = min(s + chunk, n_pts)
        pad = chunk - (e - s)

        def padded(a):
            a = jnp.asarray(np.asarray(a)[s:e], jnp.float32)
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

        o = render_gt(jax.random.fold_in(jax.random.PRNGKey(7), s),
                      padded(buffers["points"]), padded(buffers["normals"]),
                      padded(buffers["view_dirs"]), padded(mats_gt["kd"]),
                      padded(mats_gt["ks"]), padded(mats_gt["rough"]))
        gt[s:e] = np.asarray(o)[: e - s]
    buffers["rgb"] = jnp.asarray(gt)
    print(f"[spec] GT rendered at {gt_spp} spp in {time.time() - t0:.1f}s",
          flush=True)

    rough_gt = np.asarray(mats_gt["rough"])
    ks_gt = np.asarray(mats_gt["ks"])
    kd_gt = np.asarray(mats_gt["kd"])
    on_sphere = rough_gt < 0.5

    def fit(ks_prior_weight):
        mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
        tcfg = MaterialTrainConfig(batch_size=1024, spp=8, vis_steps=16,
                                   learning_rate=5e-3, steps=steps,
                                   smooth_weight=1e-4,
                                   ks_prior_weight=ks_prior_weight)
        params = {
            "material": material_net_init(jax.random.PRNGKey(5), mat_cfg),
            "emission": emission_init(jnp.asarray([[2.0, 2.0, 2.0]])),
        }
        tx = make_optimizer(tcfg.learning_rate, decay_steps=steps)
        step_fn, _, calibrate = make_material_train_step(
            mat_cfg, tcfg, lambda q: scene_sdf(q), centers, radii, tx)
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
            if (i + 1) % 1000 == 0:
                print(f"[spec fit {i + 1}/{steps}] rgb={losses[-1]:.5f}",
                      flush=True)
        dt = time.time() - t0
        mats = material_net_apply(state.params["material"], mat_cfg,
                                  buffers["points"])
        kd = np.asarray(mats["kd"])
        ks = np.asarray(mats["ks"])
        rough = np.asarray(mats["rough"])
        scale = ((kd_gt * kd).sum(0)
                 / np.maximum((kd * kd).sum(0), 1e-9))
        return {
            "ks_prior_weight": ks_prior_weight,
            "albedo_si_mae": round(float(np.abs(
                kd * scale[None] - kd_gt).mean()), 4),
            "rough_corr": round(float(
                np.corrcoef(rough, rough_gt)[0, 1]), 3),
            "ks_corr": round(float(
                np.corrcoef(ks.mean(-1), ks_gt.mean(-1))[0, 1]), 3),
            "rough_sphere_mean": round(float(rough[on_sphere].mean()), 3),
            "rough_walls_mean": round(float(rough[~on_sphere].mean()), 3),
            "ks_sphere_mean": round(float(ks[on_sphere].mean()), 3),
            "ks_walls_mean": round(float(ks[~on_sphere].mean()), 3),
            "gt_rough_sphere": 0.15, "gt_rough_walls": 0.7,
            "gt_ks_sphere": 0.35, "gt_ks_walls": 0.04,
            "rgb_mse_last5": round(float(np.mean(losses[-5:])), 6),
            "steps_per_sec": round(steps / dt, 2),
        }, state, mat_cfg

    print("[spec] fit A: shipped dielectric prior (0.01)", flush=True)
    res_a, state_a, mat_cfg = fit(0.01)
    print(json.dumps(res_a), flush=True)
    print("[spec] fit B: soft prior (0.001)", flush=True)
    res_b, state_b, _ = fit(0.001)
    print(json.dumps(res_b), flush=True)

    # roughness panel: fit A | fit B | GT, view 0
    sel, pts_full = view_masks[0]

    def rough_img(state):
        img = np.zeros((H * W,), np.float32)
        img[sel] = np.asarray(material_net_apply(
            state.params["material"], mat_cfg,
            jnp.asarray(pts_full[sel]))["rough"])
        return img.reshape(H, W)

    gt_img = np.zeros((H * W,), np.float32)
    gt_img[sel] = np.asarray(scene_materials(
        jnp.asarray(pts_full[sel]), glossy=True)["rough"])
    panel = np.concatenate([rough_img(state_a), rough_img(state_b),
                            gt_img.reshape(H, W)], axis=1)
    png = os.path.join(out_dir, "specular_recovery_rough.png")
    artifacts.write_colormap(png, panel)

    result = {
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "steps": steps, "gt_spp": gt_spp, "res": f"{H}x{W}",
        "n_images": n_images,
        "hard_prior": res_a,
        "soft_prior": res_b,
        "panel_png": os.path.relpath(png),
    }
    with open(os.path.join(out_dir, "specular_recovery.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("platform", "hard_prior", "soft_prior")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
