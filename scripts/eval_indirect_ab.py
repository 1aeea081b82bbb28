"""Indirect-lighting A/B: constant ambient vs one-bounce field irradiance.

VERDICT round-2 #3 evidence. A high-interreflection scene (saturated
red x=-2 wall, GT rendered with true MC one-bounce interreflection —
`data/synth.py::shade(indirect_spp=...)`) is fit by the material stage
twice against ground-truth geometry:

  A) constant learned ambient only (the round-2 approximation) — the
     red bounce light has nowhere to go but the recovered albedo;
  B) with the baked one-bounce irradiance buffer
     (`models/indirect.py::bake_indirect_irradiance`, oracle field =
     the analytic scene radiance) — the bounce is explained by the
     transport, so the albedo should come out neutral where it is
     neutral.

Round-4 upgrade (VERDICT r3 #3 — make the A/B conclusive): the bake and
the GT generator both draw LOW-DISCREPANCY stratified hemisphere sets
(`brdf.cosine_hemisphere_ld` — per-point Cranley–Patterson-rotated
Hammersley) at much higher spp, the whole experiment runs over
AB_SEEDS independent seeds (fit init + shading keys + bake keys), and
the evidence reports mean±std of si-MAE / red-bleed / corr for both
arms plus the bake-to-bake per-point correlation (round 3's smoking
gun: 0.30 at iid spp 64).

Reports albedo corr / scale-invariant MAE for both fits plus the
red-channel bleed bias, writes docs/evidence/indirect_ab.json and a
kd_A | kd_B | GT panel.

Env knobs: AB_STEPS (default 4000), AB_SEEDS (3), AB_RES ("48x64"),
AB_N_IMAGES (4), AB_GT_SPP (128), AB_BAKE_SPP (256), AB_SMOOTH_K (16),
AB_OUT (evidence dir override).
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

    set_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2sdf_tpu.data import generate_synthetic_scene
    from i2sdf_tpu.data.material import MaterialData
    from i2sdf_tpu.data.synth import (_LIGHT_POS, _LIGHT_RADIUS,
                                      direct_irradiance, is_emitter,
                                      scene_albedo, scene_normal,
                                      scene_sdf, sphere_trace)
    from i2sdf_tpu.models.indirect import (bake_indirect_irradiance,
                                           smooth_irradiance)
    from i2sdf_tpu.models.material import (MaterialNetConfig,
                                           ambient_apply, emission_apply,
                                           material_net_apply,
                                           material_net_init, emission_init)
    from i2sdf_tpu.train.material import (MaterialTrainConfig,
                                          make_material_train_step)
    from i2sdf_tpu.train.state import TrainState, make_optimizer
    from i2sdf_tpu.train import artifacts
    from i2sdf_tpu.utils.cameras import get_camera_params

    steps = int(os.environ.get("AB_STEPS", "4000"))
    n_seeds = int(os.environ.get("AB_SEEDS", "3"))
    H, W = (int(x) for x in os.environ.get("AB_RES", "48x64").split("x"))
    n_images = int(os.environ.get("AB_N_IMAGES", "4"))
    gt_spp = int(os.environ.get("AB_GT_SPP", "128"))
    bake_spp = int(os.environ.get("AB_BAKE_SPP", "256"))
    out_dir = os.environ.get(
        "AB_OUT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "evidence"))
    os.makedirs(out_dir, exist_ok=True)

    root = tempfile.mkdtemp(prefix="i2sdf_ind_ab_")
    print(f"[ab] generating red-wall scene with {gt_spp}-spp one-bounce "
          "GT ...", flush=True)
    generate_synthetic_scene(os.path.join(root, "demo"),
                             n_images=n_images, img_res=(H, W),
                             indirect_spp=gt_spp, red_wall=True)
    md = MaterialData("demo", scan_id=0, data_root=root, is_hdr=True)

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
        sel = np.asarray(hit) & (np.asarray(is_emitter(p)) < 0.5)
        view_masks.append((sel, np.asarray(p)))
        flat["points"].append(np.asarray(p)[sel])
        flat["normals"].append(np.asarray(scene_normal(p))[sel])
        flat["view_dirs"].append(np.asarray(-units)[sel])
        flat["rgb"].append(np.asarray(md.rgb_images[i])[sel])
    buffers = {k: jnp.asarray(np.concatenate(v), jnp.float32)
               for k, v in flat.items()}
    alb_gt = np.asarray(scene_albedo(buffers["points"], red_wall=True))
    print(f"[ab] {buffers['points'].shape[0]} surface samples", flush=True)

    centers = jnp.asarray(_LIGHT_POS)[None]
    radii = jnp.asarray([_LIGHT_RADIUS])

    # ORACLE field: the analytic scene's outgoing radiance (albedo x
    # direct irradiance at the secondary hit) — isolates the estimator
    # from reconstruction error. The trained-field path is exercised by
    # tests/test_indirect.py and the MaterialTrainer indirect_spp wiring.
    def oracle_field(points, dirs):
        t, hit = sphere_trace(points, dirs)
        h = points + t[:, None] * dirs
        nh = scene_normal(h)
        rgb = scene_albedo(h, red_wall=True) * direct_irradiance(h, nh)
        return rgb, hit, h

    def fit(e_ind, seed=0):
        mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
        tcfg = MaterialTrainConfig(batch_size=1024, spp=8, vis_steps=16,
                                   learning_rate=5e-3, steps=steps,
                                   smooth_weight=1e-4,
                                   ks_prior_weight=0.02)
        params = {
            "material": material_net_init(
                jax.random.PRNGKey(5 + 1000 * seed), mat_cfg),
            "emission": emission_init(jnp.asarray([[2.0, 2.0, 2.0]])),
        }
        tx = make_optimizer(tcfg.learning_rate, decay_steps=steps)
        step_fn, _, calibrate = make_material_train_step(
            mat_cfg, tcfg, lambda q: scene_sdf(q), centers, radii, tx)
        bufs = dict(buffers)
        if e_ind is not None:
            bufs["e_ind"] = jnp.asarray(e_ind)
        key = jax.random.PRNGKey(9 + 1000 * seed)
        key, k_cal = jax.random.split(key)
        params = calibrate(params, bufs, k_cal)
        state = TrainState(step=jnp.int32(0), params=params,
                           opt_state=tx.init(params))
        t0 = time.time()
        losses = []
        for i in range(steps):
            key, k = jax.random.split(key)
            state, m = step_fn(state, bufs, k)
            losses.append(float(m["rgb_loss"]))
            if (i + 1) % 500 == 0:
                print(f"[ab fit {i + 1}/{steps}] rgb={losses[-1]:.5f}",
                      flush=True)
        dt = time.time() - t0
        kd = np.asarray(material_net_apply(
            state.params["material"], mat_cfg, buffers["points"])["kd"])
        corr = [float(np.corrcoef(kd[:, c], alb_gt[:, c])[0, 1])
                for c in range(3)]
        scale = ((alb_gt * kd).sum(0)
                 / np.maximum((kd * kd).sum(0), 1e-9))
        kd_s = kd * scale[None]
        si_mae = float(np.abs(kd_s - alb_gt).mean())
        # red-bleed bias on NEUTRAL surfaces (GT albedo ~gray): how much
        # extra red over blue the fit painted onto walls that are not red
        neutral = alb_gt[:, 0] - alb_gt[:, 2] < 0.15
        bleed = float((kd_s[neutral, 0] - kd_s[neutral, 2]).mean()
                      - (alb_gt[neutral, 0] - alb_gt[neutral, 2]).mean())
        return {
            "albedo_corr_rgb": [round(c, 3) for c in corr],
            "albedo_si_mae": round(si_mae, 4),
            "red_bleed_bias": round(bleed, 4),
            "rgb_mse_last5": round(float(np.mean(losses[-5:])), 6),
            "steps_per_sec": round(steps / dt, 2),
            "learned_ambient": np.round(np.asarray(ambient_apply(
                state.params["emission"])), 4).tolist(),
            "learned_emission": np.round(np.asarray(emission_apply(
                state.params["emission"])), 3).tolist(),
        }, state, mat_cfg, scale

    smooth_k = int(os.environ.get("AB_SMOOTH_K", "16"))

    def bake(seed):
        e_raw = bake_indirect_irradiance(
            oracle_field, jax.random.PRNGKey(31 + 1000 * seed),
            buffers["points"], buffers["normals"], spp=bake_spp,
            emitter_centers=centers, emitter_radii=radii)
        e_sm = (smooth_irradiance(buffers["points"], buffers["normals"],
                                  e_raw, k=smooth_k)
                if smooth_k > 0 else e_raw)
        return np.asarray(e_raw), np.asarray(e_sm)

    # ---- bake-variance evidence (round 3's smoking gun): per-point
    # correlation of two INDEPENDENT bakes, raw and smoothed. With the
    # LD stratified hemisphere sets this must sit far above 0.30.
    t0 = time.time()
    raw0, sm0 = bake(0)
    raw1, sm1 = bake(1)
    bake_secs = (time.time() - t0) / 2

    def pair_corr(a, b):
        return [float(np.corrcoef(a[:, c], b[:, c])[0, 1])
                for c in range(3)]

    bake_corr_raw = pair_corr(raw0, raw1)
    bake_corr_sm = pair_corr(sm0, sm1)
    print(f"[ab] bake {bake_secs:.1f}s/bake; pair corr raw="
          f"{np.round(bake_corr_raw, 3).tolist()} smoothed="
          f"{np.round(bake_corr_sm, 3).tolist()}", flush=True)

    seeds = list(range(n_seeds))
    runs_a, runs_b = [], []
    bakes = {0: sm0, 1: sm1}
    state_a = state_b = scale_a = scale_b = mat_cfg = None
    for s in seeds:
        print(f"[ab] seed {s}: fit A (constant ambient)", flush=True)
        res_a, st_a, mat_cfg, sc_a = fit(None, seed=s)
        print(json.dumps(res_a), flush=True)
        if s not in bakes:
            bakes[s] = bake(s)[1]
        print(f"[ab] seed {s}: fit B (baked one-bounce)", flush=True)
        res_b, st_b, _, sc_b = fit(bakes[s], seed=s)
        print(json.dumps(res_b), flush=True)
        runs_a.append(res_a)
        runs_b.append(res_b)
        if s == 0:
            state_a, scale_a, state_b, scale_b = st_a, sc_a, st_b, sc_b

    def agg(runs):
        out = {}
        for key_, absolute in (("albedo_si_mae", False),
                               ("red_bleed_bias", False),
                               ("abs_red_bleed", True)):
            src = ("red_bleed_bias" if absolute else key_)
            vals = np.asarray([abs(r[src]) if absolute else r[src]
                               for r in runs], np.float64)
            out[key_ + "_mean"] = round(float(vals.mean()), 4)
            out[key_ + "_std"] = round(float(vals.std()), 4)
        corr_r = np.asarray([r["albedo_corr_rgb"][0] for r in runs])
        out["corr_R_mean"] = round(float(corr_r.mean()), 3)
        out["corr_R_std"] = round(float(corr_r.std()), 3)
        return out

    agg_a, agg_b = agg(runs_a), agg(runs_b)
    res_a, res_b = runs_a[0], runs_b[0]

    # kd_A | kd_B | GT panel, view 0
    sel, pts_full = view_masks[0]
    def kd_img(state, scale):
        img = np.zeros((H * W, 3), np.float32)
        img[sel] = np.asarray(material_net_apply(
            state.params["material"], mat_cfg,
            jnp.asarray(pts_full[sel]))["kd"]) * scale[None]
        return img.reshape(H, W, 3)

    gt_img = np.zeros((H * W, 3), np.float32)
    gt_img[sel] = np.asarray(
        scene_albedo(jnp.asarray(pts_full[sel]), red_wall=True))
    panel = np.concatenate([kd_img(state_a, scale_a),
                            kd_img(state_b, scale_b),
                            gt_img.reshape(H, W, 3)], axis=1)
    png = os.path.join(out_dir, "indirect_ab_albedo.png")
    artifacts.write_rgb(png, np.clip(panel, 0, 1))

    verdict = {
        "si_mae_better": bool(agg_b["albedo_si_mae_mean"]
                              + agg_b["albedo_si_mae_std"]
                              < agg_a["albedo_si_mae_mean"]
                              - agg_a["albedo_si_mae_std"]),
        "red_bleed_better": bool(agg_b["abs_red_bleed_mean"]
                                 + agg_b["abs_red_bleed_std"]
                                 < agg_a["abs_red_bleed_mean"]
                                 - agg_a["abs_red_bleed_std"]),
    }
    verdict["one_bounce_strictly_better"] = (
        verdict["si_mae_better"] and verdict["red_bleed_better"])

    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                cwd=repo, capture_output=True,
                                text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    result = {
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]), "commit": commit,
        "steps": steps, "n_seeds": n_seeds,
        "gt_spp": gt_spp, "bake_spp": bake_spp,
        "sampler": "cosine_hemisphere_ld (Hammersley + per-point "
                   "Cranley-Patterson rotation)",
        "smooth_k": smooth_k,
        "res": f"{H}x{W}", "n_images": n_images,
        "bake_pair_corr_raw": [round(c, 3) for c in bake_corr_raw],
        "bake_pair_corr_smoothed": [round(c, 3) for c in bake_corr_sm],
        "constant_ambient_mean_std": agg_a,
        "one_bounce_mean_std": agg_b,
        "verdict": verdict,
        "constant_ambient_runs": runs_a,
        "one_bounce_runs": runs_b,
        "panel_png": os.path.relpath(png),
    }
    with open(os.path.join(out_dir, "indirect_ab.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("platform", "bake_pair_corr_raw",
                       "constant_ambient_mean_std", "one_bounce_mean_std",
                       "verdict")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
