"""Specular (roughness/ks) recovery validation on a glossy scene.

VERDICT round-2 #6 introduced this check; round-3 found roughness
recovers (corr 0.97 with the soft prior) but ks does not (corr 0.16):
the specular AMPLITUDE was unconstrained by the 8-orbit single-light
capture. VERDICT round-3 #4 asks to make ks identifiable — grazing
views and/or a second light — or document the negative result.

Round-4 design (SPEC_CAPTURE=r4, the default):

  * TWO emitters (`data/synth.py::TWO_LIGHTS` — warm ceiling + cool
    sconce), so highlights land on two different regions of the glossy
    sphere and specular/diffuse chroma decouple;
  * highlight-aimed views: for each light, a camera placed on the
    sphere-center -> light axis, where the sphere point facing the
    light reflects the camera back onto the light (near-normal
    incidence, Fresnel F ~= ks — the configuration that pins amplitude);
  * grazing wall/floor views (Fresnel rise toward 1 at grazing pins
    ks against kd on the rough walls).

Besides the fits the script measures IDENTIFIABILITY directly,
independent of any estimator: the trainer's own relative-MSE between
the GT image set and a re-render with GT kd/roughness but ks scaled by
s in {0, 0.5, 1, 1.5, 2}, rendered with COMMON RANDOM NUMBERS (same
keys as the GT — otherwise the specular MC variance grows ~s^2 and
drags the curve minimum below 1 regardless of the data). The curve is
reported next to the independent-rerender "noise_floor";
ks_half_over_noise >> 1 means the DATA pins ks (any recovery failure is
then the estimator's fault), ~1 means the capture genuinely does not
constrain it. Also reports "spec_coverage": the fraction of surface
samples whose GT specular luminance exceeds 5% of their diffuse+ambient
luminance.

Legacy capture reproducible with SPEC_CAPTURE=r3 (8 orbit views, one
light — the round-3 evidence configuration).

Round-4 estimator resolution (docs/evidence/specular_estimator_sweep.json,
three TPU sweeps via SPEC_SWEEP): the round-3 ks failure (corr 0.16-0.38)
had two stacked causes. (1) At 48x64 the rough-0.15 highlight subtends
~1px, so its WIDTH is unresolved and (ks up, rough down) moves along a
loss ridge — aggressive data weighting (pow 0-1, spp 16) then reaches
ks_corr 0.88-1.0 only by saturating sphere ks to ~0.9 with rough
collapsed to 0.04 (corr-flattering, not recovery). (2) With the data
term ridge-weakened, the dielectric ks prior (0.001) drags sphere ks
toward 0.04. At 96x128 (highlight resolved) the CLASSICAL relative-L2
(pow 2) already reaches ks_corr 0.795 with every field near GT, and
cutting the prior to 0.0003 frees the amplitude: ks_corr 0.973 with
ks_sphere 0.387 vs GT 0.35 (11%), rough 0.194/0.789 vs GT 0.15/0.7.
Those are the shipped defaults below.

Step-count stability (round 5, VERDICT r4 task 4): the round-4 note
"6000-step fits at prior 1e-3 drift back up the ridge" was measured at
the WRONG prior (1e-3, not the shipped 3e-4) and never at 12000 steps
(ADVICE r4 #4). The stability protocol runs the SHIPPED estimator
(pow 2, prior 3e-4, 96x128) at 3000 (default final fit) + 6000 + 12000
steps on BOTH captures via SPEC_SWEEP="steps=6000;steps=12000", with a
Polyak-averaged readout (SPEC_EMA=0.999) reported alongside the raw
iterate — along a flat (ks, rough) valley the SGD iterate random-walks
while its running average stays put, which is the step-count-stable
estimate. Results in docs/evidence/specular_recovery.json
(estimator_sweep arms per capture).

Env knobs: SPEC_STEPS (default 3000), SPEC_RES ("96x128"),
SPEC_GT_SPP (128), SPEC_CAPTURE ("r4"|"r3"|"both"), SPEC_PRIOR
(0.0003), SPEC_OUT, SPEC_SWEEP (see parse_sweep), SPEC_EMA.
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

    from i2sdf_tpu.data.synth import (_AMBIENT, DEFAULT_LIGHTS, TWO_LIGHTS,
                                      _look_at, is_emitter, scene_materials,
                                      scene_normal, scene_sdf, sphere_trace)
    from i2sdf_tpu.eval.relight import sphere_trace_visibility
    from i2sdf_tpu.models.material import (MaterialNetConfig,
                                           emission_init,
                                           material_net_apply,
                                           material_net_init)
    from i2sdf_tpu.models.rendering_layer import (RenderingLayerConfig,
                                                  shade_emitters)
    from i2sdf_tpu.train.material import (MaterialTrainConfig,
                                          make_material_train_step)
    from i2sdf_tpu.train.state import TrainState, make_optimizer
    from i2sdf_tpu.train import artifacts

    steps = int(os.environ.get("SPEC_STEPS", "3000"))
    H, W = (int(x) for x in os.environ.get("SPEC_RES", "96x128").split("x"))
    gt_spp = int(os.environ.get("SPEC_GT_SPP", "128"))
    capture_mode = os.environ.get("SPEC_CAPTURE", "r4")
    out_dir = os.environ.get(
        "SPEC_OUT",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "evidence"))
    os.makedirs(out_dir, exist_ok=True)

    sphere_c = np.array([0.6, -1.4, 0.3])

    def orbit_views(n):
        views = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            eye = np.array([1.2 * np.cos(ang), 0.1 * np.sin(2 * ang),
                            1.2 * np.sin(ang)])
            target = np.array([0.4 * np.cos(ang + 2.0), -0.7,
                               0.4 * np.sin(ang + 2.0)])
            views.append((eye, target))
        return views

    def r4_extra_views(lights):
        """Highlight-aimed + grazing views (module docstring)."""
        views = []
        for pos, _, _ in lights:
            # camera on the sphere->light axis: the sphere point facing
            # the light reflects this camera straight onto the light.
            # Two tilted companions sweep the highlight across adjacent
            # sphere points (wider covered patch, more ks-informative
            # pixels at still-near-normal incidence).
            axis = np.asarray(pos) - sphere_c
            axis = axis / np.linalg.norm(axis)
            up = np.array([0.0, 1.0, 0.0])
            side = np.cross(axis, up)
            side = (side / np.linalg.norm(side)
                    if np.linalg.norm(side) > 1e-6
                    else np.array([1.0, 0.0, 0.0]))
            for tilt in (0.0, 0.45, -0.45):
                d = axis * np.cos(tilt) + side * np.sin(tilt)
                views.append((sphere_c + 1.5 * d, sphere_c))
        # grazing along the x=-2 wall and along the floor
        views.append((np.array([-1.80, -0.4, -1.5]),
                      np.array([-1.95, -0.6, 1.5])))
        views.append((np.array([1.4, -1.80, -1.2]),
                      np.array([-1.5, -1.95, 1.2])))
        return views

    focal = 0.8 * W
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    x = (jj.reshape(-1) - W / 2.0) / focal
    y = (ii.reshape(-1) - H / 2.0) / focal
    dirs_cam = np.stack([x, y, np.ones_like(x)], -1).astype(np.float32)

    def build_capture(views, lights):
        """Bake per-view surface samples + render GT (diffuse/specular
        split) with the SAME NEE transport the stage inverts."""
        centers = jnp.stack([jnp.asarray(p, jnp.float32)
                             for p, _, _ in lights])
        radii = jnp.asarray([r for _, r, _ in lights], jnp.float32)
        radiance = jnp.stack([jnp.asarray(L, jnp.float32)
                              for _, _, L in lights])
        sdf = lambda q: scene_sdf(q, lights)  # noqa: E731

        def vis_fn(pts, dirs, t_max):
            return sphere_trace_visibility(sdf, pts, dirs, t_max,
                                           n_steps=24)

        flat = {k: [] for k in ("points", "normals", "view_dirs")}
        view_masks = []
        for eye, target in views:
            pose = _look_at(np.asarray(eye, np.float64),
                            np.asarray(target, np.float64))
            dw = dirs_cam @ pose[:3, :3].T
            units = jnp.asarray(dw / np.linalg.norm(dw, axis=-1,
                                                    keepdims=True))
            cams = jnp.broadcast_to(jnp.asarray(eye, jnp.float32),
                                    units.shape)
            t, hit = sphere_trace(cams, units, lights=lights)
            p = cams + t[:, None] * units
            sel = (np.asarray(hit)
                   & (np.asarray(is_emitter(p, lights)) < 0.5))
            view_masks.append((sel, np.asarray(p)))
            flat["points"].append(np.asarray(p)[sel])
            flat["normals"].append(np.asarray(scene_normal(p, lights))[sel])
            flat["view_dirs"].append(np.asarray(-units)[sel])
        buffers = {k: jnp.asarray(np.concatenate(v), jnp.float32)
                   for k, v in flat.items()}
        n_pts = int(buffers["points"].shape[0])

        mats_gt = scene_materials(buffers["points"], glossy=True)
        gt_cfg = RenderingLayerConfig(spp=gt_spp)

        @jax.jit
        def render_split(key, pts, normals, view_dirs, kd, ks, rough):
            out = shade_emitters(gt_cfg, key, pts, normals, view_dirs,
                                 kd, ks, rough, centers, radii, radiance,
                                 visibility_fn=vis_fn)
            return (out["color_diffuse"] + kd * _AMBIENT,
                    out["color_specular"])

        chunk = 4096
        diff = np.empty((n_pts, 3), np.float32)
        spec = np.empty((n_pts, 3), np.float32)
        t0 = time.time()
        for s in range(0, n_pts, chunk):
            e = min(s + chunk, n_pts)
            pad = chunk - (e - s)

            def padded(a):
                a = jnp.asarray(np.asarray(a)[s:e], jnp.float32)
                return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

            d, sp = render_split(
                jax.random.fold_in(jax.random.PRNGKey(7), s),
                padded(buffers["points"]), padded(buffers["normals"]),
                padded(buffers["view_dirs"]), padded(mats_gt["kd"]),
                padded(mats_gt["ks"]), padded(mats_gt["rough"]))
            diff[s:e] = np.asarray(d)[: e - s]
            spec[s:e] = np.asarray(sp)[: e - s]
        buffers["rgb"] = jnp.asarray(diff + spec)
        print(f"[spec] {n_pts} samples over {len(views)} views; GT at "
              f"{gt_spp} spp in {time.time() - t0:.1f}s", flush=True)

        lum = lambda a: a.mean(-1)  # noqa: E731
        cover = lum(spec) > 0.05 * np.maximum(lum(diff), 1e-6)
        rough_gt = np.asarray(mats_gt["rough"])
        on_sphere = rough_gt < 0.5
        coverage = {
            "spec_coverage_all": round(float(cover.mean()), 4),
            "spec_coverage_sphere": round(float(cover[on_sphere].mean()), 4),
        }

        # ---- identifiability curve: trainer's relative-MSE vs a global
        # ks scale, everything else held at GT. Estimator-independent.
        # COMMON RANDOM NUMBERS with the GT render (same fold_in key):
        # with independent keys the MC variance of the specular term
        # grows ~s^2 and shifts the curve's minimum below 1 even when
        # the data pins ks — CRN cancels the shared noise so the curve
        # measures the DATA constraint alone.
        curve = {}
        gt_rgb = np.asarray(buffers["rgb"])
        w = 1.0 / np.square(gt_rgb.mean(-1, keepdims=True) + 0.1)
        for s_ks in (0.0, 0.5, 1.0, 1.5, 2.0, -1.0):  # -1 = noise floor
            pred_s = np.empty((n_pts, 3), np.float32)
            for s in range(0, n_pts, chunk):
                e = min(s + chunk, n_pts)
                pad = chunk - (e - s)

                def padded(a):
                    a = jnp.asarray(np.asarray(a)[s:e], jnp.float32)
                    return jnp.pad(a, ((0, pad),) + ((0, 0),)
                                   * (a.ndim - 1))

                key_ = (jax.random.PRNGKey(7) if s_ks != -1.0
                        else jax.random.PRNGKey(13))
                d, sp = render_split(
                    jax.random.fold_in(key_, s),
                    padded(buffers["points"]), padded(buffers["normals"]),
                    padded(buffers["view_dirs"]), padded(mats_gt["kd"]),
                    padded(mats_gt["ks"] * abs(s_ks)),
                    padded(mats_gt["rough"]))
                pred_s[s:e] = (np.asarray(d) + np.asarray(sp))[: e - s]
            name = "noise_floor" if s_ks == -1.0 else str(s_ks)
            curve[name] = float(
                (w * np.square(pred_s - gt_rgb)).mean())
        # ---- joint (ks, rough) CRN surface (SPEC_JOINT=1): the 1D
        # curve conditions on GT roughness, but the fit drifts along
        # (rough up, ks down) — if the capture leaves a compensation
        # ridge, the surface shows it as a flat valley off (1, 1).
        joint = {}
        if os.environ.get("SPEC_JOINT", "0") == "1":
            for s_ks in (0.4, 0.7, 1.0, 1.3):
                for s_r in (0.8, 1.0, 1.33):
                    pred_s = np.empty((n_pts, 3), np.float32)
                    for s in range(0, n_pts, chunk):
                        e = min(s + chunk, n_pts)
                        pad = chunk - (e - s)

                        def padded(a):
                            a = jnp.asarray(np.asarray(a)[s:e],
                                            jnp.float32)
                            return jnp.pad(a, ((0, pad),) + ((0, 0),)
                                           * (a.ndim - 1))

                        d, sp = render_split(
                            jax.random.fold_in(jax.random.PRNGKey(7), s),
                            padded(buffers["points"]),
                            padded(buffers["normals"]),
                            padded(buffers["view_dirs"]),
                            padded(mats_gt["kd"]),
                            padded(mats_gt["ks"] * s_ks),
                            padded(jnp.clip(mats_gt["rough"] * s_r,
                                            0.01, 1.0)))
                        pred_s[s:e] = (np.asarray(d)
                                       + np.asarray(sp))[: e - s]
                    joint[f"ks{s_ks}_r{s_r}"] = round(float(
                        (w * np.square(pred_s - gt_rgb)).mean()), 7)
        ident = {
            "ks_loss_curve_crn": {k: round(v, 7) for k, v in curve.items()
                                  if k != "noise_floor"},
            **({"joint_ks_rough_surface_crn": joint} if joint else {}),
            # pure MC noise floor: independent-key rerender at GT ks
            "noise_floor": round(curve["noise_floor"], 7),
            # identifiability ratios: how far the s=0.5 / s=0 renders sit
            # above what estimator noise alone produces. >> 1 = the DATA
            # pins ks and any recovery failure is the estimator's fault.
            "ks_half_over_noise": round(
                curve["0.5"] / max(curve["noise_floor"], 1e-12), 2),
            "ks_zero_over_noise": round(
                curve["0.0"] / max(curve["noise_floor"], 1e-12), 2),
        }
        return (buffers, view_masks, mats_gt, centers, radii, sdf,
                {**coverage, **ident})

    fit_spp = int(os.environ.get("SPEC_FIT_SPP", "8"))
    relmse_eps = float(os.environ.get("SPEC_RELMSE_EPS", "0.1"))
    relmse_pow = float(os.environ.get("SPEC_RELMSE_POW", "2.0"))
    ks_smooth_w = float(os.environ.get("SPEC_KS_SMOOTH", "0.0"))
    # Polyak-averaged readout (SPEC_EMA=decay, e.g. 0.999): along a flat
    # (ks, rough) valley the SGD iterate random-walks while its running
    # average stays put — the step-count-stable estimate the stability
    # study reads out. 0 disables.
    ema_decay = float(os.environ.get("SPEC_EMA", "0"))

    def fit(buffers, centers, radii, sdf, ks_prior_weight,
            spp=None, eps=None, pow_=None, smooth=None, n_steps=None):
        spp = fit_spp if spp is None else spp
        eps = relmse_eps if eps is None else eps
        pow_ = relmse_pow if pow_ is None else pow_
        smooth = ks_smooth_w if smooth is None else smooth
        n_steps = steps if n_steps is None else n_steps
        mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
        tcfg = MaterialTrainConfig(batch_size=1024, spp=spp,
                                   vis_steps=16,
                                   learning_rate=5e-3, steps=n_steps,
                                   smooth_weight=1e-4,
                                   relative_mse_eps=eps,
                                   relative_mse_pow=pow_,
                                   smooth_ks_weight=smooth,
                                   ks_prior_weight=ks_prior_weight)
        params = {
            "material": material_net_init(jax.random.PRNGKey(5), mat_cfg),
            "emission": emission_init(
                jnp.full((centers.shape[0], 3), 2.0, jnp.float32)),
        }
        tx = make_optimizer(tcfg.learning_rate, decay_steps=n_steps)
        step_fn, _, calibrate = make_material_train_step(
            mat_cfg, tcfg, sdf, centers, radii, tx)
        key = jax.random.PRNGKey(9)
        key, k_cal = jax.random.split(key)
        params = calibrate(params, buffers, k_cal)
        state = TrainState(step=jnp.int32(0), params=params,
                           opt_state=tx.init(params))
        ema = None
        ema_update = None
        if ema_decay > 0:
            @jax.jit
            def ema_update(e, p):
                return jax.tree.map(
                    lambda a, b: ema_decay * a + (1 - ema_decay) * b, e, p)
        t0 = time.time()
        losses = []
        for i in range(n_steps):
            key, k = jax.random.split(key)
            state, m = step_fn(state, buffers, k)
            losses.append(float(m["rgb_loss"]))
            if ema_update is not None:
                mat = state.params["material"]
                ema = mat if ema is None else ema_update(ema, mat)
            if (i + 1) % 1000 == 0:
                print(f"[spec fit {i + 1}/{n_steps}] rgb={losses[-1]:.5f}",
                      flush=True)
        dt = time.time() - t0
        return state, losses, dt, n_steps, ema

    def metrics(state, buffers, mats_gt, losses, dt, ks_prior_weight,
                n_steps=None, ema=None):
        n_steps = steps if n_steps is None else n_steps
        mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
        mats = material_net_apply(state.params["material"], mat_cfg,
                                  buffers["points"])
        ema_extra = {}
        if ema is not None:
            em = material_net_apply(ema, mat_cfg, buffers["points"])
            rg = np.asarray(mats_gt["rough"])
            sph = rg < 0.5
            ema_extra = {
                "ks_corr_ema": round(float(np.corrcoef(
                    np.asarray(em["ks"]).mean(-1),
                    np.asarray(mats_gt["ks"]).mean(-1))[0, 1]), 3),
                "rough_corr_ema": round(float(np.corrcoef(
                    np.asarray(em["rough"]), rg)[0, 1]), 3),
                "ks_sphere_mean_ema": round(float(
                    np.asarray(em["ks"])[sph].mean()), 3),
                "rough_sphere_mean_ema": round(float(
                    np.asarray(em["rough"])[sph].mean()), 3),
                "ema_decay": ema_decay,
            }
        kd = np.asarray(mats["kd"])
        ks = np.asarray(mats["ks"])
        rough = np.asarray(mats["rough"])
        kd_gt = np.asarray(mats_gt["kd"])
        ks_gt = np.asarray(mats_gt["ks"])
        rough_gt = np.asarray(mats_gt["rough"])
        on_sphere = rough_gt < 0.5
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
            "steps_per_sec": round(n_steps / dt, 2),
            **ema_extra,
        }

    result = {
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "steps": steps, "gt_spp": gt_spp, "res": f"{H}x{W}",
    }
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        result["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=repo,
            capture_output=True, text=True).stdout.strip()
    except Exception:
        pass

    captures = []
    if capture_mode in ("r3", "both"):
        captures.append(("capture_r3_single_light",
                         orbit_views(8), DEFAULT_LIGHTS))
    if capture_mode in ("r4", "both"):
        lights = TWO_LIGHTS
        captures.append(("capture_r4_two_lights_grazing",
                         orbit_views(8) + r4_extra_views(lights), lights))

    # Estimator ablation: SPEC_SWEEP="pow=1;pow=1,spp=16;pow=0" runs
    # each ';'-separated config (k=v pairs: pow/spp/eps/smooth/prior/
    # steps) against the SAME baked capture, at SPEC_SWEEP_STEPS
    # (default 3000) unless the config sets steps itself. The capture +
    # GT bake dominate wall time, so one invocation A/Bs the whole
    # estimator family.
    sweep_spec = os.environ.get("SPEC_SWEEP", "")

    SWEEP_KEYS = {"spp", "eps", "pow", "smooth", "prior", "steps"}

    def parse_sweep(spec):
        cfgs = []
        for item in spec.split(";"):
            kv = dict(tok.split("=") for tok in item.split(",") if tok)
            unknown = set(kv) - SWEEP_KEYS
            if unknown:
                # a typo'd key would silently run the baseline config
                # while recording the result under the typo'd tag —
                # mislabeled evidence. Fail loudly instead.
                raise SystemExit(
                    f"SPEC_SWEEP: unknown key(s) {sorted(unknown)} in "
                    f"{item!r}; valid keys: {sorted(SWEEP_KEYS)}")
            cfgs.append(kv)
        return cfgs

    panel_state = panel_masks = None
    for name, views, lights in captures:
        print(f"[spec] building {name} ({len(views)} views, "
              f"{len(lights)} lights)", flush=True)
        (buffers, view_masks, mats_gt, centers, radii, sdf,
         diag) = build_capture(views, lights)
        print(f"[spec] {name} diagnostics: {json.dumps(diag)}", flush=True)
        # 0.0003, not the material stage's 0.001 default: with the
        # highlight resolved the data term pins ks (CRN curve 34 sigma)
        # and the stronger prior only biases the amplitude down (0.24
        # vs GT 0.35 at 0.001; 0.39 at 0.0003 — estimator sweep 3).
        prior_w = float(os.environ.get("SPEC_PRIOR", "0.0003"))
        sweep_out = {}
        if sweep_spec:
            sweep_steps = int(os.environ.get("SPEC_SWEEP_STEPS", "3000"))
            for kv in parse_sweep(sweep_spec):
                tag = ",".join(f"{k}={v}" for k, v in sorted(kv.items()))
                print(f"[spec] {name}: sweep fit [{tag}]", flush=True)
                state, losses, dt, nst, ema = fit(
                    buffers, centers, radii, sdf,
                    float(kv.get("prior", prior_w)),
                    spp=int(kv["spp"]) if "spp" in kv else None,
                    eps=float(kv["eps"]) if "eps" in kv else None,
                    pow_=float(kv["pow"]) if "pow" in kv else None,
                    smooth=(float(kv["smooth"])
                            if "smooth" in kv else None),
                    n_steps=int(kv.get("steps", sweep_steps)))
                res = metrics(state, buffers, mats_gt, losses, dt,
                              float(kv.get("prior", prior_w)), nst,
                              ema=ema)
                print(json.dumps({tag: res}), flush=True)
                sweep_out[tag] = res
        print(f"[spec] {name}: fit (prior {prior_w}, spp {fit_spp}, "
              f"relmse_eps {relmse_eps}, relmse_pow {relmse_pow})",
              flush=True)
        state, losses, dt, nst, ema = fit(buffers, centers, radii, sdf,
                                          prior_w)
        res = metrics(state, buffers, mats_gt, losses, dt, prior_w, nst,
                      ema=ema)
        res["fit_spp"] = fit_spp
        res["relative_mse_eps"] = relmse_eps
        res["relative_mse_pow"] = relmse_pow
        res["smooth_ks_weight"] = ks_smooth_w
        print(json.dumps(res), flush=True)
        result[name] = {**diag, "n_views": len(views),
                        "n_lights": len(lights), "soft_prior": res,
                        **({"estimator_sweep": sweep_out}
                           if sweep_out else {})}
        panel_state, panel_masks = state, view_masks

    # ks panel on the last capture's highlight view (view index 8 = the
    # first highlight-aimed one when present, else view 0)
    vi = 8 if len(panel_masks) > 8 else 0
    sel, pts_full = panel_masks[vi]
    mat_cfg = MaterialNetConfig(dims=(256,) * 4, multires=6)
    ks_img = np.zeros((H * W,), np.float32)
    ks_img[sel] = np.asarray(material_net_apply(
        panel_state.params["material"], mat_cfg,
        jnp.asarray(pts_full[sel]))["ks"]).mean(-1)
    gt_img = np.zeros((H * W,), np.float32)
    gt_img[sel] = np.asarray(scene_materials(
        jnp.asarray(pts_full[sel]), glossy=True)["ks"]).mean(-1)
    panel = np.concatenate([ks_img.reshape(H, W), gt_img.reshape(H, W)],
                           axis=1)
    png = os.path.join(out_dir, "specular_recovery_ks.png")
    artifacts.write_colormap(png, panel)
    result["panel_png"] = os.path.relpath(png)

    with open(os.path.join(out_dir, "specular_recovery.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
