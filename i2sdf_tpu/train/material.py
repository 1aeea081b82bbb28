"""Material-optimization (intrinsic decomposition) training stage.

Second stage of the paper's pipeline: given a reconstructed scene
(frozen SDF + radiance checkpoint from the reconstruction stage), learn
a spatial material field (kd / ks / roughness, `models/material.py`) and
per-emitter emission so that Monte-Carlo direct lighting of the frozen
geometry (`models/rendering_layer.py`) reproduces the observed images.
The reference scaffolds every ingredient of this stage but never
released the trainer itself (`/root/reference/README.md:77-79`;
MaterialDataset `dataset/train_dataset.py:212-350`, RenderingLayer
`model/rendering/__init__.py`, emission params
`model/network/__init__.py:49-75` are all dead code there) — this module
completes it.

TPU-first design:
- Geometry is BAKED once up front: every training pixel's surface point,
  normal and view direction come from one chunked eval render of the
  frozen model (the same sharded path validation uses), so the per-step
  program is pure shading — no volume rendering, no sampler. The bake is
  the exact analog of the reference trainer's one-off full-image render
  event (`model/trainer/recon.py:172-199`), reused for a new purpose.
- The train step is one jitted program: on-device batch gather from the
  baked buffers, material MLP, spp-vmapped MC shading with sphere-traced
  emitter visibility (fixed-iteration `fori_loop`), the dual-buffer
  sample-split MSE (see loss_fn) + smoothness + ks-prior losses, Adam.
  Sampling is detached (`RenderingLayerConfig.detach_sampling`) so
  material gradients flow through the BRDF value and emission only —
  the standard stable inverse-rendering estimator.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.material import MaterialData
from ..data.recon import ReconData
from ..models import mlp, renderer
from ..models.material import (MaterialNetConfig, ambient_apply,
                               emission_apply, emission_init,
                               material_net_apply, material_net_init)
from ..models.rendering_layer import RenderingLayerConfig, shade_emitters
from ..train import artifacts
from ..train.checkpoint import CheckpointManager
from ..train.state import create_train_state
from ..train.step import make_eval_render_fn
from ..utils.cameras import get_camera_params
from ..utils.imaging import linear_to_srgb, psnr


@dataclasses.dataclass(frozen=True)
class MaterialTrainConfig:
    steps: int = 20_000
    batch_size: int = 2048
    learning_rate: float = 5e-4
    decay_rate: float = 0.1
    spp: int = 8
    vis_steps: int = 24
    smooth_weight: float = 0.01
    smooth_eps: float = 0.01  # world-space jitter for the smoothness pair
    # opt-in ks smoothness (same jittered pair as kd/rough): specular
    # albedo is as piecewise-smooth as the other channels, and its
    # per-point MC gradient noise is far larger (the signal lives in a
    # few downweighted highlight pixels) — measured on the glossy-scene
    # recovery, within-region ks noise is what caps ks_corr. Default 0
    # keeps the certified material-stage behavior bit-identical.
    smooth_ks_weight: float = 0.0
    # dielectric prior on specular albedo: a maximally-rough GGX lobe is
    # nearly view-independent, so without a prior the optimizer can dump
    # diffuse energy into (high ks, rough~1) — an identifiability gap,
    # not a bug. Pulling ks toward the common dielectric F0 (0.04)
    # breaks the tie the way inverse-rendering pipelines usually do.
    ks_prior: float = 0.04
    ks_prior_weight: float = 0.01
    # mild downward pressure on the ambient irradiance: ambient and
    # direct light are partially interchangeable explanations of
    # brightness, and when visibility/geometry is imperfect the
    # optimizer prefers the structureless ambient (measured on the
    # editing demo: relit images came out flat). Direct light should
    # carry the shading; ambient is the residual.
    ambient_prior_weight: float = 0.01
    # relative (luminance-normalized) MSE: HDR targets are heavy-tailed
    # (pixels near the light are ~100x the median), so a plain MSE's
    # gradient is dominated by a handful of bright pixels and the fit
    # oscillates (measured on the recovery eval: per-200-step rgb_mse
    # swung 0.03-0.21). Weighting each pixel by 1/(lum(gt)+eps)^2 —
    # a GT-only weight, so the dual-buffer estimator stays unbiased —
    # is the standard inverse-rendering relative-L2.
    relative_mse: bool = True
    relative_mse_eps: float = 0.1
    # exponent on the luminance normalizer. 2.0 (the classical
    # relative-L2) is the validated estimator: the round-4 sweep
    # (docs/evidence/specular_estimator_sweep.json) showed that pow 0-1
    # reaches high ks_corr at UNRESOLVED highlight resolution only via a
    # degenerate ks~0.9 / roughness~0.04 collapse — corr-flattering, not
    # recovery — while at resolved resolution (96x128) pow 2 recovers
    # ks, roughness, and albedo simultaneously. The knob exists for
    # ablation only; keep 2.0.
    relative_mse_pow: float = 2.0
    # Newton-project baked points onto the frozen SDF's zero level-set
    # (see project_to_surface) — volume-rendered depth is biased and
    # points inside the surface lose all direct light to the visibility
    # march
    project_surface: bool = True
    # scale the initial emission so a probe render matches the observed
    # brightness per channel. The cluster-mean init (mean HDR of emitter
    # pixels) has the right CHROMA but an arbitrary radiometric scale —
    # the solid angle the emitter subtends is baked into the transport,
    # and a log-space Adam at lr 5e-4 needs thousands of steps to climb
    # a missing factor of 20 (measured on the demo scene: point-light
    # equivalence needs Li ~ 40 where the pixel mean suggested ~2).
    calibrate_emission: bool = True
    # one-bounce indirect lighting from the trained radiance field
    # (models/indirect.py — the reference editing design's
    # `get_incident_radiance`, completed). 0 keeps the constant learned
    # ambient only; >0 bakes `indirect_spp` cosine-sampled secondary
    # rays per surface sample ONCE (field is frozen, so the bake is a
    # constant of the optimization) and shades kd*(ambient + e_ind).
    indirect_spp: int = 0
    indirect_steps: int = 48  # sphere-trace budget per secondary ray
    indirect_chunk: int = 4096
    # irradiance-cache smoothing of the bake: k-NN normal-gated average
    # (models/indirect.py::smooth_irradiance). Indirect irradiance is a
    # hemisphere integral — low-frequency in position — so neighbor
    # averaging cuts the bake's MC noise ~sqrt(k) where raising spp
    # costs linearly. 0 disables (raw per-point bake).
    indirect_smooth_k: int = 16
    n_emitters: int = 1
    emitter_scale: float = 1.0
    diffuse_model: str = "lambert"
    min_weight_sum: float = 0.5  # bake validity: ray must hit surface
    checkpoint_freq: int = 5000
    plot_freq: int = 1000
    downsample_train: int = 1

    @classmethod
    def from_cfgnode(cls, node) -> "MaterialTrainConfig":
        kw = {f.name: node.get(f.name, f.default)
              for f in dataclasses.fields(cls)
              if not isinstance(f.default, dataclasses._MISSING_TYPE)}
        return cls(**kw)


# ---------------------------------------------------------------------------
# Geometry bake
# ---------------------------------------------------------------------------


def bake_image_geometry(params, render_image, uv, K, pose,
                        min_weight_sum: float = 0.5):
    """One image's per-pixel surface geometry from the frozen model.

    Returns dict(points (HW,3), normals (HW,3), view_dirs (HW,3),
    valid (HW,) bool). `render_image` is a make_eval_render_fn callable.
    """
    uv = jnp.asarray(uv, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    pose = jnp.asarray(pose, jnp.float32)
    out = render_image(params, uv, K, pose)
    ray_dirs, cam_loc = get_camera_params(uv[None], pose[None], K[None])
    norms = jnp.linalg.norm(ray_dirs[0], axis=-1, keepdims=True)
    units = ray_dirs[0] / jnp.maximum(norms, 1e-12)
    # depth_values is z-depth (divided by the unnormalized ray norm,
    # reference `model/network/__init__.py:124-125`); distance along the
    # unit ray is depth * |ray_dir|
    dist = out["depth_values"].reshape(-1) * norms[:, 0]
    points = cam_loc[0][None, :] + dist[:, None] * units
    normals = out["normal_map"].reshape(-1, 3)
    wsum = out["weight_sum"].reshape(-1)
    valid = (jnp.isfinite(dist) & (dist > 1e-3)
             & (wsum > min_weight_sum)
             & (jnp.linalg.norm(normals, axis=-1) > 0.5))
    return {"points": points, "normals": normals, "view_dirs": -units,
            "valid": valid}


def project_to_surface(implicit_params, implicit_cfg, points,
                       n_iters: int = 2, chunk: int = 8192):
    """Newton-project points onto the SDF zero level-set:
    p <- p - sdf(p) * grad / |grad|^2, twice.

    Volume-rendered expected depth is biased off the surface (measured
    on the editing demo's 400-step recon: 22% of baked points were
    INSIDE the learned surface, mean |sdf| 0.058) — a visibility march
    starting inside reads min-sdf < eps immediately, kills the point's
    direct light, and the material fit dumps its energy into ambient.
    One-off at bake time, so the XLA path is fine."""
    import math

    @jax.jit
    def step(p):
        s = mlp.sdf_vals(implicit_params, implicit_cfg, p)[:, 0]
        g = mlp.sdf_gradient(implicit_params, implicit_cfg, p)
        denom = jnp.maximum(jnp.sum(g * g, -1), 1e-6)
        return p - (s / denom)[:, None] * g

    out = []
    n = points.shape[0]
    pad_to = chunk * max(1, math.ceil(n / chunk))
    p = jnp.pad(jnp.asarray(points, jnp.float32),
                ((0, pad_to - n), (0, 0)))
    for s0 in range(0, pad_to, chunk):
        c = p[s0:s0 + chunk]
        for _ in range(n_iters):
            c = step(c)
        out.append(np.asarray(c))
    return jnp.asarray(np.concatenate(out)[:n])


def bake_geometry(params, render_image, data: MaterialData,
                  min_weight_sum: float = 0.5, log=print):
    """Bake every training image; returns flat valid-only device arrays
    (points, normals, view_dirs, rgb) plus the per-image raw buffers for
    validation renders."""
    per_image = []
    flat = {k: [] for k in ("points", "normals", "view_dirs", "rgb")}
    for i in range(data.n_images):
        g = bake_image_geometry(params, render_image, data.uv,
                                data.intrinsics_all[i], data.pose_all[i],
                                min_weight_sum=min_weight_sum)
        g = {k: np.asarray(v) for k, v in g.items()}
        per_image.append(g)
        sel = g["valid"]
        flat["points"].append(g["points"][sel])
        flat["normals"].append(g["normals"][sel])
        flat["view_dirs"].append(g["view_dirs"][sel])
        flat["rgb"].append(np.asarray(data.rgb_images[i])[sel])
        log(f"[material] baked view {i}: {int(sel.sum())}/{sel.size} "
            "valid pixels")
    train = {k: jnp.asarray(np.concatenate(v), jnp.float32)
             for k, v in flat.items()}
    n = int(train["points"].shape[0])
    if n == 0:
        raise ValueError("geometry bake produced no valid surface pixels "
                         "(is the reconstruction checkpoint trained?)")
    return train, per_image


def load_material_stage(exp_dir: str, conf, step: int | None = None):
    """Restore a trained material stage for downstream consumers
    (relight `--use_material`). Returns (params, MaterialNetConfig,
    Emitters carrying the LEARNED emission)."""
    mat_node = conf.get("material", {}) or {}
    mat_cfg = MaterialNetConfig.from_cfgnode(
        mat_node.get("material_network", {}) or {})
    em_path = os.path.join(exp_dir, "material", "emitters.npz")
    if not os.path.exists(em_path):
        raise FileNotFoundError(
            f"no trained material stage under {exp_dir} "
            "(run --material first)")
    em = np.load(em_path)
    template = {
        "material": material_net_init(jax.random.PRNGKey(0), mat_cfg),
        "emission": emission_init(em["init_radiance"]),
    }
    state, _ = create_train_state(template)
    ckpt = CheckpointManager(
        os.path.join(exp_dir, "material", "checkpoints", "orbax"))
    state, _ = ckpt.restore(state, step=step)
    from ..eval.relight import Emitters

    emitters = Emitters(em["centers"], em["radii"],
                        emission_apply(state.params["emission"]))
    print(f"[material] restored material stage @{int(state.step)}; "
          f"learned emission = "
          f"{np.round(np.asarray(emitters.radiance), 4).tolist()}")
    return state.params, mat_cfg, emitters


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


def make_material_train_step(mat_cfg: MaterialNetConfig,
                             tcfg: MaterialTrainConfig,
                             sdf_fn, centers, radii, tx, mesh=None):
    """One jitted optimization step over the baked geometry buffers.

    `sdf_fn(pts) -> (N,)` is the FROZEN scene SDF used for emitter
    visibility (the trainer closes it over the reconstruction
    checkpoint; tests inject analytic SDFs). With `mesh`, the gathered
    shading batch is sharded over the mesh's 'data' axis (params
    replicated, gradients psum'd over ICI) — same DP convention as the
    reconstruction step (SURVEY §2c)."""
    from ..eval.relight import carve_emitters_sdf, sphere_trace_visibility

    # NEXT-EVENT ESTIMATION shading (shade_emitters): BRDF-sampled MC
    # hits a compact emitter almost never (measured near-zero gradient
    # signal on the demo scene, where the light subtends ~2% of the
    # hemisphere), so every sample is drawn inside the emitter cone
    # instead — ~450x lower estimator error at spp 8 (measured).
    layer_cfg = RenderingLayerConfig(spp=tcfg.spp,
                                     diffuse_model=tcfg.diffuse_model)
    # the train step shades TWO independent half-spp buffers (see
    # loss_fn), so per-step sample cost equals tcfg.spp
    layer_half = RenderingLayerConfig(spp=max(tcfg.spp // 2, 1),
                                      diffuse_model=tcfg.diffuse_model)
    centers = jnp.asarray(centers, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    # mask-discovered emitters sit ON scene surfaces; carve their balls
    # out of the occluder SDF so they don't shadow their own light
    vis_sdf = carve_emitters_sdf(sdf_fn, centers, radii)

    def visibility(pts, dirs, t_max):
        return sphere_trace_visibility(vis_sdf, pts, dirs, t_max,
                                       n_steps=tcfg.vis_steps)

    def predict_with(lcfg, params, key, pts, normals, view_dirs,
                     e_ind=None):
        mats = material_net_apply(params["material"], mat_cfg, pts)
        radiance = emission_apply(params["emission"])
        out = shade_emitters(lcfg, key, pts, normals, view_dirs,
                             mats["kd"], mats["ks"], mats["rough"],
                             centers, radii, radiance,
                             visibility_fn=visibility)
        # indirect light = baked one-bounce field irradiance (e_ind,
        # models/indirect.py) when supplied, plus the learnable ambient
        # residual (kd * A); see models/material.py::emission_init
        irr = ambient_apply(params["emission"])[None]
        if e_ind is not None:
            irr = irr + e_ind
        ambient = mats["kd"] * irr
        return (out["color_diffuse"] + out["color_specular"] + ambient,
                mats)

    def predict(params, key, pts, normals, view_dirs, e_ind=None):
        return predict_with(layer_cfg, params, key, pts, normals,
                            view_dirs, e_ind=e_ind)

    def loss_fn(params, key, pts, normals, view_dirs, gt, e_ind=None):
        k_a, k_b, k_jit = jax.random.split(key, 3)
        # Dual-buffer MSE: the prediction is a noisy MC estimate, so
        # neither L1 (matches the estimator's MEDIAN — right-skewed
        # specular noise under-fits brightness) nor naive MSE (the
        # residual and the gradient path share samples; their
        # covariance rewards variance REDUCTION, again biasing dark)
        # is unbiased. Shading two INDEPENDENT half-spp buffers and
        # cross-multiplying gives E[grad] = 2(E[pred]-gt)dE[pred]/dθ —
        # the gradient of the true-mean MSE (Mitsuba-style inverse
        # rendering practice; measured ~11%-low kd·L without it).
        pred_a, mats = predict_with(layer_half, params, k_a, pts,
                                    normals, view_dirs, e_ind=e_ind)
        pred_b, _ = predict_with(layer_half, params, k_b, pts,
                                 normals, view_dirs, e_ind=e_ind)
        res_a = jax.lax.stop_gradient(pred_a) - gt
        res_b = jax.lax.stop_gradient(pred_b) - gt
        if tcfg.relative_mse:
            lum = gt.mean(-1, keepdims=True) + tcfg.relative_mse_eps
            if tcfg.relative_mse_pow == 2.0:
                # certified default: keep the original 1/(lum+eps)^2
                # lowering bit-identical (the generic pow lowering
                # differs by ~3e-6 relative on TPU and would silently
                # drift every default run's numerics)
                w = 1.0 / jnp.square(lum)
            else:
                # ablation path; clamp the base so a luminance below
                # -eps cannot NaN under a non-integer exponent
                w = jnp.maximum(lum, 1e-6) ** (-tcfg.relative_mse_pow)
        else:
            w = 1.0
        rgb_loss = (w * (res_a * pred_b + res_b * pred_a)).mean()
        # material smoothness: the field should vary slower than shading
        # (reference's normal-smoothness analog, applied to kd/roughness)
        jit_pts = pts + tcfg.smooth_eps * jax.random.normal(
            k_jit, pts.shape)
        mats_j = material_net_apply(params["material"], mat_cfg, jit_pts)
        smooth = (jnp.abs(mats["kd"] - mats_j["kd"]).mean()
                  + jnp.abs(mats["rough"] - mats_j["rough"]).mean())
        ks_smooth = jnp.abs(mats["ks"] - mats_j["ks"]).mean()
        ks_reg = jnp.abs(mats["ks"] - tcfg.ks_prior).mean()
        amb_reg = ambient_apply(params["emission"]).mean()
        loss = (rgb_loss + tcfg.smooth_weight * smooth
                + tcfg.smooth_ks_weight * ks_smooth
                + tcfg.ks_prior_weight * ks_reg
                + tcfg.ambient_prior_weight * amb_reg)
        pred_mean = 0.5 * (pred_a + pred_b)
        mse = jnp.square(pred_mean - gt).mean()
        return loss, {"loss": loss, "rgb_loss": mse,
                      "smooth_loss": smooth,
                      "psnr": psnr(pred_mean, gt)}

    def calibrate(params, buffers, key, probe: int = 2048):
        """Least-squares per-channel emission rescale from a probe
        render: log_radiance += log(<gt - fixed> / <pred_scaling>).

        The baked one-bounce term (kd * e_ind) does NOT scale with the
        emission parameters — it is subtracted from the GT before the
        ratio, else its (already radiometrically-correct) magnitude
        drags the scale far below the true emission (measured on the
        indirect A/B: emission calibrated to 15 of 110)."""
        n = buffers["points"].shape[0]
        idx = jax.random.randint(key, (min(probe, n),), 0, n)
        batch = {k: jnp.take(v, idx, axis=0) for k, v in buffers.items()}
        # emission-scaling part only (direct + kd*ambient)
        pred, mats = predict(params, jax.random.fold_in(key, 1),
                             batch["points"], batch["normals"],
                             batch["view_dirs"])
        gt_mean = batch["rgb"].mean(0)
        if "e_ind" in batch:
            gt_mean = gt_mean - (mats["kd"] * batch["e_ind"]).mean(0)
        scale = (jnp.clip(gt_mean, 1e-6, None)
                 / jnp.clip(pred.mean(0), 1e-6, None))
        log_s = jnp.log(scale)
        print(f"[material] emission calibrated by x"
              f"{np.round(np.asarray(scale), 3).tolist()}")
        # scale every light source (emitters AND ambient) uniformly —
        # EXCEPT the ambient when a baked indirect buffer exists: there
        # the ambient is a small residual on top of e_ind, and scaling
        # it up 30x would double-count the indirect light
        emission = {}
        for k, v in params["emission"].items():
            if k == "log_ambient" and "e_ind" in buffers:
                emission[k] = v
            else:
                emission[k] = v + (log_s[None] if v.ndim == 2 else log_s)
        return {**params, "emission": emission}

    @jax.jit
    def step(state, buffers, key):
        k_idx, k_loss = jax.random.split(key)
        n = buffers["points"].shape[0]
        idx = jax.random.randint(k_idx, (tcfg.batch_size,), 0, n)
        batch = {k: jnp.take(v, idx, axis=0) for k, v in buffers.items()}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("data"))
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, shard),
                batch)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, k_loss, batch["points"], batch["normals"],
            batch["view_dirs"], batch["rgb"],
            e_ind=batch.get("e_ind"))
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state), metrics

    return step, predict, calibrate


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class MaterialTrainer:
    """Orchestrates the material stage on top of a reconstruction
    checkpoint: emitter discovery, geometry bake, the jitted loop,
    validation artifacts (kd / roughness / re-render maps) and orbax
    checkpointing under `<exp_dir>/material/`."""

    def __init__(self, conf, exp_dir: str, recon_params, model_cfg,
                 data_root: str = "data", fused: bool | None = None,
                 seed: int = 0):
        self.conf = conf
        self.exp_dir = exp_dir
        self.recon_params = recon_params
        self.model_cfg = model_cfg
        self.tcfg = MaterialTrainConfig.from_cfgnode(
            conf.get("material", {}) or {})
        mat_node = conf.get("material", {}) or {}
        self.mat_cfg = MaterialNetConfig.from_cfgnode(
            mat_node.get("material_network", {}) or {})
        self.key = jax.random.PRNGKey(seed)
        self.loop_key = jax.random.PRNGKey(seed + 1)  # train-step stream

        dataset_conf = dict(conf.dataset)
        scan_id = dataset_conf.pop("scan_id", 0)
        dataset_conf.pop("downsample", None)
        dataset_conf.pop("data_root", None)
        data_dir = dataset_conf["data_dir"]

        # HDR inputs if the scene ships them (emission lives in linear
        # radiometric units; LDR still optimizes, in gamma space)
        hdr_dir = os.path.join(data_root, data_dir, f"scan{scan_id}", "hdr")
        is_hdr = os.path.isdir(hdr_dir)
        self.data = MaterialData(
            data_dir, scan_id=scan_id, data_root=data_root, is_hdr=is_hdr,
            downsample_train=self.tcfg.downsample_train)

        # emitters from the recon dataset's light masks + GT depth
        # (brightest-pixel fallback inside find_emitters)
        from ..eval.relight import find_emitters

        rd = ReconData(scan_id=scan_id, data_root=data_root,
                       use_depth=True, use_normal=False, use_bubble=False,
                       use_lightmask=True,
                       **{k: v for k, v in dataset_conf.items()
                          if k in ("data_dir", "img_res")})
        self.emitters = find_emitters(
            rd, n_emitters=self.tcfg.n_emitters,
            emitter_scale=self.tcfg.emitter_scale, key=self.key)
        print(f"[material] {self.emitters.count} emitters at "
              f"{np.round(np.asarray(self.emitters.centers), 3).tolist()}")

        chunk = conf.train.get("split_n_pixels", 12000)
        render_image, _ = make_eval_render_fn(model_cfg, chunk_size=chunk,
                                              fused_sampler=fused)
        self.buffers, self.per_image = bake_geometry(
            recon_params, render_image, self.data,
            min_weight_sum=self.tcfg.min_weight_sum)
        print(f"[material] baked {int(self.buffers['points'].shape[0])} "
              "surface samples")

        if self.tcfg.project_surface:
            # project each image's VALID pixels once, then rebuild the
            # flat train buffer from the same arrays — bake_geometry
            # concatenated per-image valid points in this exact order,
            # and the validation maps (render_material_maps) shade
            # per_image, so both sides see the projected points
            flat_proj = []
            for g in self.per_image:
                sel = g["valid"]
                proj = np.asarray(project_to_surface(
                    recon_params["implicit"], model_cfg.implicit,
                    jnp.asarray(g["points"][sel])))
                g["points"] = np.array(g["points"])
                g["points"][sel] = proj
                flat_proj.append(proj)
            self.buffers["points"] = jnp.asarray(
                np.concatenate(flat_proj), jnp.float32)

        # emitting surfaces are not material-fit targets — their pixels
        # show emission, not reflected light. Drop baked points inside
        # any emitter ball (+ margin, matching carve_emitters_sdf), and
        # mark them invalid for the validation maps/PSNR.
        from ..eval.relight import EMITTER_MARGIN

        def _outside_emitters(pts):
            keep = np.ones(pts.shape[0], bool)
            for e in range(self.emitters.count):
                keep &= (np.linalg.norm(
                    pts - np.asarray(self.emitters.centers)[e], axis=-1)
                    > float(np.asarray(self.emitters.radii)[e])
                    + EMITTER_MARGIN)
            return keep

        keep = _outside_emitters(np.asarray(self.buffers["points"]))
        if not keep.all():
            self.buffers = {k: jnp.asarray(np.asarray(v)[keep])
                            for k, v in self.buffers.items()}
            print(f"[material] excluded {int((~keep).sum())} "
                  "emitter-surface samples from the fit")
        for g in self.per_image:
            g["valid"] = g["valid"] & _outside_emitters(
                np.asarray(g["points"]))

        # one-bounce indirect irradiance from the trained field, baked
        # once (the field is frozen — see models/indirect.py docstring).
        # Per-step cost of indirect lighting is then a single multiply.
        if self.tcfg.indirect_spp > 0:
            from ..models.indirect import (bake_indirect_irradiance,
                                           make_field_radiance_fn,
                                           smooth_irradiance)

            field_fn = make_field_radiance_fn(
                recon_params, model_cfg,
                n_steps=self.tcfg.indirect_steps)
            self.key, k_ind = jax.random.split(self.key)
            t_ind = time.time()
            e_raw = bake_indirect_irradiance(
                field_fn, k_ind, self.buffers["points"],
                self.buffers["normals"], spp=self.tcfg.indirect_spp,
                emitter_centers=self.emitters.centers,
                emitter_radii=self.emitters.radii,
                chunk=self.tcfg.indirect_chunk)
            sk = self.tcfg.indirect_smooth_k
            if sk > 0:
                self.buffers["e_ind"] = jnp.asarray(smooth_irradiance(
                    self.buffers["points"], self.buffers["normals"],
                    e_raw, k=sk))
            else:
                self.buffers["e_ind"] = jnp.asarray(e_raw)
            for i, g in enumerate(self.per_image):
                sel = g["valid"]
                e_full = np.zeros_like(g["points"], dtype=np.float32)
                if sel.any():
                    if sk > 0:
                        # interpolate the (smoothed) training-point cache
                        # at the validation pixels rather than re-baking:
                        # one shared low-noise cache, zero extra MC cost
                        e_full[sel] = smooth_irradiance(
                            self.buffers["points"],
                            self.buffers["normals"],
                            self.buffers["e_ind"], k=sk,
                            query_points=g["points"][sel],
                            query_normals=g["normals"][sel])
                    else:
                        e_full[sel] = bake_indirect_irradiance(
                            field_fn, jax.random.fold_in(k_ind, 1000 + i),
                            g["points"][sel], g["normals"][sel],
                            spp=self.tcfg.indirect_spp,
                            emitter_centers=self.emitters.centers,
                            emitter_radii=self.emitters.radii,
                            chunk=self.tcfg.indirect_chunk)
                g["e_ind"] = e_full
            mean_e = np.asarray(self.buffers["e_ind"]).mean(0)
            print(f"[material] baked one-bounce indirect irradiance "
                  f"({self.tcfg.indirect_spp} spp) in "
                  f"{time.time() - t_ind:.1f}s; mean = "
                  f"{np.round(mean_e, 4).tolist()}")

        self.key, k_init = jax.random.split(self.key)
        params = {
            "material": material_net_init(k_init, self.mat_cfg),
            "emission": emission_init(self.emitters.radiance),
        }

        # multi-chip DP by default, mirroring the reconstruction trainer
        self.mesh = None
        n_dev = jax.device_count()
        if n_dev > 1 and self.tcfg.batch_size % n_dev == 0:
            from ..parallel import make_mesh, replicate_params

            self.mesh = make_mesh()
            params = replicate_params(self.mesh, params)
            self.buffers = replicate_params(self.mesh, self.buffers)
            print(f"[material] data-parallel over {n_dev} "
                  f"{jax.devices()[0].platform} devices")

        # visibility tracing evaluates the frozen SDF spp*vis_steps times
        # per batch point — on TPU it rides the fused Pallas MLP kernel
        # (same fast path the sampler and mesher use); CPU keeps XLA
        frozen_implicit = recon_params["implicit"]
        if self.mesh is not None:
            # the jitted step closes over these as constants; without
            # replication they stay on device 0 while the batch shards
            # over the mesh -> "incompatible devices" at trace time
            from ..parallel import replicate_params

            frozen_implicit = replicate_params(self.mesh, frozen_implicit)
        frozen = jax.lax.stop_gradient(frozen_implicit)
        implicit_cfg = model_cfg.implicit
        use_fused = (fused if fused is not None
                     else jax.default_backend() not in ("cpu",))
        if use_fused:
            from ..ops.pallas.fused_mlp import fused_sdf_fn

            sdf_fn = fused_sdf_fn(frozen_implicit, implicit_cfg)
        else:
            def sdf_fn(pts):
                return mlp.sdf_vals(frozen, implicit_cfg, pts)[:, 0]

        from .state import TrainState, make_optimizer

        self.tx = make_optimizer(self.tcfg.learning_rate,
                                 self.tcfg.decay_rate,
                                 decay_steps=self.tcfg.steps)
        self.step_fn, self.predict_fn, calibrate = \
            make_material_train_step(
                self.mat_cfg, self.tcfg, sdf_fn, self.emitters.centers,
                self.emitters.radii, self.tx, mesh=self.mesh)
        if self.tcfg.calibrate_emission:
            self.key, k_cal = jax.random.split(self.key)
            params = calibrate(params, self.buffers, k_cal)
        self.state = TrainState(step=jnp.int32(0), params=params,
                                opt_state=self.tx.init(params))
        self.ckpt = CheckpointManager(
            os.path.join(exp_dir, "material", "checkpoints", "orbax"))
        self.plot_dir = os.path.join(exp_dir, "material", "plots")
        os.makedirs(self.plot_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(os.path.join(exp_dir, "tb_material"))
        except Exception:
            self.tb = None
        # persist the emitter set: relight --use_material must shade with
        # the SAME emitters the emission parameters were trained against
        np.savez(os.path.join(exp_dir, "material", "emitters.npz"),
                 centers=np.asarray(self.emitters.centers),
                 radii=np.asarray(self.emitters.radii),
                 init_radiance=np.asarray(self.emitters.radiance))

    # -- validation artifacts ------------------------------------------------

    def render_material_maps(self, view: int = 0, chunk: int = 8192):
        """Full-image kd / roughness / re-rendered maps for one view."""
        g = self.per_image[view]
        H, W = self.data.img_res
        n = g["points"].shape[0]
        kd = np.zeros((n, 3), np.float32)
        rough = np.zeros((n,), np.float32)
        render = np.zeros((n, 3), np.float32)

        if not hasattr(self, "_eval_chunk"):
            predict = self.predict_fn

            @jax.jit
            def eval_chunk(params, key, pts, normals, view_dirs,
                           e_ind=None):
                pred, mats = predict(params, key, pts, normals, view_dirs,
                                     e_ind=e_ind)
                return pred, mats["kd"], mats["rough"]

            self._eval_chunk = eval_chunk
        params = self.state.params

        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            pad = chunk - (e - s)

            def padded(a):
                a = jnp.asarray(a[s:e], jnp.float32)
                return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

            self.key, k = jax.random.split(self.key)
            e_ind_c = (padded(g["e_ind"]) if "e_ind" in g else None)
            pred, kd_c, rough_c = self._eval_chunk(
                params, k, padded(g["points"]), padded(g["normals"]),
                padded(g["view_dirs"]), e_ind=e_ind_c)
            render[s:e] = np.asarray(pred)[: e - s]
            kd[s:e] = np.asarray(kd_c)[: e - s]
            rough[s:e] = np.asarray(rough_c)[: e - s]
        valid = g["valid"][:, None]
        return {
            "kd": (kd * valid).reshape(H, W, 3),
            "rough": (rough * valid[:, 0]).reshape(H, W),
            "render": (render * valid).reshape(H, W, 3),
            "gt": np.asarray(self.data.rgb_images[view]).reshape(H, W, 3),
            "valid": np.asarray(g["valid"]).reshape(H, W),
        }

    def _write_plots(self, step: int, view: int = 0):
        maps = self.render_material_maps(view)
        tag = f"{step:06d}_{view}"
        artifacts.write_rgb(os.path.join(self.plot_dir, f"kd_{tag}.png"),
                            np.clip(maps["kd"], 0, 1))
        artifacts.write_colormap(
            os.path.join(self.plot_dir, f"rough_{tag}.png"), maps["rough"])
        pred = maps["render"]
        gt = maps["gt"]
        if self.data.is_hdr:
            pred, gt = linear_to_srgb(pred), linear_to_srgb(gt)
        artifacts.write_pred_gt_grid(
            os.path.join(self.plot_dir, f"render_{tag}.png"),
            np.clip(pred, 0, 1), np.clip(gt, 0, 1))
        m = maps["valid"]
        mse = float(np.mean((maps["render"] - maps["gt"])[m] ** 2))
        val_psnr = -10.0 * np.log10(max(mse, 1e-12))
        print(f"[material {step}] view {view} re-render PSNR "
              f"{val_psnr:.2f}")
        return val_psnr

    # -- loop ----------------------------------------------------------------

    def resume(self) -> int:
        """Restore the latest material checkpoint; returns its step."""
        self.state, _ = self.ckpt.restore(self.state)
        if self.mesh is not None:
            from ..parallel import replicate_params

            # restored arrays land on one device; re-replicate for DP
            self.state = replicate_params(self.mesh, self.state)
        start = int(self.state.step)
        print(f"[material] resumed from step {start}")
        return start

    def fit(self, max_steps: int | None = None, log_freq: int = 100):
        """Run until global step `max_steps` (or the configured total)."""
        steps = max_steps if max_steps is not None else self.tcfg.steps
        t0 = time.time()
        start = int(self.state.step)
        n_iter = max(steps - start, 0)
        for i in range(n_iter):
            # per-step keys are folded from (base, step), so a resumed
            # run replays the exact key an uninterrupted run would have
            # used — bit-deterministic resume (same scheme as the
            # reconstruction trainer)
            k = jax.random.fold_in(self.loop_key, start + i)
            self.state, metrics = self.step_fn(self.state, self.buffers, k)
            step = int(self.state.step)
            if step % log_freq == 0 or i == n_iter - 1:
                m = {k_: float(v) for k_, v in metrics.items()}
                rate = (step - start) / max(time.time() - t0, 1e-9)
                print(f"[material {step}/{steps}] "
                      f"loss={m['loss']:.4f} rgb={m['rgb_loss']:.4f} "
                      f"psnr={m['psnr']:.2f} ({rate:.1f} steps/s)")
                if self.tb is not None:
                    for name, v in m.items():
                        self.tb.add_scalar(f"material/{name}", v, step)
            if self.tcfg.plot_freq and step % self.tcfg.plot_freq == 0:
                val_psnr = self._write_plots(step)
                if self.tb is not None:
                    self.tb.add_scalar("material/val_psnr", val_psnr,
                                       step)
            if (self.tcfg.checkpoint_freq
                    and step % self.tcfg.checkpoint_freq == 0):
                self.ckpt.save(step, self.state)
        self.ckpt.save(int(self.state.step), self.state)
        self.ckpt.wait_until_finished()  # flush the async final save
        emission = np.asarray(emission_apply(self.state.params["emission"]))
        print(f"[material] done; learned emission = "
              f"{np.round(emission, 4).tolist()}")
        return self.state
