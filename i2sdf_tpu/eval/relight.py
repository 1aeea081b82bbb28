"""Relighting test mode: Monte-Carlo direct lighting of the trained SDF
scene under edited materials / emitters.

The reference's editing branch shipped only scaffolding (its
`RenderingLayer.forward` calls `model.get_incident_radiance`, a method
no in-tree model defines — `/root/reference/model/rendering/__init__.py:42`
— and `main_recon.py` exposes no relight test mode). This module
completes the pipeline so `--test_mode relight` WORKS end to end:

1. Surface extraction: the volume renderer's expected depth + normal map
   per pixel (no extra tracing — reuses the eval render path).
2. Emitters: pixels with a bright light mask are unprojected to world
   points (`rend_util.depth_to_world` parity) and clustered with the
   jit k-means of `ops/clustering.py` (the reference's emitter-cluster
   plan, `/root/reference/model/network/__init__.py:49-75`); each
   cluster becomes a bounding-sphere emitter with the mean HDR radiance
   of its pixels.
3. Materials: kd defaults to the rendered view-independent color, ks /
   roughness to dielectric defaults; `RelightData.edited_materials`
   applies the edit-config override maps
   (`/root/reference/dataset/eval_dataset.py:276-340` parity).
4. Shading: `rendering_layer.shade` (cosine-hemisphere + GGX-VNDF
   importance sampling) with incident radiance = emitter hit *
   SPHERE-TRACED visibility against the learned SDF (fixed-iteration
   `lax.fori_loop` — the TPU form of a data-dependent march).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.recon import ReconData
from ..data.relight import RelightData, RelightVideoData
from ..models import mlp
from ..models.rendering_layer import (RenderingLayerConfig, shade,  # noqa: F401 (shade re-exported for API compat)
                                      shade_emitters)
from ..ops.clustering import init_emission_groups
from ..train.step import make_eval_render_fn
from ..train import artifacts
from ..utils import imaging
from ..utils.cameras import get_camera_params
from ..utils.imaging import linear_to_srgb


class Emitters:
    """Bounding-sphere emitter set: centers (E,3), radii (E,), radiance
    (E,3)."""

    def __init__(self, centers, radii, radiance):
        self.centers = jnp.asarray(centers, jnp.float32)
        self.radii = jnp.asarray(radii, jnp.float32)
        self.radiance = jnp.asarray(radiance, jnp.float32)

    @property
    def count(self) -> int:
        return int(self.centers.shape[0])


def find_emitters(rd: ReconData, n_emitters: int = 1,
                  emitter_scale: float = 1.0, mask_thresh: float = 0.5,
                  max_points: int = 50_000, key=None) -> Emitters:
    """Cluster bright light-mask pixels (unprojected by GT depth) into
    sphere emitters with the mean HDR radiance of their pixels."""
    if rd.lightmask_images is None:
        raise ValueError("relight needs a light_mask dataset "
                         "(dataset has none)")
    if rd.depth_images is None:
        raise ValueError("relight needs GT depth to place emitters")
    from ..data.recon import _depth_to_world_np

    key = key if key is not None else jax.random.PRNGKey(0)

    def collect(selector):
        pts, rgbs = [], []
        for i in range(rd.n_images):
            dm = np.asarray(rd.depth_masks[i]).reshape(-1)
            sel = selector(i) & dm
            if not sel.any():
                continue
            pts.append(_depth_to_world_np(
                rd.uv, rd.intrinsics_all[i], rd.pose_all[i],
                rd.depth_images[i], sel))
            rgbs.append(np.asarray(rd.rgb_images[i]).reshape(-1, 3)[sel])
        return pts, rgbs

    pts, rgbs = collect(
        lambda i: np.asarray(rd.lightmask_images[i]).reshape(-1)
        > mask_thresh)
    if not pts:
        # no masked emitter pixels visible from any view: fall back to
        # the brightest 0.2% of pixels (directly lit / emissive areas)
        lum = np.asarray(rd.rgb_images).reshape(rd.n_images, -1, 3).mean(-1)
        cut = np.quantile(lum, 0.998)
        print("[relight] WARN: no light-mask pixels above threshold; "
              f"falling back to brightest pixels (luminance > {cut:.3f})")
        pts, rgbs = collect(lambda i: lum[i] >= cut)
    if not pts:
        raise ValueError("no emitter pixels found; cannot build emitters")
    return _cluster_emitters(np.concatenate(pts), np.concatenate(rgbs),
                             n_emitters, emitter_scale, max_points, key)


def _cluster_emitters(pts, rgbs, n_emitters, emitter_scale, max_points,
                      key) -> Emitters:
    """k-means the candidate emissive points into bounding-sphere
    emitters: radius = 0.9-quantile distance to centroid, radiance =
    mean pixel color (the cluster half shared by GT-mask and
    model-predicted discovery)."""
    if len(pts) > max_points:
        idx = np.random.default_rng(0).permutation(len(pts))[:max_points]
        pts, rgbs = pts[idx], rgbs[idx]

    labels, centers, _ = init_emission_groups(
        key, jnp.asarray(pts, jnp.float32), n_emitters)
    labels = np.asarray(labels)
    centers = np.asarray(centers)
    radii = np.empty(n_emitters, np.float32)
    radiance = np.empty((n_emitters, 3), np.float32)
    for e in range(n_emitters):
        sel = labels == e
        if not sel.any():  # degenerate cluster: keep a tiny dark emitter
            radii[e], radiance[e] = 1e-3, 0.0
            continue
        d = np.linalg.norm(pts[sel] - centers[e], axis=-1)
        radii[e] = max(float(np.quantile(d, 0.9)), 1e-3)
        radiance[e] = rgbs[sel].mean(0) * emitter_scale
    return Emitters(centers, radii, radiance)


def sphere_trace_visibility(sdf_fn, origins, dirs, t_max,
                            n_steps: int = 32, eps: float = 2e-3,
                            t0: float = 2e-2):
    """1 where the segment [t0, t_max] is unoccluded, else 0.

    Sphere tracing with the step FLOORED at t_max/n_steps, so the march
    is guaranteed to span the whole segment within the fixed iteration
    budget; occlusion means the CLOSEST APPROACH came within eps of a
    surface (min sampled sdf < eps — catches both penetration and
    surfaces the sphere steps converge onto without ever sampling
    inside, e.g. occluders thinner than the floor hit dead-center). A
    pure eps-floored march (the earlier design) stalls inside the wide
    low-|sdf| band of a partially-trained SDF and wrongly reports
    occlusion for most rays — measured on the editing demo: visibility
    collapsed, the ambient term absorbed all direct light, and the
    relit images came out structureless. Sub-floor features can still
    be stepped across off-center (a softened shadow edge); raise
    vis_steps to trade time for shadow fidelity."""
    t_max = jnp.maximum(t_max, t0)
    floor = t_max / n_steps

    def body(_, carry):
        t, min_s = carry
        pts = origins + t[:, None] * dirs
        s = sdf_fn(pts)
        min_s = jnp.minimum(min_s, s)
        t = jnp.minimum(t + jnp.maximum(s, floor), t_max)
        return t, min_s

    _, min_s = jax.lax.fori_loop(
        0, n_steps, body,
        (jnp.full(origins.shape[:1], t0),
         jnp.full(origins.shape[:1], jnp.inf)))
    return (min_s > eps).astype(jnp.float32)


def find_emitters_from_model(params, render_image, pd, n_emitters: int = 1,
                             emitter_scale: float = 1.0,
                             mask_thresh: float | None = None,
                             rel_thresh: float = 0.5,
                             min_mask: float = 0.02,
                             max_points: int = 50_000,
                             key=None) -> Emitters:
    """Cluster emitters from the MODEL's own predictions: the trained
    light-mask head marks emissive pixels and the rendered expected
    depth unprojects them — no GT light masks or GT depth needed (the
    reference's emitter plan, `model/network/__init__.py:49-75`, only
    ever clustered GT-masked pixels). Requires a model built with a
    `light_network`; `pd` is any dataset with `image_inputs`
    (PlotData/RelightData).

    Thresholding is RELATIVE by default (pixels above
    `rel_thresh * global max`, floored at `min_mask`): the rendered
    mask Sum(w * m) is bounded by weight_sum and smoothed over the ray,
    so a well-trained head on a small fixture peaks well below 1.0
    (measured 0.11 at the fixture vs 0.03 elsewhere after 2k tiny
    steps) — but discriminates cleanly. Pass `mask_thresh` for an
    absolute cutoff instead. Radiance per emitter is the mean RENDERED
    color of its pixels (times `emitter_scale`), refined by the
    material stage's emission calibration when one is trained."""
    key = key if key is not None else jax.random.PRNGKey(0)
    # a view subset locates the clusters at a fraction of a full
    # dataset sweep (real captures have hundreds of frames)
    max_views = 16
    if pd.n_images > max_views:
        view_ids = np.linspace(0, pd.n_images - 1, max_views).astype(int)
        print(f"[relight] model-head discovery over {max_views} of "
              f"{pd.n_images} views")
    else:
        view_ids = range(pd.n_images)
    views = []
    for i in view_ids:
        uv, K, pose, _ = pd.image_inputs(i)
        out = render_image(params, jnp.asarray(uv), jnp.asarray(K),
                           jnp.asarray(pose))
        if "light_mask" not in out:
            raise ValueError("find_emitters_from_model needs a model "
                             "with a light_network head")
        ray_dirs, cam_loc = get_camera_params(
            jnp.asarray(uv)[None], jnp.asarray(pose)[None],
            jnp.asarray(K)[None])
        norms = jnp.linalg.norm(ray_dirs[0], axis=-1, keepdims=True)
        units = ray_dirs[0] / jnp.maximum(norms, 1e-12)
        dist = out["depth_values"].reshape(-1) * norms[:, 0]
        p = np.asarray(cam_loc[0][None, :] + dist[:, None] * units)
        lm = np.asarray(out["light_mask"]).reshape(-1)
        wsum = np.asarray(out["weight_sum"]).reshape(-1)
        rgb = np.asarray(out["rgb_values"]).reshape(-1, 3)
        views.append((lm, wsum, p, rgb))

    if mask_thresh is None:
        # max over ELIGIBLE pixels only (wsum > 0.5 — the same gate the
        # selection applies): a high-mask/low-weight background ray
        # would otherwise inflate the threshold past every selectable
        # pixel and the discovery would report an untrained head
        gmax = 0.0
        for lm, wsum, _, _ in views:
            elig = lm[wsum > 0.5]
            if elig.size:
                gmax = max(gmax, float(elig.max()))
        mask_thresh = max(min_mask, rel_thresh * gmax)
    pts, rgbs = [], []
    for lm, wsum, p, rgb in views:
        sel = (lm > mask_thresh) & (wsum > 0.5)
        if sel.any():
            pts.append(p[sel])
            rgbs.append(rgb[sel])
    if not pts:
        raise ValueError(
            "model predicts no emissive pixels above "
            f"{mask_thresh:.3f} in any view (is the light head trained?)")
    return _cluster_emitters(np.concatenate(pts), np.concatenate(rgbs),
                             n_emitters, emitter_scale, max_points, key)


# shared emitter-ball margin: carve_emitters_sdf's free-space shell and
# the material trainer's baked-point exclusion must agree, or boundary
# points end up trained with self-shadowed visibility
EMITTER_MARGIN = 0.05


def carve_emitters_sdf(sdf_fn, centers, radii,
                       margin: float = EMITTER_MARGIN):
    """Wrap `sdf_fn` so the inside of every emitter ball (plus `margin`)
    reads as FREE SPACE for visibility tracing.

    Emitters discovered from light masks sit ON scene surfaces (a panel
    in the ceiling, a lamp against a wall), so the emitting surface
    itself — and the wall it is mounted in, inside the cluster's
    bounding ball — must not occlude its own light. Without the carve,
    NEE visibility toward a surface-mounted emitter terminates on that
    very surface and reports ~total occlusion (measured on the editing
    demo: true-SDF visibility toward the mask-clustered ceiling emitter
    was 0.009, direct light vanished, and the ambient term absorbed the
    whole image). The margin also keeps the march's min-SDF test clear
    of the ~0 band right at the carve boundary."""
    centers = jnp.asarray(centers, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)

    def carved(pts):
        s = sdf_fn(pts)
        for e in range(centers.shape[0]):
            inside = (radii[e] + margin
                      - jnp.linalg.norm(pts - centers[e][None], axis=-1))
            s = jnp.maximum(s, inside)
        return s

    return carved


def incident_radiance(sdf_fn, centers, radii, radiance, points, dirs,
                      n_steps: int = 32):
    """(N, 3) incoming radiance at `points` along `dirs`: per-emitter
    ray-sphere intersection gated by sphere-traced visibility.

    `radiance` (E, 3) is an ordinary traced argument, so gradients flow
    through it — the material-optimization stage (train/material.py)
    learns per-emitter emission this way (the reference's dead
    per-emitter learnable emission params,
    `/root/reference/model/network/__init__.py:49-75`)."""
    n_emitters = centers.shape[0]
    sdf_fn = carve_emitters_sdf(sdf_fn, centers, radii)
    total = jnp.zeros_like(points)
    for e in range(n_emitters):
        oc = points - centers[e]
        b = jnp.sum(oc * dirs, -1)
        c = jnp.sum(oc * oc, -1) - radii[e] ** 2
        disc = b * b - c
        t_hit = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        inside = c < 0.0  # shading point inside the emitter sphere
        hits = ((disc > 0.0) & (t_hit > 1e-3)) | inside
        # trace only up to just outside the emitter surface
        t_cap = jnp.where(hits, jnp.maximum(t_hit * 0.98, 1e-3), 1e-3)
        vis = sphere_trace_visibility(sdf_fn, points, dirs, t_cap,
                                      n_steps=n_steps)
        vis = jnp.where(inside, 1.0, vis)
        total = total + (radiance[e][None, :]
                         * hits[:, None] * vis[:, None])
    return total


def make_incident_radiance_fn(sdf_fn, emitters: Emitters,
                              n_steps: int = 32):
    """(points, dirs) -> (N, 3) incoming radiance with the emitter set
    closed over as constants (the relight eval path)."""

    def li(points, dirs):
        return incident_radiance(sdf_fn, emitters.centers, emitters.radii,
                                 emitters.radiance, points, dirs,
                                 n_steps=n_steps)

    return li


class _RelightContext:
    """Shared setup for the relight renderers: emitter set, eval render
    fn, jitted NEE shading chunk, and (optionally) the trained material
    stage."""

    def __init__(self, params, model_cfg, conf, data_root, n_emitters,
                 emitter_scale, spp, vis_steps, fused, material,
                 full_res=False, edit_conf=None, indirect_spp=None):
        self.params = params
        self.model_cfg = model_cfg
        dataset_conf = dict(conf.dataset)
        self.scan_id = dataset_conf.pop("scan_id", 0)
        ds = dataset_conf.pop("downsample", 1)  # always pop: also
        self.downsample = 1 if full_res else ds  # passed explicitly
        dataset_conf.pop("data_root", None)
        self.dataset_conf = dataset_conf
        self.data_root = data_root

        self.render_image, _ = make_eval_render_fn(
            model_cfg, chunk_size=conf.train.get("split_n_pixels", 12000),
            fused_sampler=fused)

        if material is not None:
            self.mat_params, self.mat_cfg, self.emitters = material
            print("[relight] using trained material stage; "
                  f"{self.emitters.count} emitters with learned emission")
        else:
            self.mat_params = self.mat_cfg = None
            try:
                rd = ReconData(scan_id=self.scan_id, data_root=data_root,
                               use_depth=True, use_normal=False,
                               use_bubble=False, use_lightmask=True,
                               **{k: v for k, v in dataset_conf.items()
                                  if k in ("data_dir", "img_res")})
                self.emitters = find_emitters(
                    rd, n_emitters=n_emitters,
                    emitter_scale=emitter_scale)
            except (ValueError, AssertionError, FileNotFoundError) as e:
                # scans without GT light masks / depth: discover the
                # emitters from the model's OWN light-mask head and
                # rendered depth (needs a light_network model)
                if model_cfg.light is None:
                    raise
                print(f"[relight] GT-mask emitter discovery failed "
                      f"({e}); falling back to the model's light head")
                from ..data.plot import PlotData

                pd0 = PlotData(scan_id=self.scan_id, data_root=data_root,
                               downsample=self.downsample, plot_nimgs=-1,
                               **dataset_conf)
                self.emitters = find_emitters_from_model(
                    params, self.render_image, pd0,
                    n_emitters=n_emitters, emitter_scale=emitter_scale)
        # LIGHT edits from the edit config: `emission_scale` (scalar or
        # per-channel [r,g,b]) rescales every emitter's radiance —
        # recolor/dim/boost the light without touching materials. The
        # material override maps in the same file are handled by
        # RelightData; this is the emitter half of the paper's
        # scene-editing story.
        if edit_conf and edit_conf.get("emission_scale") is not None:
            s = jnp.asarray(edit_conf["emission_scale"], jnp.float32)
            self.emitters = Emitters(self.emitters.centers,
                                     self.emitters.radii,
                                     self.emitters.radiance * s)
            print(f"[relight] emission_scale applied: "
                  f"{np.asarray(s).tolist()}")
        print(f"[relight] {self.emitters.count} emitters; centers="
              f"{np.round(np.asarray(self.emitters.centers), 3).tolist()}")

        def sdf_fn(pts):
            return mlp.sdf_vals(params["implicit"], model_cfg.implicit,
                                pts)[:, 0]

        vis_sdf = carve_emitters_sdf(sdf_fn, self.emitters.centers,
                                     self.emitters.radii)

        def vis_fn(pts, dirs, t_max):
            return sphere_trace_visibility(vis_sdf, pts, dirs, t_max,
                                           n_steps=vis_steps)

        # learned ambient irradiance (indirect-light approximation) when
        # a trained material stage is supplied; zero otherwise
        if material is not None:
            from ..models.material import ambient_apply

            ambient = ambient_apply(self.mat_params["emission"])
        else:
            ambient = jnp.zeros((3,), jnp.float32)
        layer_cfg = RenderingLayerConfig(spp=spp)
        emitters = self.emitters

        # one-bounce indirect from the trained radiance field (the
        # reference editing design's `get_incident_radiance`,
        # `/root/reference/model/rendering/__init__.py:42,75-78`;
        # models/indirect.py): secondary cosine-sampled rays that miss
        # every emitter pick up the field's radiance at their SDF hit.
        # Config: `material.indirect_spp` (or the explicit arg); 0 keeps
        # the constant-ambient approximation. Note the field shades with
        # the ORIGINAL materials — after a material edit the bounce is
        # one edit behind, the inherent one-bounce-from-field limit.
        if indirect_spp is None:
            indirect_spp = int((conf.get("material", {}) or {})
                               .get("indirect_spp", 0))
        self.indirect_spp = indirect_spp
        if indirect_spp > 0:
            from ..models.indirect import (indirect_irradiance,
                                           make_field_radiance_fn)

            field_fn = make_field_radiance_fn(params, model_cfg)
            print(f"[relight] one-bounce field indirect at "
                  f"{indirect_spp} spp")

        @jax.jit
        def shade_chunk(key, pts, normals, view_dirs, kd, ks, rough):
            # next-event estimation (shade_emitters): guaranteed emitter
            # hits — far lower variance than BRDF sampling at equal spp
            # for compact lights (measured ~450x at spp 8)
            k_nee, k_ind = jax.random.split(key)
            out = shade_emitters(layer_cfg, k_nee, pts, normals,
                                 view_dirs, kd, ks, rough,
                                 emitters.centers, emitters.radii,
                                 emitters.radiance, visibility_fn=vis_fn)
            irr = jnp.broadcast_to(ambient[None], pts.shape)
            if indirect_spp > 0:
                irr = irr + indirect_irradiance(
                    field_fn, k_ind, pts, normals, spp=indirect_spp,
                    emitter_centers=emitters.centers,
                    emitter_radii=emitters.radii)
            out["color_diffuse"] = out["color_diffuse"] + kd * irr
            return out

        self.shade_chunk = shade_chunk

    def shade_view(self, pd, uv, K, pose, key, chunk):
        """Extract surface geometry for one camera, apply (edited)
        materials, and shade. Returns (relit, diffuse, specular) flat
        (HW, 3) arrays in linear radiance."""
        out = self.render_image(self.params, jnp.asarray(uv),
                                jnp.asarray(K), jnp.asarray(pose))
        ray_dirs, cam_loc = get_camera_params(
            jnp.asarray(uv)[None], jnp.asarray(pose)[None],
            jnp.asarray(K)[None])
        norms = jnp.linalg.norm(ray_dirs[0], axis=-1, keepdims=True)
        units = ray_dirs[0] / jnp.maximum(norms, 1e-12)
        dist = out["depth_values"].reshape(-1) * norms[:, 0]
        pts = cam_loc[0][None, :] + dist[:, None] * units
        view_dirs = -units  # toward the camera
        normals = out["normal_map"].reshape(-1, 3)

        if self.mat_params is not None:
            from ..models.material import material_net_apply

            mats = material_net_apply(self.mat_params["material"],
                                      self.mat_cfg, jnp.asarray(pts))
            kd = np.asarray(mats["kd"])
            ks = np.asarray(mats["ks"])
            rough = np.asarray(mats["rough"]).astype(np.float32)
        else:
            kd = np.clip(np.asarray(out["rgb_values"]).reshape(-1, 3),
                         0, 1)
            ks = np.full_like(kd, 0.04)
            rough = np.full(kd.shape[0], 0.5, np.float32)
        nrm = np.asarray(normals)
        mats = pd.edited_materials(kd, ks, rough[:, None], nrm)
        kd, ks = mats["kd"], mats["ks"]
        rough = mats["rough"].reshape(-1)
        normals = jnp.asarray(mats["normal"])
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)

        n = kd.shape[0]
        diff = np.empty((n, 3), np.float32)
        spec = np.empty((n, 3), np.float32)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            pad = chunk - (e - s)
            sl = slice(s, e)
            key, k = jax.random.split(key)

            def padded(a):
                a = jnp.asarray(a[sl], jnp.float32)
                return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

            o = self.shade_chunk(k, padded(np.asarray(pts)),
                                 padded(np.asarray(normals)),
                                 padded(np.asarray(view_dirs)),
                                 padded(kd), padded(ks), padded(rough))
            diff[sl] = np.asarray(o["color_diffuse"])[: e - s]
            spec[sl] = np.asarray(o["color_specular"])[: e - s]

        relit = diff + spec
        # emitting surfaces render at their (edited) emission — a pixel
        # on the fixture shows the light itself, not a shaded material.
        # Painted at the EXACT cluster radius (no margin): cluster radii
        # already tend to overestimate the physical fixture, and every
        # painted pixel shows as a flat emission-colored blob
        P = np.asarray(pts)
        for e in range(self.emitters.count):
            on_emitter = (np.linalg.norm(
                P - np.asarray(self.emitters.centers)[e], axis=-1)
                < float(np.asarray(self.emitters.radii)[e]))
            relit = np.where(
                on_emitter[:, None],
                np.asarray(self.emitters.radiance)[e][None], relit)
        return relit, diff, spec


def run_relight(params, model_cfg, conf, exp_dir: str,
                data_root: str = "data", indices=None, spp: int = 16,
                n_emitters: int = 1, emitter_scale: float = 1.0,
                edit_conf: dict | None = None, fused: bool | None = None,
                full_res: bool = False, chunk: int = 4096,
                vis_steps: int = 32, seed: int = 0,
                material=None, indirect_spp: int | None = None) -> dict:
    """Render relit images for every (or `indices`) viewpoint. Writes
    `eval/relight/{tag}_relit.png|_diffuse.png|_specular.png` and
    returns the emitter summary.

    `material` (optional): a `(mat_params, MaterialNetConfig, Emitters)`
    triple from `train.material.load_material_stage` — kd/ks/roughness
    come from the LEARNED field and emitters carry the LEARNED emission,
    instead of the heuristic defaults (kd = rendered color, dielectric
    ks). This is the full recon -> material -> edit pipeline."""
    ctx = _RelightContext(params, model_cfg, conf, data_root, n_emitters,
                          emitter_scale, spp, vis_steps, fused, material,
                          full_res=full_res, edit_conf=edit_conf,
                          indirect_spp=indirect_spp)
    pd = RelightData(scan_id=ctx.scan_id, data_root=data_root,
                     downsample=ctx.downsample, indices=indices,
                     plot_nimgs=-1, edit_conf=edit_conf,
                     **ctx.dataset_conf)

    out_dir = os.path.join(exp_dir, "eval", "relight")
    os.makedirs(out_dir, exist_ok=True)
    H, W = pd.img_res
    key = jax.random.PRNGKey(seed)
    ids = indices if indices is not None else range(pd.n_images)
    results = []
    for row, idx in enumerate(ids):
        uv, K, pose, _ = pd.image_inputs(row)
        key, k = jax.random.split(key)
        relit, diff, spec = ctx.shade_view(pd, uv, K, pose, k, chunk)
        tag = f"{idx:04d}"
        for name, img in (("relit", relit), ("diffuse", diff),
                          ("specular", spec)):
            artifacts.write_rgb(
                os.path.join(out_dir, f"{tag}_{name}.png"),
                np.clip(linear_to_srgb(img.reshape(H, W, 3)), 0, 1))
        # linear radiance for radiometric consumers (EXR via the native
        # codec; .npy fallback), matching render mode's EXR outputs
        imaging.write_exr_or_npy(
            os.path.join(out_dir, f"{tag}_relit.exr"),
            relit.reshape(H, W, 3).astype(np.float32))
        results.append({"idx": idx, "mean_radiance": float(relit.mean())})
        print(f"[relight {tag}] mean={relit.mean():.4f}")

    return {"emitters": ctx.emitters.count, "images": results,
            "out_dir": out_dir}


def run_relight_video(params, model_cfg, conf, exp_dir: str,
                      id0: int = 0, id1: int = 1, n_frames: int = 60,
                      frame_rate: int = 24, data_root: str = "data",
                      spp: int = 16, n_emitters: int = 1,
                      emitter_scale: float = 1.0,
                      edit_conf: dict | None = None,
                      fused: bool | None = None, full_res: bool = False,
                      chunk: int = 4096,
                      vis_steps: int = 32, seed: int = 0,
                      material=None,
                      indirect_spp: int | None = None) -> dict:
    """Relit flythrough between two training poses (the reference's
    RelightVideoDataset, `/root/reference/dataset/eval_dataset.py:341-374`,
    driven by a renderer its editing branch never shipped): slerp+lerp
    interpolated cameras, each frame surface-extracted and NEE-shaded
    under the (edited) emitters, assembled to mp4 when ffmpeg exists."""
    from .interpolate import frames_to_video

    ctx = _RelightContext(params, model_cfg, conf, data_root, n_emitters,
                          emitter_scale, spp, vis_steps, fused, material,
                          full_res=full_res, edit_conf=edit_conf,
                          indirect_spp=indirect_spp)
    pd = RelightVideoData(scan_id=ctx.scan_id, data_root=data_root,
                          downsample=ctx.downsample, plot_nimgs=-1,
                          edit_conf=edit_conf, id0=id0, id1=id1,
                          num_frames=n_frames, **ctx.dataset_conf)

    frame_dir = os.path.join(exp_dir, "eval", "relight_video",
                             f"{id0:04d}_{id1:04d}")
    os.makedirs(frame_dir, exist_ok=True)
    H, W = pd.img_res
    key = jax.random.PRNGKey(seed)
    means = []
    for i in range(pd.num_frames):
        uv, K, pose = pd.frame_inputs(i)
        key, k = jax.random.split(key)
        relit, _, _ = ctx.shade_view(pd, uv, K, pose, k, chunk)
        artifacts.write_rgb(
            os.path.join(frame_dir, f"{i:04d}.png"),
            np.clip(linear_to_srgb(relit.reshape(H, W, 3)), 0, 1))
        means.append(float(relit.mean()))
        print(f"[relight-video {i + 1}/{pd.num_frames}] "
              f"mean={means[-1]:.4f}")
    mp4 = os.path.join(exp_dir, "eval", "relight_video",
                       f"relight_{id0:04d}_{id1:04d}.mp4")
    wrote_video = frames_to_video(frame_dir, mp4, frame_rate)
    return {"emitters": ctx.emitters.count, "frames": pd.num_frames,
            "frame_dir": frame_dir, "mean_radiance": means,
            "mp4": mp4 if wrote_video else None}
