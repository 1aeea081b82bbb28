"""Monte-Carlo direct-lighting shading layer (editing-branch scaffold).

Capability parity with `/root/reference/model/rendering/__init__.py:10-89`
(RenderingLayer): per-shading-point importance sampling of the BRDF —
diffuse (cosine hemisphere) vs specular (GGX VNDF) events chosen by
luminance — with secondary rays shaded by a caller-provided
`incident_radiance_fn` (the reference calls `model.get_incident_radiance`,
a method no in-tree model defines; the editing branch is unreleased).

TPU-first: the reference loops spp times appending tensors
(`rendering/__init__.py:30-76`); here spp is a vmapped leading axis of
one fused program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import brdf


@dataclasses.dataclass(frozen=True)
class RenderingLayerConfig:
    spp: int = 64
    diffuse_model: str = "lambert"  # 'lambert' | 'disney'
    # Detach the importance-sampling distribution (event choice, sampled
    # directions, pdf) from the autodiff graph, differentiating only the
    # BRDF value f and the incident radiance. This is the standard
    # biased-but-stable estimator for inverse rendering: the score-
    # function term of d/dtheta E_{l~pdf_theta}[f/pdf] is dropped, which
    # avoids the high-variance 1/pdf^2 gradients near grazing samples.
    # Off for forward rendering (relight), on for material optimization.
    detach_sampling: bool = False


def shade(cfg: RenderingLayerConfig, key, points, normals, view_dirs,
          kd, ks, roughness, incident_radiance_fn):
    """Estimate diffuse/specular outgoing radiance at each point.

    points/normals/view_dirs: (N, 3); kd/ks: (N, 3); roughness: (N,).
    `incident_radiance_fn(points, dirs) -> (N, 3)` evaluates incoming
    radiance along secondary rays (e.g. emitter clusters or an
    environment model).
    Returns dict(color_diffuse (N, 3), color_specular (N, 3)).
    """
    n_pts = points.shape[0]
    if cfg.detach_sampling:
        kd_s, ks_s, rough_s = map(jax.lax.stop_gradient,
                                  (kd, ks, roughness))
    else:
        kd_s, ks_s, rough_s = kd, ks, roughness
    p_spec = brdf.specular_event_probability(kd_s, ks_s)  # (N,)

    def one_sample(k):
        k_ev, k_diff, k_spec = jax.random.split(k, 3)
        ev = jax.random.uniform(k_ev, (n_pts,))
        take_spec = ev < p_spec

        l_diff, _ = brdf.sample_cosine_hemisphere(k_diff, normals)
        l_spec, _ = brdf.sample_ggx_vndf(k_spec, normals, view_dirs,
                                         rough_s)
        l = jnp.where(take_spec[:, None], l_spec, l_diff)

        cos_l = jnp.clip(jnp.sum(normals * l, -1), 0.0, 1.0)
        pdf = brdf.combined_pdf(kd_s, ks_s, rough_s, normals, view_dirs, l)
        li = incident_radiance_fn(points, l)

        w = (cos_l / jnp.maximum(pdf, 1e-6))[:, None]
        diff_f = (brdf.eval_disney_diffuse(
            kd, roughness,
            jnp.clip(jnp.sum(normals * view_dirs, -1), 0, 1), cos_l,
            jnp.clip(jnp.sum(view_dirs * brdf.safe_normalize(
                view_dirs + l), -1), 0, 1))
            if cfg.diffuse_model == "disney" else
            jnp.broadcast_to(brdf.eval_lambert(kd), kd.shape))
        spec_f = brdf.eval_ggx_specular(ks, roughness, normals, view_dirs, l)
        valid = (cos_l > 0)[:, None]
        return (jnp.where(valid, li * diff_f * w, 0.0),
                jnp.where(valid, li * spec_f * w, 0.0))

    keys = jax.random.split(key, cfg.spp)
    diff, spec = jax.vmap(one_sample)(keys)
    return {
        "color_diffuse": diff.mean(0),
        "color_specular": spec.mean(0),
    }


def shade_emitters(cfg: RenderingLayerConfig, key, points, normals,
                   view_dirs, kd, ks, roughness, centers, radii, radiance,
                   visibility_fn=None):
    """Direct lighting from sphere emitters via NEXT-EVENT ESTIMATION.

    `shade` importance-samples the BRDF, so a compact emitter (small
    solid angle) is hit by almost no samples — measured near-zero
    gradient signal for material optimization on the demo scene, where
    the light subtends ~2% of the hemisphere from the far walls. Here
    each sample is drawn uniformly inside the emitter's cone (guaranteed
    hit), weighted by the cone solid angle: the standard low-variance
    estimator for direct lighting from compact lights.

    centers (E,3), radii (E,), radiance (E,3).
    `visibility_fn(points, dirs, t_max) -> (N,)` in [0,1] (e.g. the
    sphere-traced SDF occlusion of eval/relight.py); None = unoccluded.
    Returns dict(color_diffuse, color_specular) — the same contract as
    `shade`.
    """
    n_pts = points.shape[0]
    n_emitters = centers.shape[0]
    # note: cfg.detach_sampling is irrelevant here — the cone pdf is
    # pure emitter geometry, so no sampling quantity depends on the
    # materials and every BRDF evaluation stays live for gradients

    diff_total = jnp.zeros_like(kd)
    spec_total = jnp.zeros_like(kd)
    for e in range(n_emitters):
        to_c = centers[e] - points
        dist = jnp.linalg.norm(to_c, axis=-1)
        axis = to_c / jnp.maximum(dist, 1e-9)[:, None]
        sin_h = jnp.clip(radii[e] / jnp.maximum(dist, 1e-9), 0.0, 1.0)
        inside = dist < radii[e]
        # inside the emitter: every direction exits through it — sample
        # the full sphere (cos_half = -1)
        cos_h = jnp.where(inside, -1.0,
                          jnp.sqrt(jnp.maximum(1.0 - sin_h ** 2, 0.0)))

        def one_sample(k, axis=axis, cos_h=cos_h, inside=inside,
                       dist=dist, e=e):
            l, pdf = brdf.sample_uniform_cone(k, axis, cos_h)
            cos_l = jnp.clip(jnp.sum(normals * l, -1), 0.0, 1.0)
            if visibility_fn is None:
                vis = jnp.ones(n_pts)
            else:
                # trace up to just before the emitter surface; the cone
                # guarantees the ray hits the sphere, so the first
                # ray-sphere root bounds the march
                oc = points - centers[e]
                b = jnp.sum(oc * l, -1)
                c = jnp.sum(oc * oc, -1) - radii[e] ** 2
                disc = jnp.maximum(b * b - c, 0.0)
                t_hit = jnp.maximum(-b - jnp.sqrt(disc), 1e-3)
                vis = visibility_fn(points, l, t_hit * 0.98)
                vis = jnp.where(inside, 1.0, vis)
            w = (cos_l / pdf * vis)[:, None]
            diff_f = (brdf.eval_disney_diffuse(
                kd, roughness,
                jnp.clip(jnp.sum(normals * view_dirs, -1), 0, 1), cos_l,
                jnp.clip(jnp.sum(view_dirs * brdf.safe_normalize(
                    view_dirs + l), -1), 0, 1))
                if cfg.diffuse_model == "disney" else
                jnp.broadcast_to(brdf.eval_lambert(kd), kd.shape))
            spec_f = brdf.eval_ggx_specular(ks, roughness, normals,
                                            view_dirs, l)
            valid = (cos_l > 0)[:, None]
            li = radiance[e][None, :]
            return (jnp.where(valid, li * diff_f * w, 0.0),
                    jnp.where(valid, li * spec_f * w, 0.0))

        keys = jax.random.split(jax.random.fold_in(key, e), cfg.spp)
        d, s = jax.vmap(one_sample)(keys)
        diff_total = diff_total + d.mean(0)
        spec_total = spec_total + s.mean(0)
    return {"color_diffuse": diff_total, "color_specular": spec_total}
