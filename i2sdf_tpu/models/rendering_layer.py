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
