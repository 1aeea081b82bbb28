"""Physically-based BRDF library: GGX microfacet + Disney diffuse,
importance sampling, and pdfs — pure functions over batched arrays.

Capability parity with `/root/reference/model/rendering/brdf.py:1-360`
(the scaffolding of the unreleased intrinsic-decomposition / editing
branch; ships dead-code in the reference and is inventoried in
SURVEY.md §2 #22). Everything here is elementwise/batched math that
vmaps over samples-per-pixel and fuses under jit — no per-sample Python.

Conventions: normals unit, view/light directions point away from the
surface, all shapes broadcast over leading batch dims.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.jmath import safe_normalize


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------


def build_onb(n: jnp.ndarray):
    """Branchless orthonormal basis from a unit normal (Duff et al. 2017,
    the construction the reference uses at brdf.py:5-17).

    Returns (t, b) with [t, b, n] right-handed.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    bb = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * bb,
                   -s * n[..., 0]], axis=-1)
    b = jnp.stack([bb, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, b


def to_local(v, n):
    t, b = build_onb(n)
    return jnp.stack([jnp.sum(v * t, -1), jnp.sum(v * b, -1),
                      jnp.sum(v * n, -1)], axis=-1)


def to_world(v_local, n):
    t, b = build_onb(n)
    return (v_local[..., 0:1] * t + v_local[..., 1:2] * b
            + v_local[..., 2:3] * n)


# ---------------------------------------------------------------------------
# Parameter conversion
# ---------------------------------------------------------------------------


def metallic_to_kd_ks(albedo, metallic, specular: float = 0.5):
    """Disney-style basecolor/metallic -> diffuse/specular colors
    (parity brdf.py:20-32)."""
    ks = (1.0 - metallic) * 0.08 * specular + metallic * albedo
    kd = (1.0 - metallic) * albedo
    return kd, ks


def luminance(rgb):
    w = jnp.asarray([0.2126, 0.7152, 0.0722], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


# ---------------------------------------------------------------------------
# Fresnel / shadowing / distribution
# ---------------------------------------------------------------------------


def fresnel_schlick(f0, cos_theta):
    """Schlick with a "shadowed F90" term that dims grazing highlights
    for very dark f0 (parity brdf.py:241-265)."""
    f90 = jnp.clip(luminance(f0)[..., None] * 50.0, 0.0, 1.0)
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (f90 - f0) * (m**5)[..., None] if cos_theta.ndim < f0.ndim \
        else f0 + (f90 - f0) * (m**5)


def ggx_ndf(cos_h, alpha):
    a2 = alpha * alpha
    d = cos_h * cos_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(math.pi * d * d, 1e-9)


def smith_g1(cos_v, alpha):
    a2 = alpha * alpha
    return 2.0 * cos_v / jnp.maximum(
        cos_v + jnp.sqrt(a2 + (1 - a2) * cos_v * cos_v), 1e-9)


def smith_g2(cos_v, cos_l, alpha):
    """Height-correlated Smith masking-shadowing."""
    a2 = alpha * alpha

    def lam(c):
        return jnp.sqrt(a2 + (1 - a2) * c * c)

    return (2.0 * cos_v * cos_l
            / jnp.maximum(cos_l * lam(cos_v) + cos_v * lam(cos_l), 1e-9))


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def eval_lambert(kd):
    return kd / math.pi


def eval_disney_diffuse(kd, roughness, cos_v, cos_l, cos_d):
    """Disney retro-reflective diffuse (parity brdf.py:72-161 family)."""
    f90 = 0.5 + 2.0 * roughness * cos_d * cos_d
    fv = 1.0 + (f90 - 1.0) * (1.0 - cos_v) ** 5
    fl = 1.0 + (f90 - 1.0) * (1.0 - cos_l) ** 5
    return kd / math.pi * (fv * fl)[..., None]


def eval_ggx_specular(ks, roughness, n, v, l):
    """Full microfacet specular: D * G2 * F / (4 cosV cosL)."""
    alpha = jnp.maximum(roughness * roughness, 1e-3)
    h = safe_normalize(v + l)
    cos_v = jnp.clip(jnp.sum(n * v, -1), 1e-6, 1.0)
    cos_l = jnp.clip(jnp.sum(n * l, -1), 1e-6, 1.0)
    cos_h = jnp.clip(jnp.sum(n * h, -1), 0.0, 1.0)
    cos_d = jnp.clip(jnp.sum(v * h, -1), 0.0, 1.0)
    d = ggx_ndf(cos_h, alpha)
    g = smith_g2(cos_v, cos_l, alpha)
    f = fresnel_schlick(ks, cos_d[..., None])
    return f * (d * g / jnp.maximum(4.0 * cos_v * cos_l, 1e-9))[..., None]


def eval_brdf(kd, ks, roughness, n, v, l, diffuse_model: str = "lambert"):
    """Combined diffuse + specular BRDF value (RGB)."""
    cos_l = jnp.sum(n * l, -1)
    if diffuse_model == "disney":
        h = safe_normalize(v + l)
        diff = eval_disney_diffuse(
            kd, roughness, jnp.clip(jnp.sum(n * v, -1), 0, 1),
            jnp.clip(cos_l, 0, 1), jnp.clip(jnp.sum(v * h, -1), 0, 1))
    else:
        diff = jnp.broadcast_to(eval_lambert(kd), ks.shape)
    spec = eval_ggx_specular(ks, roughness, n, v, l)
    return jnp.where((cos_l > 0)[..., None], diff + spec, 0.0)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


def sample_uniform_cone(key, axis, cos_half):
    """Uniform solid-angle direction inside the cone around unit `axis`
    with aperture cos(half-angle) `cos_half` (N,). Returns (l, pdf) with
    pdf = 1/(2*pi*(1 - cos_half)) sr^-1 — the next-event-estimation
    sampler for sphere emitters (cos_half = -1 degenerates to uniform
    over the full sphere, e.g. shading points inside the emitter)."""
    u = jax.random.uniform(key, axis.shape[:-1] + (2,))
    cos_t = 1.0 - u[..., 0] * (1.0 - cos_half)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2 * math.pi * u[..., 1]
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                      axis=-1)
    l = to_world(local, axis)
    pdf = 1.0 / jnp.maximum(2 * math.pi * (1.0 - cos_half), 1e-9)
    return l, pdf


def sample_cosine_hemisphere(key, n):
    """Cosine-weighted direction about n; returns (l, pdf)."""
    u = jax.random.uniform(key, n.shape[:-1] + (2,))
    r = jnp.sqrt(u[..., 0])
    phi = 2 * math.pi * u[..., 1]
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi),
         jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))], axis=-1)
    l = to_world(local, n)
    pdf = jnp.maximum(local[..., 2], 1e-9) / math.pi
    return l, pdf


def _radical_inverse_base2(i):
    """van der Corput sequence: bit-reversed uint32 / 2^32, in [0, 1)."""
    i = jnp.asarray(i, jnp.uint32)
    i = (i << 16) | (i >> 16)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    return i.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def cosine_hemisphere_ld(key, n, spp: int):
    """``spp`` low-discrepancy cosine-weighted directions about each n.

    Hammersley points ``(i/spp, vdc(i))`` with an independent per-point
    Cranley–Patterson rotation (random toroidal shift, so distinct
    points — and distinct bakes — stay statistically independent while
    each point's own spp-set is stratified). Variance of the hemisphere
    mean falls ~O(1/spp^1.5) instead of iid MC's O(1/spp): the fix for
    the bake-noise floor that dominated the round-3 indirect A/B (two
    iid spp-64 bakes correlated only 0.30/point).

    Returns ``(dirs, pdf)`` of shapes (spp, N, 3) and (spp, N).
    """
    npts = n.shape[0]
    i = jnp.arange(spp, dtype=jnp.uint32)
    u1 = (i.astype(jnp.float32) + 0.5) / spp
    u2 = _radical_inverse_base2(i)
    shift = jax.random.uniform(key, (2, npts))
    u1 = jnp.mod(u1[:, None] + shift[0][None, :], 1.0)  # (spp, N)
    u2 = jnp.mod(u2[:, None] + shift[1][None, :], 1.0)
    r = jnp.sqrt(u1)
    phi = 2 * math.pi * u2
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi),
         jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))], axis=-1)
    dirs = to_world(local, n[None])
    pdf = jnp.maximum(local[..., 2], 1e-9) / math.pi
    return dirs, pdf


def sample_ggx_vndf(key, n, v, roughness):
    """Visible-normal GGX sampling (Heitz 2018; parity brdf.py:325-360).

    Returns (l = reflect(v, h), h).
    """
    alpha = jnp.maximum(roughness * roughness, 1e-3)[..., None]
    v_local = to_local(v, n)
    vh = safe_normalize(v_local * jnp.concatenate(
        [alpha, alpha, jnp.ones_like(alpha)], axis=-1))
    # orthonormal frame around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-7)[..., None],
        jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], -1)
        / jnp.sqrt(jnp.maximum(lensq, 1e-12))[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    u = jax.random.uniform(key, n.shape[:-1] + (2,))
    r = jnp.sqrt(u[..., 0])
    phi = 2 * math.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1**2, 0.0)) + s * p2
    ph = (p1[..., None] * t1 + p2[..., None] * t2
          + jnp.sqrt(jnp.maximum(1.0 - p1**2 - p2**2, 0.0))[..., None] * vh)
    h_local = safe_normalize(jnp.stack(
        [alpha[..., 0] * ph[..., 0], alpha[..., 0] * ph[..., 1],
         jnp.maximum(ph[..., 2], 1e-6)], axis=-1))
    h = to_world(h_local, n)
    l = 2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v
    return safe_normalize(l), h


def pdf_cosine(n, l):
    return jnp.maximum(jnp.sum(n * l, -1), 0.0) / math.pi


def pdf_ggx_vndf(n, v, l, roughness):
    alpha = jnp.maximum(roughness * roughness, 1e-3)
    h = safe_normalize(v + l)
    cos_v = jnp.clip(jnp.sum(n * v, -1), 1e-6, 1.0)
    cos_h = jnp.clip(jnp.sum(n * h, -1), 0.0, 1.0)
    vdoth = jnp.clip(jnp.sum(v * h, -1), 1e-6, 1.0)
    d = ggx_ndf(cos_h, alpha)
    g1 = smith_g1(cos_v, alpha)
    return d * g1 * vdoth / jnp.maximum(4.0 * cos_v * vdoth, 1e-9)


def specular_event_probability(kd, ks):
    """Diffuse-vs-specular event choice by luminance
    (parity brdf.py:181-184)."""
    ld = luminance(kd)
    ls = luminance(ks)
    return jnp.clip(ls / jnp.maximum(ld + ls, 1e-9), 0.05, 0.95)


def combined_pdf(kd, ks, roughness, n, v, l):
    """Mixture pdf of the diffuse/specular sampling strategy
    (parity brdf.py:206-239)."""
    p_spec = specular_event_probability(kd, ks)
    return ((1.0 - p_spec) * pdf_cosine(n, l)
            + p_spec * pdf_ggx_vndf(n, v, l, roughness))
