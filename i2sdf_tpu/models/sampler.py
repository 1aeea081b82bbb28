"""Error-bounded adaptive ray sampling (VolSDF Algorithm 1), TPU-native.

Capability parity with `/root/reference/model/network/ray_sampler.py:15-251`
(UniformSampler / ErrorBoundSampler). Design differences, deliberate and
TPU-first:

* **Static shapes.** The reference's data-dependent `while not_converge`
  loop becomes a statically unrolled loop of exactly `max_total_iters`
  rounds: rounds 0..max-2 upsample `N_samples_eval` new points from the
  per-section opacity-error pdf and merge-sort them in; the final round
  draws the `N_samples` rendering samples from the weights pdf.
* **Early exit in fixed shape** (`early_exit`, default on): the
  reference's global-convergence short-circuit (`ray_sampler.py:84,151`)
  is a `lax.cond` passthrough — once every ray's error bound at beta0 is
  <= eps, remaining refinement rounds emit DUPLICATE z-values (zero-width
  sections, harmless downstream) and skip both the SDF evaluation and
  the round math. Measured 38.2 -> 28.1 ms/step on v5e over the first
  500 real training steps with an identical loss/psnr trajectory.
* **Merge without re-evaluation.** SDF values are computed only for new
  samples; `jnp.sort` + `take_along_axis` on the argsort replaces the
  reference's sort + gather (`ray_sampler.py:90-95,210-212`).
* **Masked math.** d* (Theorem 1) and the beta bisection use multiplicative
  masking — the same trick the reference applies for speed
  (`ray_sampler.py:111-131`) — which is the natural TPU formulation.
* **No host sync / no gradients.** Callers get `stop_gradient`-wrapped
  z-values (the reference evaluates the SDF under `no_grad`, so z-values
  are constants w.r.t. parameters there too).

`sdf_fn` is any `(N, 3) -> (N,)` callable; in production it is the fused
Pallas MLP kernel (`i2sdf_tpu.ops.pallas.fused_mlp`) or the XLA MLP.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.sampling import (linear_z_vals, pdf_to_cdf, prefix_sum,
                            sample_cdf, stratify)
from ..utils.cameras import get_sphere_intersections
from .density import laplace_density


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    scene_bounding_sphere: float = 3.0
    near: float = 0.0
    N_samples: int = 64
    N_samples_eval: int = 128
    N_samples_extra: int = 32
    eps: float = 0.1
    beta_iters: int = 10
    max_total_iters: int = 5
    inverse_sphere_bg: bool = False
    N_samples_inverse_sphere: int = 32
    add_tiny: float = 1e-6
    # reclaim the reference's global-convergence short-circuit
    # (ray_sampler.py:84,151: the while loop stops once every ray's
    # error bound is <= eps) in fixed-shape form: converged refinement
    # rounds become a lax.cond passthrough that emits DUPLICATE samples
    # (zero-width sections — harmless to the final weights pdf) and
    # skips both the SDF evaluation and the round kernel. The final
    # weights-pdf round always runs. Default ON: this is the
    # reference's semantics, and it measured 38.2 -> 28.1 ms/step over
    # the first 500 real training steps on v5e with identical
    # loss/psnr trajectory.
    early_exit: bool = True
    # Per-RAY early exit via batch compaction (beyond the reference,
    # whose convergence short-circuit is global only): each refinement
    # round marks rays whose beta0 error bound is already <= eps, then
    # the next round's ENTIRE body (MLP eval + merge-sort + error bound
    # + pdf resampling) runs only on a statically-capped compact subset
    # of rays (unconverged ranked first, gathered/scattered around the
    # round). Unselected rays skip the round: their state arrays widen
    # with sort-free duplicates of their far z-value (zero-width
    # trailing sections, invisible to the downstream pdfs).
    # `per_ray_fracs[i]` caps round i+1 to ceil(frac*R) rays (round 0
    # is always full; a short tuple repeats its last entry; fracs >= 1
    # disable compaction for that round). jnp.all() is an extreme
    # statistic — measured on the 200k checkpoint (scripts/
    # diag_per_ray.py), mid-schedule betas leave the global exit cold
    # while 31-90% of rays are individually converged after round 1-2.
    # Unconverged rays beyond the cap skip one round and remain
    # candidates the next; the final weights-pdf round always runs for
    # every ray. Default OFF until per-phase capacities are applied by
    # the trainer (see train/step.py). per_ray_fracs=None means "auto":
    # the trainer/eval renderer pick beta-phased capacities from
    # train/step.py::PER_RAY_PHASES; an explicit tuple (config key
    # ray_sampler.per_ray_fracs) is honored verbatim at every beta.
    per_ray_exit: bool = False
    per_ray_fracs: tuple | None = None
    # Per-round evaluation budget (round-4 algorithmic-FLOP cut): entry 0
    # is the uniform-init size, entry i>=1 the number of NEW pdf samples
    # evaluated at round i. None = the reference's flat N_samples_eval
    # per round (`/root/reference/model/network/ray_sampler.py:84-95`
    # draws `N_samples_eval` every iteration regardless of how far the
    # error-bound pdf has already concentrated). Late rounds refine an
    # already-concentrated pdf, so a tapering schedule (e.g. 128,128,
    # 96,64,64) cuts the sampler's no-grad MLP evals 25% and shrinks
    # every downstream (R, S) round kernel/merge. Quality evidence:
    # (a) a 2048-ray exact-density quadrature oracle on the analytic
    # scene bounds the per-step rgb error at <0.0007 across the beta
    # ladder (docs/evidence/eval_counts_ab.json — the more aggressive
    # 384-eval taper BREACHES the bound and is the recorded negative
    # result); (b) end-to-end 50k-step training A/Bs, same seed, taper
    # on/off, on the quality scene (docs/evidence/quality_variance/).
    round_eval_counts: tuple | None = None

    @property
    def eval_counts(self) -> tuple:
        """Per-round evaluated-point counts, length max_total_iters."""
        if self.round_eval_counts is None:
            return (self.N_samples_eval,) * self.max_total_iters
        counts = tuple(int(c) for c in self.round_eval_counts)
        if len(counts) != self.max_total_iters:
            raise ValueError(
                f"round_eval_counts needs {self.max_total_iters} entries "
                f"(one per round), got {len(counts)}")
        return counts

    @property
    def far(self) -> float:
        return 2.0 * self.scene_bounding_sphere

    @property
    def total_fg_samples(self) -> int:
        """Final per-ray foreground sample count incl. near+far columns."""
        return self.N_samples + self.N_samples_extra + 2


def uniform_z_vals(cfg: SamplerConfig, key, ray_dirs, cam_loc, n: int,
                   training: bool, take_sphere_intersection: bool = False):
    """Uniform (optionally stratified) init — parity ray_sampler.py:22-43."""
    R = ray_dirs.shape[0]
    near = jnp.full((R, 1), cfg.near, dtype=jnp.float32)
    if take_sphere_intersection:
        inter, _ = get_sphere_intersections(cam_loc, ray_dirs,
                                            r=cfg.scene_bounding_sphere)
        far = inter[:, 1:]
    else:
        far = jnp.full((R, 1), cfg.far, dtype=jnp.float32)
    z_vals = linear_z_vals(near, far, n)
    if training:
        z_vals = stratify(key, z_vals)
    return z_vals


def _get_error_bound(beta, sdf_on_z, z_vals, dists, d_star):
    """Per-ray max opacity-error bound (parity ray_sampler.py:243-251).

    beta: (R, 1) or scalar; sdf_on_z: (R, S); dists: (R, S-1); d_star: (R, S-1).
    """
    density = laplace_density(sdf_on_z, beta)
    shifted = jnp.concatenate(
        [jnp.zeros_like(dists[:, :1]), dists * density[:, :-1]], axis=-1)
    integral_estimation = prefix_sum(shifted)
    error_per_section = jnp.exp(-d_star / beta) * dists**2 / (4 * beta**2)
    error_integral = prefix_sum(error_per_section)
    bound_opacity = (
        jnp.clip(jnp.exp(error_integral), max=1e6) - 1.0
    ) * jnp.exp(-integral_estimation[:, :-1])
    return jnp.max(bound_opacity, axis=-1)


def _d_star(z_vals, sdf):
    """Theorem-1 triangle bound on in-section distance to the surface
    (parity ray_sampler.py:98-114, masked-multiply formulation)."""
    d = sdf
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    a, b, c = dists, jnp.abs(d[:, :-1]), jnp.abs(d[:, 1:])
    first_cond = a**2 + b**2 <= c**2
    second_cond = a**2 + c**2 <= b**2
    s = (a + b + c) / 2.0
    area_before_sqrt = s * (s - a) * (s - b) * (s - c)
    mask = (~first_cond) & (~second_cond) & (b + c - a > 0)
    first_only = first_cond & (~second_cond)
    heron = jnp.nan_to_num(2.0 * jnp.sqrt(jnp.maximum(area_before_sqrt, 0.0))
                           / jnp.maximum(a, 1e-12))
    d_star = first_only * b + second_cond * c + heron * mask
    # zero out sections whose endpoints straddle the surface
    d_star = (jnp.sign(d[:, 1:]) * jnp.sign(d[:, :-1]) == 1) * d_star
    return d_star, dists


def _sorted_uniform(key, shape_r, n):
    """Sorted iid U(0,1) draws, sorted BY CONSTRUCTION: normalized
    partial sums of n+1 iid Exp(1) spacings have exactly the joint
    distribution of the order statistics of n iid uniforms. Replaces
    `sort(uniform(...))` so the final z merge needs no sort at all
    (the tail sort chain cost ~1.4 ms/step at the shipped config)."""
    e = -jnp.log1p(-jax.random.uniform(key, (shape_r, n + 1)))
    s = jnp.cumsum(e, axis=-1)
    return s[:, :-1] / jnp.maximum(s[:, -1:], 1e-12)


def _merge_sorted(a, b, a_pay=None, b_pay=None):
    """Row-wise merge of two SORTED (R, Na)/(R, Nb) arrays into a
    sorted (R, Na+Nb) array without a sort: each element's merged rank
    is its own index plus its searchsorted rank in the other array
    (side left/right keeps tied ranks disjoint), then one scatter.
    compare_all searchsorted is a (Na, Nb) broadcast-compare per ray —
    ~100x cheaper than the (R, 98)-wide bitonic sort it replaces.

    With `a_pay`/`b_pay`, a payload array per side rides the SAME
    computed ranks (the sampler's per-point SDF values) and
    (merged, merged_pay) is returned — this replaces the key+payload
    `lax.lax.sort` in the refinement-round merges, whose inputs are
    always sorted by construction (z_vals inductively; new samples are
    the inverse-CDF of sorted u)."""
    R, na = a.shape
    nb = b.shape[1]
    ss = jax.vmap(lambda xs, qs, side: jnp.searchsorted(
        xs, qs, side=side, method="compare_all"),
        in_axes=(0, 0, None))
    ra = ss(b, a, "left") + jnp.arange(na, dtype=jnp.int32)[None]
    rb = ss(a, b, "right") + jnp.arange(nb, dtype=jnp.int32)[None]
    rows = jnp.arange(R)[:, None]
    kw = dict(unique_indices=True, mode="promise_in_bounds")
    out = jnp.zeros((R, na + nb), a.dtype)
    merged = out.at[rows, ra].set(a, **kw).at[rows, rb].set(b, **kw)
    if a_pay is None:
        return merged
    pay = jnp.zeros((R, na + nb), a_pay.dtype)
    merged_pay = (pay.at[rows, ra].set(a_pay, **kw)
                  .at[rows, rb].set(b_pay, **kw))
    return merged, merged_pay


def round_update(cfg: SamplerConfig, z_vals, sdf, beta, beta0, u,
                 final: bool):
    """One refinement round of Algorithm 1 (pure-JAX reference path):
    d* bound -> per-ray beta bisection -> compositing weights -> pdf
    (error-bound or final weights) -> inverse-CDF samples at `u`.

    z_vals/sdf: (R, S) sorted; beta: (R,); u: (R, N). Returns
    (samples (R, N), beta (R,)). The Pallas fast path
    (`i2sdf_tpu.ops.pallas.sampler_round`) implements this same function
    as one kernel.
    """
    R = z_vals.shape[0]
    d_star, dists = _d_star(z_vals, sdf)

    curr_error = _get_error_bound(beta0, sdf, z_vals, dists, d_star)
    converged = curr_error <= cfg.eps
    beta = jnp.where(converged, beta0, beta)
    beta_min_b = jnp.full((R,), beta0)
    beta_max_b = beta
    for _ in range(cfg.beta_iters):
        beta_mid = 0.5 * (beta_min_b + beta_max_b)
        mid_error = _get_error_bound(
            beta_mid[:, None], sdf, z_vals, dists, d_star)
        ok = mid_error <= cfg.eps
        beta_max_b = jnp.where(ok, beta_mid, beta_max_b)
        beta_min_b = jnp.where(ok, beta_min_b, beta_mid)
    beta = beta_max_b

    density = laplace_density(sdf, beta[:, None])
    dists_inf = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    free_energy = dists_inf * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-prefix_sum(shifted))
    weights = alpha * transmittance

    if final:
        pdf = weights[:, :-1] + 1e-5
    else:
        error_per_section = (
            jnp.exp(-d_star / beta[:, None])
            * dists**2 / (4 * beta[:, None] ** 2))
        error_integral = prefix_sum(error_per_section)
        bound_opacity = (
            jnp.clip(jnp.exp(error_integral), max=1e6) - 1.0
        ) * transmittance[:, :-1]
        pdf = bound_opacity + cfg.add_tiny
    cdf = pdf_to_cdf(pdf)
    samples = sample_cdf(z_vals, cdf, u)
    return samples, beta


def error_bound_z_vals(cfg: SamplerConfig, sdf_fn, key, ray_dirs, cam_loc,
                       beta0, training: bool, round_impl=None,
                       conv_impl=None):
    """Adaptive sampling: returns (z_vals, z_vals_bg | None, z_samples_eik).

    ray_dirs: (R, 3) unit directions; cam_loc: (R, 3); beta0: scalar
    (current learned beta, already |.|+beta_min). `training` is static.
    `round_impl` overrides the per-round refinement math (signature of
    `round_update` minus cfg; used for the Pallas kernel); `conv_impl`
    overrides the per-round convergence check
    (`(z_vals, sdf, beta0) -> (R,) bool`, used for the fused Pallas
    check — the XLA d*/prefix-sum check costs ~0.5 ms of fusion soup
    per round at the shipped shapes).
    """
    R = ray_dirs.shape[0]
    keys = jax.random.split(key, cfg.max_total_iters + 4)
    beta0 = jax.lax.stop_gradient(jnp.asarray(beta0, jnp.float32))
    counts = cfg.eval_counts

    # --- uniform init ------------------------------------------------------
    z_vals = uniform_z_vals(
        cfg, keys[0], ray_dirs, cam_loc, counts[0], training,
        take_sphere_intersection=cfg.inverse_sphere_bg)

    # --- Lemma-2 max-beta init (ray_sampler.py:74-77) ------------------------
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    bound = (1.0 / (4.0 * math.log(cfg.eps + 1.0))) * jnp.sum(dists**2, -1)
    beta = jnp.sqrt(bound)

    samples = z_vals          # new samples to evaluate this round
    sdf = None                # running SDF values aligned with z_vals
    weights = None
    final_samples = None

    impl = round_impl if round_impl is not None else (
        lambda z, s, b, b0, u, final: round_update(cfg, z, s, b, b0, u,
                                                   final))

    # Per-ray compaction capacities: caps[it] bounds the number of rays
    # whose samples emitted at round `it` get a full refinement round
    # (MLP eval + merge-sort + error bound + pdf resampling) at round
    # it+1. The round-0 uniform init is always full. Rays outside the
    # selection skip the ENTIRE round body: their state arrays widen
    # with sort-free duplicates of their last (far) z-value — zero-width
    # trailing sections, invisible to the downstream pdfs.
    per_ray = cfg.per_ray_exit and cfg.early_exit
    # None = "auto" (callers normally specialize via train/step.py's
    # ladder before building); a bare per_ray sampler falls back to the
    # historical default capacities.
    fracs = (tuple(cfg.per_ray_fracs) if cfg.per_ray_fracs
             else (1.0, 0.5, 0.5, 0.5))
    caps = []
    for it in range(cfg.max_total_iters - 1):
        f = fracs[min(it, len(fracs) - 1)]
        caps.append(R if f >= 1.0 else max(1, int(math.ceil(f * R))))

    conv_ray = jnp.zeros((R,), bool)
    converged = jnp.asarray(False)  # round 0 always runs
    sel = None  # rows being refined this round (compacted mode)
    for it in range(cfg.max_total_iters):
        final = it == cfg.max_total_iters - 1
        n_new = samples.shape[1]

        # --- evaluate + merge ---------------------------------------------
        if sdf is None:
            # round 0: full evaluation of the uniform init
            pts = (cam_loc[:, None, :]
                   + samples[..., None] * ray_dirs[:, None, :])
            sdf = sdf_fn(pts.reshape(-1, 3)).reshape(samples.shape)
            z_sel = s_sel = None  # z_vals already == samples (sorted)
        elif sel is not None:
            # compacted round: `samples` is (C, n_new) for rows `sel`.
            # Under global convergence the emitted samples were leading-
            # column duplicates, so their SDF is a copy, and the MLP is
            # skipped entirely.
            zg, sg = z_vals[sel], sdf[sel]
            pts = (cam_loc[sel][:, None, :]
                   + samples[..., None] * ray_dirs[sel][:, None, :])
            new_sdf = jax.lax.cond(
                converged,
                lambda p, s: s[:, :n_new],
                lambda p, s: sdf_fn(p.reshape(-1, 3)).reshape(samples.shape),
                pts, sg)
            z_sel, s_sel = jax.lax.sort(
                (jnp.concatenate([zg, samples], axis=-1),
                 jnp.concatenate([sg, new_sdf], axis=-1)),
                dimension=-1, num_keys=1)
            # widen every ray's state with far-duplicates (keeps arrays
            # sorted without a sort), then scatter the refined rows
            z_vals = jnp.concatenate(
                [z_vals, jnp.broadcast_to(z_vals[:, -1:], (R, n_new))],
                axis=-1).at[sel].set(z_sel)
            sdf = jnp.concatenate(
                [sdf, jnp.broadcast_to(sdf[:, -1:], (R, n_new))],
                axis=-1).at[sel].set(s_sel)
        else:
            # full round
            pts = (cam_loc[:, None, :]
                   + samples[..., None] * ray_dirs[:, None, :])
            if cfg.early_exit:
                new_sdf = jax.lax.cond(
                    converged,
                    lambda z, s: s[:, :n_new],
                    lambda z, s: sdf_fn(z.reshape(-1, 3)).reshape(
                        samples.shape),
                    pts, sdf)
            else:
                new_sdf = sdf_fn(pts.reshape(-1, 3)).reshape(samples.shape)
            # one key+payload sort instead of argsort + two gathers.
            # NOTE: both sides are sorted by construction, but the
            # rank-scatter merge (_merge_sorted) measured 7x SLOWER here
            # than the bitonic lax.sort at (1600, S+128) widths — TPU
            # scatter lowering dominates; it only wins at the narrow
            # (R, 98) final tail below.
            z_vals, sdf = jax.lax.sort(
                (jnp.concatenate([z_vals, samples], axis=-1),
                 jnp.concatenate([sdf, new_sdf], axis=-1)),
                dimension=-1, num_keys=1)
            z_sel = s_sel = None

        # --- final round: weights pdf over the full accumulated set -------
        if final:
            if training:
                u = _sorted_uniform(keys[it + 1], R, cfg.N_samples)
            else:
                u = jnp.broadcast_to(
                    jnp.linspace(0.0, 1.0, cfg.N_samples),
                    (R, cfg.N_samples))
            final_samples, beta = impl(z_vals, sdf, beta, beta0, u, True)
            continue

        # --- emit next round's samples + convergence ----------------------
        # Global-exit fast path: the refinement round's beta bisection
        # already decides per-ray convergence — the kernel pins beta to
        # beta0 exactly when the beta0 error bound is <= eps (the same
        # flag the reference reads as `beta.max() > beta0`,
        # ray_sampler.py:121-122,151). Deriving conv from the emitted
        # beta removes a whole d*/prefix-sum check launch per round; at
        # the round where the set first converges, the emitted pdf
        # samples are swapped for leading-column duplicates so the next
        # round's skipped-MLP copy (sdf[:, :n_new]) stays aligned.
        n_next = counts[it + 1]
        if cfg.early_exit and not per_ray:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_next), (R, n_next))

            def _run(z, s, b, u_):
                smp, b2 = impl(z, s, b, beta0, u_, False)
                return smp, b2, b2 <= beta0

            samples, beta, conv_ray = jax.lax.cond(
                converged,
                lambda z, s, b, u_: (z[:, :n_next], b,
                                     jnp.ones((R,), bool)),
                _run, z_vals, sdf, beta, u)
            converged = jnp.all(conv_ray)
            samples = jnp.where(converged,
                                z_vals[:, :n_next], samples)
            sel = None
            continue

        # --- per-ray mode: explicit convergence check (reference's
        #     beta0 bound, ray_sampler.py:121-122,151) ----------------------
        if cfg.early_exit:
            if conv_impl is not None:
                check = lambda z, s: conv_impl(z, s, beta0)  # noqa: E731
            else:
                def check(z, s):
                    d_star, dists = _d_star(z, s)
                    err = _get_error_bound(beta0, s, z, dists, d_star)
                    return err <= cfg.eps
            if s_sel is not None:
                # only refined rows can change convergence status
                conv_ray = conv_ray.at[sel].set(check(z_sel, s_sel))
            else:
                conv_ray = check(z_vals, sdf)
            converged = jnp.all(conv_ray)

        # --- emit next round's samples ------------------------------------
        cap = caps[it]
        if per_ray and cap < R:
            # rank rays unconverged-first; the first `cap` get the next
            # refinement round. Ties break on a per-round ROTATED ray
            # index — a plain stable argsort would starve the same
            # trailing unconverged rays every round whenever the cap
            # overflows (deterministic, spatially-correlated skipping);
            # the rotation round-robins overflow across rounds instead.
            idx = jnp.arange(R, dtype=jnp.int32)
            rot = (idx + it * cap) % R
            key_order = conv_ray.astype(jnp.int32) * R + rot
            order = jnp.argsort(key_order)
            sel = order[:cap]
            zg, sg, bg = z_vals[sel], sdf[sel], beta[sel]
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_next), (cap, n_next))
            samples, bg2 = jax.lax.cond(
                converged,
                lambda z, s, b, u_: (z[:, :n_next], b),
                lambda z, s, b, u_: impl(z, s, b, beta0, u_, False),
                zg, sg, bg, u)
            beta = beta.at[sel].set(bg2)
        else:
            sel = None
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_next), (R, n_next))
            if cfg.early_exit:
                samples, beta = jax.lax.cond(
                    converged,
                    lambda z, s, b, u_: (z[:, :n_next], b),
                    lambda z, s, b, u_: impl(z, s, b, beta0, u_, False),
                    z_vals, sdf, beta, u)
            else:
                samples, beta = impl(z_vals, sdf, beta, beta0, u, False)

    # --- extras: near, far, and a subset of the accumulated set -------------
    near = jnp.full((R, 1), cfg.near, dtype=jnp.float32)
    if cfg.inverse_sphere_bg:
        inter, _ = get_sphere_intersections(cam_loc, ray_dirs,
                                            r=cfg.scene_bounding_sphere)
        far = inter[:, 1:]
    else:
        far = jnp.full((R, 1), cfg.far, dtype=jnp.float32)

    if cfg.N_samples_extra > 0:
        if training:
            perm = jax.random.permutation(keys[-3], z_vals.shape[1])
            # same SET as the reference's unsorted permutation take
            # (ray_sampler.py:141-146) — sorting the (tiny, shared)
            # index vector makes the per-ray gather of the row-sorted
            # z_vals come out sorted, enabling the sort-free merge
            sampling_idx = jnp.sort(perm[: cfg.N_samples_extra])
        else:
            sampling_idx = jnp.linspace(
                0, z_vals.shape[1] - 1, cfg.N_samples_extra).astype(jnp.int32)
        # near <= every z < far by construction, so this concat is sorted
        z_vals_extra = jnp.concatenate(
            [near, z_vals[:, sampling_idx], far], axis=-1)
    else:
        z_vals_extra = jnp.concatenate([near, far], axis=-1)

    # final_samples is sorted by construction (inverse-CDF of sorted u:
    # _sorted_uniform when training, linspace in eval) — merge, no sort
    z_final = _merge_sorted(final_samples, z_vals_extra)

    # one random existing depth per ray -> eikonal near-surface points
    idx = jax.random.randint(keys[-2], (R, 1), 0, z_final.shape[-1])
    z_samples_eik = jnp.take_along_axis(z_final, idx, axis=-1)

    z_vals_bg = None
    if cfg.inverse_sphere_bg:
        # inverse-sphere sampler: uniform in [0, 1] inverse depth, scaled
        # by 1/R (parity ray_sampler.py:64-65,236-239)
        t = jnp.linspace(0.0, 1.0, cfg.N_samples_inverse_sphere)
        z_vals_bg = jnp.broadcast_to(t, (R, cfg.N_samples_inverse_sphere))
        if training:
            z_vals_bg = stratify(keys[-1], z_vals_bg)
        z_vals_bg = z_vals_bg * (1.0 / cfg.scene_bounding_sphere)

    sg = jax.lax.stop_gradient
    return (sg(z_final),
            None if z_vals_bg is None else sg(z_vals_bg),
            sg(z_samples_eik))
