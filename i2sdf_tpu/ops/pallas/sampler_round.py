"""One error-bound sampler refinement round as a single Pallas TPU kernel.

Implements `i2sdf_tpu.models.sampler.round_update` — the d* triangle
bound, the 10-step per-ray beta bisection (each step two prefix sums +
transcendentals over (R, S)), compositing weights, the error-bound /
final pdf, and inverse-CDF sampling — as ONE kernel blocked over rays.

Why: on this TPU stack, XLA-generated elementwise fusions measure
~0.6 Gelem/s while Mosaic kernels run at native speed; the sampler's
round math dominated the training step (~110 ms of fusions at the
shipped config). Design choices:

* prefix sums are (S, S) triangular matmuls on the MXU (bf16 inputs,
  f32 accumulation — the same precision the XLA path's `prefix_sum`
  uses);
* inverse-CDF sampling is gather-free: searchsorted's below/above
  bins are masked max/min reductions over lane chunks (both `cdf` and
  `bins` are nondecreasing, so the extremum at `cdf <= u` IS the
  bracket), avoiding unsupported vector gathers;
* everything sits at S lanes with the last lane masked, so no odd
  (S-1)-shaped intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _laplace(sdf, beta):
    # exp(x) - 1 instead of expm1 (no Mosaic lowering for expm1); the
    # f32 absolute error near x=0 is ~1e-7 — irrelevant at sampler scale
    return (1.0 / beta) * (0.5 + 0.5 * jnp.sign(sdf)
                           * (jnp.exp(-jnp.abs(sdf) / beta) - 1.0))


def _make_kernel(S: int, n_out: int, beta_iters: int, eps: float,
                 add_tiny: float, final: bool, block_rows: int,
                 sample_rows: int):
    """`block_rows` rays per grid step. The d*/bisection/pdf phase is
    matmul-dominated and runs on the whole block (large rows feed the
    MXU's 128 sublanes — at the historical block_rows=8 the (8,S)@(S,S)
    prefix-sum matmuls wasted 94% of the systolic array). The
    inverse-CDF phase materializes (rows, N, 128) masked-reduction
    temporaries, so it loops over `sample_rows`-row subgroups to stay
    inside VMEM."""

    def kernel(z_ref, sdf_ref, beta_ref, u_ref, beta0_ref,
               samples_ref, beta_out_ref, cdf_ref):
        z = z_ref[:]              # (BR, S) f32
        s = sdf_ref[:]
        beta_in = beta_ref[:]     # (BR, 1)
        beta0 = beta0_ref[0, 0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, S), 1)
        is_last = lane == S - 1
        z_next = jnp.concatenate(
            [z[:, 1:], jnp.zeros((block_rows, 1), z.dtype)], axis=1)
        s_next = jnp.concatenate(
            [s[:, 1:], jnp.zeros((block_rows, 1), s.dtype)], axis=1)
        dists_m = jnp.where(is_last, 0.0, z_next - z)  # section widths

        # --- d* (Theorem 1), masked-lane formulation --------------------
        a = dists_m
        b = jnp.abs(s)
        c = jnp.abs(s_next)
        first_cond = a * a + b * b <= c * c
        second_cond = a * a + c * c <= b * b
        hs = (a + b + c) / 2.0
        area = hs * (hs - a) * (hs - b) * (hs - c)
        mask = (~first_cond) & (~second_cond) & (b + c - a > 0)
        first_only = first_cond & (~second_cond)
        heron = (2.0 * jnp.sqrt(jnp.maximum(area, 0.0))
                 / jnp.maximum(a, 1e-12))
        d_star = (first_only * b + second_cond * c + heron * mask)
        d_star = jnp.where(
            (jnp.sign(s_next) * jnp.sign(s) == 1) & (~is_last), d_star, 0.0)

        # --- prefix sums via triangular matmuls on the MXU ---------------
        # one strict-triangular matrix serves both prefix flavors:
        # incl(x) = excl(x) + x.
        row_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        tri_strict = (row_i < col_i).astype(jnp.bfloat16)

        def excl(x):
            return jnp.dot(x.astype(jnp.bfloat16), tri_strict,
                           preferred_element_type=jnp.float32)

        def incl(x):
            return excl(x) + x

        def excl_exact(x):
            # hi/lo split: ~f32-accurate prefix (a single bf16 pass can
            # be locally non-monotone, breaking CDF brackets at u ~ 1)
            hi = x.astype(jnp.bfloat16).astype(jnp.float32)
            lo = (x - hi).astype(jnp.bfloat16)
            return (jnp.dot(hi.astype(jnp.bfloat16), tri_strict,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(lo, tri_strict,
                              preferred_element_type=jnp.float32))

        def error_bound(beta_col):
            dens = _laplace(s, beta_col)
            e = jnp.where(is_last, 0.0, dists_m * dens)
            err = jnp.where(
                is_last, 0.0,
                jnp.exp(-d_star / beta_col) * dists_m * dists_m
                / (4.0 * beta_col * beta_col))
            # both prefixes in ONE stacked (2*BR, S) matmul
            both = excl(jnp.concatenate([e, err], axis=0))
            integral_excl = both[:block_rows]
            err_int = both[block_rows:] + err
            bound = (jnp.minimum(jnp.exp(err_int), 1e6) - 1.0) * jnp.exp(
                -integral_excl)
            bound = jnp.where(is_last, -jnp.inf, bound)
            return jnp.max(bound, axis=-1, keepdims=True)  # (BR, 1)

        beta0_col = jnp.full((block_rows, 1), beta0)
        converged = error_bound(beta0_col) <= eps
        beta = jnp.where(converged, beta0, beta_in)
        bmin = beta0_col
        bmax = beta
        for _ in range(beta_iters):
            mid = 0.5 * (bmin + bmax)
            ok = error_bound(mid) <= eps
            bmax = jnp.where(ok, mid, bmax)
            bmin = jnp.where(ok, bmin, mid)
        beta = bmax
        beta_out_ref[:] = beta

        # --- compositing weights over the accumulated set ---------------
        dens = _laplace(s, beta)
        dists_inf = jnp.where(is_last, 1e10, dists_m)
        fe = dists_inf * dens
        transmittance = jnp.exp(-excl(fe))
        alpha = 1.0 - jnp.exp(-fe)
        w = alpha * transmittance

        if final:
            pdf = jnp.where(is_last, 0.0, w + 1e-5)
        else:
            err = jnp.where(
                is_last, 0.0,
                jnp.exp(-d_star / beta) * dists_m * dists_m
                / (4.0 * beta * beta))
            bound_opacity = (jnp.minimum(jnp.exp(incl(err)), 1e6)
                             - 1.0) * transmittance
            pdf = jnp.where(is_last, 0.0, bound_opacity + add_tiny)

        # all-zero rows fall back to uniform instead of 0/0 (possible
        # with add_tiny=0 at small beta — see ops/sampling.py pdf_to_cdf)
        total = jnp.sum(pdf, axis=-1, keepdims=True)
        pdf = jnp.where(total > 0.0, pdf / jnp.maximum(total, 1e-30),
                        jnp.where(is_last, 0.0, 1.0 / (S - 1)))
        cdf_ref[:] = excl_exact(pdf)  # cdf[t]=sum_{j<t}; cdf[0]=0, cdf[-1]~1

        # --- gather-free inverse CDF -------------------------------------
        # `sample_rows`-row subgroups under a fori_loop: the
        # (rows, N, 128) masked-reduction temporaries are the VMEM
        # high-water mark, and a python-unrolled loop lets Mosaic keep
        # every subgroup's temporaries live at once (measured 17.8 MB
        # at a 64-row block) — the sequential loop bounds VMEM to one
        # subgroup so the matmul phase above can enjoy a full block.
        neg_inf = jnp.float32(-jnp.inf)
        pos_inf = jnp.float32(jnp.inf)

        def body(i, _):
            g0 = i * sample_rows
            rows = pl.ds(g0, sample_rows)
            u = u_ref[rows, :]
            cdf_g = cdf_ref[rows, :]
            z_g = z_ref[rows, :]
            cdf_last = cdf_g[:, S - 1:]   # (G, 1)
            z_last = z_g[:, S - 1:]
            cb = jnp.full_like(u, neg_inf)
            bb = jnp.full_like(u, neg_inf)
            ca = jnp.broadcast_to(cdf_last, u.shape)
            ba = jnp.broadcast_to(z_last, u.shape)
            for cstart in range(0, S, _LANES):
                cdf_c = cdf_g[:, cstart:cstart + _LANES][:, None, :]
                z_c = z_g[:, cstart:cstart + _LANES][:, None, :]
                le = cdf_c <= u[:, :, None]            # (G, N, C)
                cb = jnp.maximum(cb, jnp.max(
                    jnp.where(le, cdf_c, neg_inf), axis=-1))
                bb = jnp.maximum(bb, jnp.max(
                    jnp.where(le, z_c, neg_inf), axis=-1))
                ca = jnp.minimum(ca, jnp.min(
                    jnp.where(le, pos_inf, cdf_c), axis=-1))
                ba = jnp.minimum(ba, jnp.min(
                    jnp.where(le, pos_inf, z_c), axis=-1))
            denom = ca - cb
            denom = jnp.where(denom < 1e-5, 1.0, denom)
            t = (u - cb) / denom
            samples_ref[pl.ds(g0, sample_rows), :] = bb + t * (ba - bb)
            return 0

        jax.lax.fori_loop(0, block_rows // sample_rows, body, 0,
                          unroll=False)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("beta_iters", "eps", "add_tiny", "final",
                     "block_rows", "sample_rows", "interpret"))
def sampler_round_pallas(z_vals, sdf, beta, u, beta0, *, beta_iters: int,
                         eps: float, add_tiny: float, final: bool,
                         block_rows: int = 64, sample_rows: int = 8,
                         interpret: bool = False):
    """(samples (R, N), beta (R,)) — kernel form of round_update."""
    R, S = z_vals.shape
    n_out = u.shape[1]
    block_rows = min(block_rows, _round_up(R, sample_rows))
    sample_rows = min(sample_rows, block_rows)
    if block_rows % sample_rows:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"sample_rows {sample_rows}")
    r_pad = _round_up(R, block_rows)

    def pad(x, val=0.0):
        return jnp.pad(x, ((0, r_pad - R),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=val)

    z_p = pad(z_vals)
    # padded rays: benign monotone z/sdf so the kernel math stays finite
    if r_pad != R:
        filler_z = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, S), (r_pad - R, S))
        z_p = z_p.at[R:].set(filler_z)
    sdf_p = pad(sdf, 1.0)
    beta_p = pad(beta[:, None], 1.0)
    u_p = pad(u)

    kernel = _make_kernel(S, n_out, beta_iters, eps, add_tiny, final,
                          block_rows, sample_rows)
    grid = (r_pad // block_rows,)
    samples, beta_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, n_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, n_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, n_out), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_rows, S), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * S * S * (2 * (beta_iters + 1) + 2),
            bytes_accessed=r_pad * S * 8,
            transcendentals=r_pad * S * 3 * (beta_iters + 2)),
        interpret=interpret,
    )(z_p, sdf_p, beta_p, u_p,
      jnp.asarray(beta0, jnp.float32).reshape(1, 1))
    return samples[:R], beta_out[:R, 0]


def _make_conv_kernel(S: int, eps: float, block_rows: int):
    """Per-ray convergence check (error bound at beta0 <= eps) — the
    d* + error-bound slice of the round kernel, as its own tiny launch.
    Replaces the per-round XLA check in `error_bound_z_vals`
    (models/sampler.py, parity ray_sampler.py:121-122,151), whose
    prefix sums + reductions cost ~0.5 ms of fusion soup per round.
    Uses hi/lo-split bf16 prefix matmuls to match the XLA path's
    `ops.sampling.prefix_sum` accuracy."""

    def kernel(z_ref, sdf_ref, beta0_ref, conv_ref):
        z = z_ref[:]
        s = sdf_ref[:]
        beta0 = beta0_ref[0, 0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, S), 1)
        is_last = lane == S - 1
        z_next = jnp.concatenate(
            [z[:, 1:], jnp.zeros((block_rows, 1), z.dtype)], axis=1)
        s_next = jnp.concatenate(
            [s[:, 1:], jnp.zeros((block_rows, 1), s.dtype)], axis=1)
        dists_m = jnp.where(is_last, 0.0, z_next - z)

        a = dists_m
        b = jnp.abs(s)
        c = jnp.abs(s_next)
        first_cond = a * a + b * b <= c * c
        second_cond = a * a + c * c <= b * b
        hs = (a + b + c) / 2.0
        area = hs * (hs - a) * (hs - b) * (hs - c)
        mask = (~first_cond) & (~second_cond) & (b + c - a > 0)
        first_only = first_cond & (~second_cond)
        heron = (2.0 * jnp.sqrt(jnp.maximum(area, 0.0))
                 / jnp.maximum(a, 1e-12))
        d_star = (first_only * b + second_cond * c + heron * mask)
        d_star = jnp.where(
            (jnp.sign(s_next) * jnp.sign(s) == 1) & (~is_last), d_star, 0.0)

        row_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        tri_strict = (row_i < col_i).astype(jnp.bfloat16)

        def excl_exact(x):
            hi = x.astype(jnp.bfloat16).astype(jnp.float32)
            lo = (x - hi).astype(jnp.bfloat16)
            return (jnp.dot(hi.astype(jnp.bfloat16), tri_strict,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(lo, tri_strict,
                              preferred_element_type=jnp.float32))

        dens = _laplace(s, beta0)
        e = jnp.where(is_last, 0.0, dists_m * dens)
        err = jnp.where(
            is_last, 0.0,
            jnp.exp(-d_star / beta0) * dists_m * dists_m
            / (4.0 * beta0 * beta0))
        # both prefixes in one stacked hi/lo matmul pair
        both = excl_exact(jnp.concatenate([e, err], axis=0))
        integral_excl = both[:block_rows]
        err_int = both[block_rows:] + err
        bound = (jnp.minimum(jnp.exp(err_int), 1e6) - 1.0) * jnp.exp(
            -integral_excl)
        bound = jnp.where(is_last, -jnp.inf, bound)
        max_bound = jnp.max(bound, axis=-1, keepdims=True)
        conv_ref[:] = (max_bound <= eps).astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def conv_check_pallas(z_vals, sdf, beta0, *, eps: float,
                      block_rows: int = 64, interpret: bool = False):
    """Per-ray converged flags (R,) bool — error bound at beta0 <= eps."""
    R, S = z_vals.shape
    if S > 512:
        block_rows = min(block_rows, 32)
    block_rows = min(block_rows, _round_up(R, 8))
    r_pad = _round_up(R, block_rows)

    def pad(x, val=0.0):
        return jnp.pad(x, ((0, r_pad - R), (0, 0)), constant_values=val)

    z_p = pad(z_vals)
    if r_pad != R:
        filler_z = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, S), (r_pad - R, S))
        z_p = z_p.at[R:].set(filler_z)
    sdf_p = pad(sdf, 1.0)

    kernel = _make_conv_kernel(S, eps, block_rows)
    conv = pl.pallas_call(
        kernel,
        grid=(r_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * S * S * 4,
            bytes_accessed=r_pad * S * 8,
            transcendentals=r_pad * S * 3),
        interpret=interpret,
    )(z_p, sdf_p, jnp.asarray(beta0, jnp.float32).reshape(1, 1))
    return conv[:R, 0] > 0.5


def make_conv_check_impl(cfg, block_rows: int = 64,
                         interpret: bool = False):
    """`(z_vals, sdf, beta0) -> (R,) bool` for error_bound_z_vals."""
    sg = jax.lax.stop_gradient

    def impl(z_vals, sdf, beta0):
        return conv_check_pallas(sg(z_vals), sg(sdf), sg(beta0),
                                 eps=cfg.eps, block_rows=block_rows,
                                 interpret=interpret)

    return impl


def make_round_impl(cfg, block_rows: int = 64, interpret: bool = False):
    """Adapter with the `round_update` signature for error_bound_z_vals.

    All inputs are stop_gradient'ed: the sampler is not differentiated
    (its callers stop-gradient the z outputs anyway) and severing AD here
    keeps JVP/VJP machinery from wrapping the pallas_call. The matmul
    phase runs on the full `block_rows`; the inverse-CDF phase loops
    over 8-row subgroups so its (rows, N, 128) masked-reduction
    temporaries stay within the 16 MB VMEM scoped limit.
    """
    sg = jax.lax.stop_gradient

    def impl(z_vals, sdf, beta, beta0, u, final):
        return sampler_round_pallas(
            sg(z_vals), sg(sdf), sg(beta), sg(u), sg(beta0),
            beta_iters=cfg.beta_iters, eps=cfg.eps, add_tiny=cfg.add_tiny,
            final=final, block_rows=block_rows, interpret=interpret)

    return impl
