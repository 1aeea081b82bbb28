"""Sampling primitives: stratified bins and inverse-CDF (importance) draws.

Static-shape, vectorized versions of the reference's sampling math
(`/root/reference/model/network/ray_sampler.py:30-41,186-207`); all run
inside `jit` with no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis via triangular matmul.

    XLA's native cumsum lowers to a serial/log-shift form costing ~1 ms
    per (1600, 640) call on TPU; one (S, S) upper-triangular matmul on
    the MXU is ~30 us. The error-bound sampler issues ~125 prefix sums
    per training step (beta bisection), making this the difference
    between a sampler-bound and an MLP-bound step. f32 algorithm
    (HIGHEST) — transmittance sums are precision-sensitive.
    """
    n = x.shape[-1]
    if n < 128:
        # small rows: XLA's log-shift lowering is fine and avoids an
        # (n, n) constant
        return jnp.cumsum(x, axis=-1)
    tri = jnp.triu(jnp.ones((n, n), jnp.float32))  # tri[j, t]=1 for t>=j
    # hi/lo split: two DEFAULT-precision (bf16-input) matmuls recover
    # ~f32 accuracy (the mask matrix is exact in bf16; the residual
    # carries the dropped mantissa bits). A single bf16 pass can make
    # the prefix locally non-monotone, which breaks CDF bracketing at
    # u ~ 1. Still ~15x faster than XLA's native cumsum lowering.
    def mm(a):
        return jax.lax.dot_general(
            a, tri, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    return mm(hi) + mm(lo)


def stratify(key, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Jitter each sample uniformly within its midpoint-delimited bin
    (parity: ray_sampler.py:33-41)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def linear_z_vals(near: jnp.ndarray, far: jnp.ndarray, n: int) -> jnp.ndarray:
    """near/far: (R, 1) -> (R, n) linearly spaced depths."""
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    return near * (1.0 - t) + far * t


def sample_cdf(bins: jnp.ndarray, cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transform sampling from a per-ray piecewise-linear CDF.

    bins: (R, B) bin edges; cdf: (R, B) cumulative (starting at 0);
    u: (R, N) in [0, 1]. Returns (R, N) samples.
    Parity: ray_sampler.py:193-207 (incl. the denom < 1e-5 -> 1 guard).
    """
    # method='compare_all': O(B) broadcast-compare + reduce per query —
    # the TPU-friendly form (default 'scan' lowers to a serial loop that
    # costs ~50 ms at (1600, 640) vs ~1 ms for compare_all)
    inds = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right",
                                       method="compare_all"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def pdf_to_cdf(pdf: jnp.ndarray) -> jnp.ndarray:
    """Normalize a per-ray pdf over bins and prepend a zero: (R, B-1) -> (R, B).

    All-zero rows fall back to a uniform pdf instead of 0/0. Possible
    whenever `add_tiny=0` (the reference's own default,
    `ray_sampler.py:49`) at small beta: the bound error is ~0 before
    the surface and the transmittance ~0 after it, and one NaN z-value
    would otherwise poison the parameters permanently through Adam."""
    total = jnp.sum(pdf, axis=-1, keepdims=True)
    pdf = jnp.where(total > 0, pdf / jnp.maximum(total, 1e-30),
                    1.0 / pdf.shape[-1])
    cdf = prefix_sum(pdf)
    return jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)


def gumbel_topk_sample(key, log_weights: jnp.ndarray, k: int):
    """Draw k indices WITHOUT replacement ~ weights via Gumbel-top-k.

    TPU-native substitute for `torch.multinomial(replacement=False)` used
    by the bubble sampler (`/root/reference/model/trainer/recon.py:168`):
    no host sync, one fused top-k. `log_weights` may contain -inf for
    masked-out entries. Returns (indices (k,), key-consumed).
    """
    g = jax.random.gumbel(key, log_weights.shape, dtype=log_weights.dtype)
    _, idx = jax.lax.top_k(log_weights + g, k)
    return idx
