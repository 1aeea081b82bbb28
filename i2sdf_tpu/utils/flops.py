"""Analytic (algorithmic) FLOP model for one training step.

`mfu_sustained` in bench.py divides XLA's FLOP count of the COMPILED
program by wall x peak — but XLA counts every FLOP the program executes
as useful: the per-round d*/bisection recomputation over the widening
(R, S) set, the (S, S) triangular-matmul prefix sums, duplicate-sample
work emitted by the early-exit passthrough, and padding. That number
bounds KERNEL headroom only (round-3 VERDICT Weak #2).

This module counts the FLOPs the ALGORITHM requires — the useful work
a perfect implementation of the reference's semantics
(`/root/reference/model/network/ray_sampler.py:84-151`,
`/root/reference/model/network/__init__.py:80-221`) would spend:

* sampler: one no-grad MLP forward per NEW sample point per round that
  actually runs (the reference evaluates only new samples too,
  `ray_sampler.py:84-95`); the round math (d*, 10-step bisection,
  inverse-CDF) is O(R*S) elementwise — negligible next to the MLP
  matmuls and excluded;
* render: SDF + radiance forward over the final `N_samples +
  N_samples_extra + 2` samples per ray, the SDF input-gradient for
  normals (reverse-mode VJP ~= 2x forward), and the loss backward
  through that whole graph (~= 2x the forward graph) — the standard
  1:2 forward:backward convention;
* eikonal: 3R extra points (uniform cube + near-surface + jittered
  neighbor, renderer.py parity of `network/__init__.py:176-193`)
  through the same fwd + input-grad + backward stack;
* optimizer/embedder/compositing: O(params + R*S) — excluded.

`mfu_algorithmic = algorithmic_flops / (step_wall * peak)` is the
number that bounds TOTAL headroom: kernel headroom is (mfu_sustained /
mfu_algorithmic) of remaining fat, and anything below 1.0 /
mfu_algorithmic is reachable only by changing the algorithm (fewer
sampler rounds/points), not by faster kernels.
"""

from __future__ import annotations


def mlp_flops_per_point(layer_dims, skip_in=(), d_in_embedded=None) -> int:
    """2 * MACs of one forward pass through a skip-MLP.

    `layer_dims` is [in, h1, ..., hk, out] AFTER embedding (i.e.
    `ImplicitNetConfig.layer_dims()`); a layer listed in `skip_in`
    consumes [prev_out, embedded_input] but its producing layer was
    narrowed so every layer's input width is exactly layer_dims[l]
    (mlp.py:152-165) — the plain chain product is already correct.
    """
    macs = 0
    for l in range(len(layer_dims) - 1):
        macs += layer_dims[l] * layer_dims[l + 1]
    return 2 * macs


def implicit_fwd_flops(icfg) -> int:
    """One SDF-net forward (embedding excluded: sin/cos over ~39 ch is
    O(100) flops/point vs ~1.1e6 for the matmuls)."""
    return mlp_flops_per_point(icfg.layer_dims(), icfg.skip_in)


def rendering_fwd_flops(rcfg) -> int:
    return mlp_flops_per_point(rcfg.layer_dims())


def train_step_flops(cfg, batch_size: int, sampler_rounds: int | None = None,
                     bubble_points: int = 0) -> dict:
    """Algorithmic FLOPs of one training step at `batch_size` rays.

    `sampler_rounds` = rounds the error-bound loop actually runs at the
    current beta regime (the reference's while loop; 5 = worst case /
    late schedule, fewer when the global bound converges early).
    Returns a breakdown dict; key "total" is the headline.
    """
    R = batch_size
    s = cfg.sampler
    if sampler_rounds is None:
        sampler_rounds = s.max_total_iters
    f_imp = implicit_fwd_flops(cfg.implicit)
    f_ren = rendering_fwd_flops(cfg.rendering)

    # --- sampler: no-grad forwards over new points only ------------------
    # round 0 evaluates the uniform init; each subsequent round evaluates
    # that round's eval budget of new pdf draws (ray_sampler.py:84-95;
    # per-round counts via SamplerConfig.round_eval_counts)
    sampler_pts = R * sum(s.eval_counts[:sampler_rounds])
    sampler = sampler_pts * f_imp

    # --- differentiated render over the final sample set -----------------
    # fwd graph per point: SDF fwd + input-grad VJP (~2x fwd) + radiance
    # fwd; loss backward ~= 2x the fwd graph => 3x total
    n_render = R * s.total_fg_samples
    render = n_render * 3 * (3 * f_imp + f_ren)

    # --- eikonal/smoothness points (3R: cube + near-surface + jitter) ----
    eik = 3 * R * 3 * (3 * f_imp)

    # --- bubble surface-SDF points (fwd + backward, no input grad) -------
    bubble = bubble_points * 3 * f_imp

    total = sampler + render + eik + bubble
    return {
        "implicit_fwd_flops_per_point": f_imp,
        "rendering_fwd_flops_per_point": f_ren,
        "sampler_points": sampler_pts,
        "sampler_flops": sampler,
        "render_points": n_render,
        "render_flops": render,
        "eikonal_flops": eik,
        "bubble_flops": bubble,
        "total": total,
    }
