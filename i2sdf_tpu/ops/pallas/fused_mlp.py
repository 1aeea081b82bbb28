"""Fused implicit-MLP SDF evaluation as a single Pallas TPU kernel.

The hot op of the whole framework: the error-bound sampler evaluates the
SDF MLP on ~640 points/ray/step with no gradients
(`/root/reference/model/network/ray_sampler.py:88-89` does this under
`torch.no_grad()`), and mesh extraction evaluates 512^3 grids
(`model/eval/recon.py:89`). As a chain of XLA matmuls each layer's
(N, 256) activation round-trips HBM (~16 GB of traffic per training
step at the shipped config); this kernel keeps the whole layer stack in
VMEM:

* all (padded) weight matrices live in VMEM across the grid (~1 MB bf16);
* a block of `block_rows` points flows through every layer before its
  SDF is written back — HBM traffic is one (N, 128) bf16 read + one
  (N, 8) f32 write;
* matmuls run on the MXU in bf16 with f32 accumulation
  (`preferred_element_type`) — the same precision regime as the
  reference's TF32 matmuls (`main_recon.py:61`);
* softplus(beta=100) epilogues run on the VPU between matmuls;
* the skip connection re-injects the positional encoding from the input
  block (no second HBM read).

Gradient paths (rendering forward, eikonal) use the plain XLA MLP —
this kernel is for the no-grad evaluation only and the caller must pass
stop_gradient'ed parameters.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import mlp as mlp_mod
from ...models.mlp import ImplicitNetConfig

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softplus100(x):
    # float32 in/out; linear above threshold like torch Softplus(100)
    return jnp.where(x * 100.0 > 20.0, x, jax.nn.softplus(x * 100.0) / 100.0)


def _materialize_weights(params, cfg: ImplicitNetConfig):
    """Effective (in, out) f32 weights + biases per layer, padded so the
    first layer's input is _LANES wide and every narrowed (skip-target)
    output is padded back to the full width with zero columns."""
    dims = cfg.layer_dims()
    n_layers = len(dims) - 1
    ws, bs = [], []
    for layer in range(n_layers):
        p = params[f"lin{layer}"]
        w = mlp_mod.linear_weight(p)
        b = p["b"]
        in_dim, out_dim = w.shape
        if layer == 0:
            w = jnp.pad(w, ((0, _round_up(in_dim, _LANES) - in_dim), (0, 0)))
        if layer + 1 in cfg.skip_in:
            # narrowed output: pad to dims[layer+1] with zero cols; the
            # skip concat overwrites those columns with the embedding
            pad_out = dims[layer + 1] - out_dim
            w = jnp.pad(w, ((0, 0), (0, pad_out)))
            b = jnp.pad(b, (0, pad_out))
        ws.append(w)
        bs.append(b)
    return ws, bs


def _make_kernel(cfg: ImplicitNetConfig, emb_dim: int, n_layers: int,
                 out_cols: int, pe_freqs: tuple | None = None,
                 emb_pad: int | None = None, block_rows: int | None = None,
                 clamp: tuple | None = None, act_impl: str = "f32"):
    """When `pe_freqs` is given the kernel input is raw (BR, 8)-padded
    xyz and the positional encoding is built on the VPU in-kernel (one
    less XLA fusion + 2x less HBM read per sampler round). When `clamp`
    = (sphere_scale, radius) is given, an extra f32 (BR, 8) points ref
    follows the embedding ref and the bounding-sphere clamp
    min(sdf, scale*(R-|x|)) happens in-kernel (mlp.py:147-150 parity),
    saving one XLA fusion per sampler round."""
    skip_in = set(cfg.skip_in)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(emb_ref, *refs):
        if clamp is not None:
            pts_ref, *refs = refs
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        out_ref = refs[2 * n_layers]

        if pe_freqs is not None:
            pts = emb_ref[:][:, :3].astype(jnp.float32)
            parts = [pts]
            for f in pe_freqs:
                parts.append(jnp.sin(pts * f))
                parts.append(jnp.cos(pts * f))
            parts.append(jnp.zeros((block_rows, emb_pad - emb_dim),
                                   jnp.float32))
            emb = jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)
        else:
            emb = emb_ref[:]  # (TN, emb_pad) bf16

        h = emb
        for layer in range(n_layers):
            if layer in skip_in:
                keep = h.shape[-1] - emb_dim
                h = jnp.concatenate(
                    [h[:, :keep], emb[:, :emb_dim]], axis=-1) * inv_sqrt2
                h = h.astype(jnp.bfloat16)
            x = jnp.dot(h, w_refs[layer][:],
                        preferred_element_type=jnp.float32)
            x = x + b_refs[layer][:]
            if layer < n_layers - 1:
                # The f32 softplus epilogue stays: two cheaper variants
                # were built and measured on-chip (scripts/
                # bench_fused_mlp.py) and both REJECTED. (a) packed-bf16
                # epilogue: Mosaic on v5e refuses packed-bf16 vector ops
                # outright (cmpf AND the comparison-free max/abs/exp
                # chain both fail to lower). (b) Pade-tail f32
                # (softplus100(x) = max(x,0) + pade_log1p(exp(-100|x|))
                # /100, one transcendental instead of two): measured
                # SLOWER (3.44 vs 2.90 ms at block 2048 — the div eats
                # the exp saving) with 7e-3 max SDF dev. Run-to-run chip
                # variance is ~10%, larger than either effect. act_impl
                # "none" remains as the diagnostic no-epilogue roof
                # (~0.6 ms of a ~3.0 ms launch at the shipped config).
                if act_impl == "none":  # diagnostic roof only
                    h = x.astype(jnp.bfloat16)
                else:
                    h = _softplus100(x).astype(jnp.bfloat16)
            else:
                h = x  # final layer stays f32
        h = h[:, :out_cols]
        if clamp is not None:
            scale, radius = clamp
            p = pts_ref[:][:, :3]
            sphere = scale * (radius - jnp.sqrt(
                jnp.sum(p * p, axis=-1, keepdims=True)))
            lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
            h = jnp.where(lane == 0, jnp.minimum(h, sphere), h)
        out_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "block_rows",
                                             "interpret", "act_impl"))
def fused_sdf_mlp(params, cfg: ImplicitNetConfig, points: jnp.ndarray,
                  block_rows: int = 1024, interpret: bool = False,
                  act_impl: str = "f32"):
    """(N, 3) points -> (N,) clamped SDF via one fused kernel launch."""
    n = points.shape[0]
    dims = cfg.layer_dims()
    n_layers = len(dims) - 1

    n_pad = _round_up(max(n, 1), block_rows)
    # NOTE: in-kernel PE (pe_freqs path in _make_kernel) measured SLOWER
    # than XLA-side PE on v5e (18.9k vs 25.8k rays/s end-to-end): Mosaic
    # relayouts for 3-lane sin/cos concats dominate. PE stays in XLA.
    pe_freqs = None
    embed = cfg.embed_fn()
    feats = embed(points) if embed is not None else points
    emb_dim = feats.shape[-1]
    emb_pad = _round_up(emb_dim, _LANES)
    feats = jnp.pad(feats, ((0, n_pad - n), (0, emb_pad - emb_dim)))
    feats = feats.astype(jnp.bfloat16)
    in_cols = emb_pad

    ws, bs = _materialize_weights(params, cfg)

    out_cols = 8  # col 0 = sdf; small tile keeps the writeback tiny
    # only the SDF column is consumed — slice the final layer to the
    # first out_cols columns (the 256->257 feature head is ~12% of the
    # network's MACs and dead weight on this no-grad path)
    wl, bl = ws[-1][:, :out_cols], bs[-1][:out_cols]
    if wl.shape[1] < out_cols:  # tiny heads: pad back to the tile
        wl = jnp.pad(wl, ((0, 0), (0, out_cols - wl.shape[1])))
        bl = jnp.pad(bl, (0, out_cols - bl.shape[0]))
    ws[-1], bs[-1] = wl, bl
    ws = [w.astype(jnp.bfloat16) for w in ws]
    bs = [b.reshape(1, -1).astype(jnp.float32) for b in bs]

    clamp = None
    clamp_inputs = ()
    if cfg.sdf_bounding_sphere > 0.0:
        clamp = (float(cfg.sphere_scale), float(cfg.sdf_bounding_sphere))
        pts_pad = jnp.pad(points.astype(jnp.float32),
                          ((0, n_pad - n), (0, 8 - points.shape[-1])))
        clamp_inputs = (pts_pad,)

    kernel = _make_kernel(cfg, emb_dim, n_layers, out_cols,
                          pe_freqs=pe_freqs, emb_pad=emb_pad,
                          block_rows=block_rows, clamp=clamp,
                          act_impl=act_impl)

    grid = (n_pad // block_rows,)
    in_specs = [
        pl.BlockSpec((block_rows, in_cols), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if clamp is not None:
        in_specs += [
            pl.BlockSpec((block_rows, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs += [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ]
    in_specs += [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for b in bs
    ]

    flops = 2 * n_pad * sum(w.shape[0] * w.shape[1] for w in ws)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_pad * (emb_pad + out_cols) * 2,
            transcendentals=n_pad * sum(dims[1:-1])),
        interpret=interpret,
    )(feats, *clamp_inputs, *ws, *bs)

    sdf = out[:n, 0]
    return sdf


def fused_sdf_fn(params, cfg: ImplicitNetConfig, block_rows: int = 1024,
                 interpret: bool = False):
    """Bind params/config into an `(N, 3) -> (N,)` sampler-compatible
    evaluator (stop_gradient applied — this path is never differentiated)."""
    frozen = jax.lax.stop_gradient(params)

    def fn(pts):
        return fused_sdf_mlp(frozen, cfg, pts, block_rows=block_rows,
                             interpret=interpret)

    return fn
