"""On-chip experiment: can the sampler's fused SDF MLP kernel overlap
its softplus epilogues (VPU) with matmuls (MXU)?

The shipped kernel (`ops/pallas/fused_mlp.py`) runs ~71 TFLOP/s at the
flagship 8x256 config: each layer is dot -> softplus -> dot, a serial
chain where the MXU idles during every (BR, 256) f32 softplus. This
experiment interleaves TWO independent row-halves per block
(h1's softplus can run while h2's matmul occupies the MXU — straight-
line independent ops the Mosaic scheduler may co-issue) and sweeps
block sizes. Numerics are IDENTICAL to the shipped kernel (same f32
softplus, same bf16/f32 matmul regime) — this is pure scheduling.

Usage (real TPU): python scripts/bench_mlp_variants.py [--n 204800]
Prints one JSON line per variant.
"""

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2sdf_tpu.utils.jax_cache import set_compilation_cache

set_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2sdf_tpu.models.mlp import ImplicitNetConfig, implicit_net_init
from i2sdf_tpu.ops.pallas.fused_mlp import (_make_kernel,
                                            _materialize_weights, _round_up,
                                            _softplus100, fused_sdf_mlp)

_LANES = 128

ICFG = ImplicitNetConfig(
    feature_vector_size=256, sdf_bounding_sphere=3.0, dims=(256,) * 8,
    skip_in=(4,), bias=0.6, embed_type="positional", multires=6)


def _act_variant(x, act: str):
    if act == "none":
        return x
    if act == "bf16":
        xb = x.astype(jnp.bfloat16)
        return jnp.where(xb * 100.0 > 20.0, xb,
                         jax.nn.softplus(xb * 100.0) / 100.0)
    if act == "fast":
        # max(x, 0) + log1p(exp(-|100x|))/100: one exp of a bounded
        # NEGATIVE argument (no overflow branch), algebraically equal to
        # softplus for all x. log1p stays f32.
        return jnp.maximum(x, 0.0) + jnp.log1p(
            jnp.exp(-jnp.abs(x * 100.0))) / 100.0
    return _softplus100(x)


def _make_split_kernel(cfg, emb_dim, n_layers, out_cols, block_rows,
                       clamp, n_split, act="f32"):
    """Same math as fused_mlp._make_kernel (XLA-side PE path), with the
    block row-split n_split ways and layers interleaved across splits."""
    skip_in = set(cfg.skip_in)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    rows = block_rows // n_split

    def kernel(emb_ref, *refs):
        if clamp is not None:
            pts_ref, *refs = refs
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        out_ref = refs[2 * n_layers]

        embs = [emb_ref[pl.ds(i * rows, rows), :] for i in range(n_split)]
        hs = list(embs)
        for layer in range(n_layers):
            if layer in skip_in:
                for i in range(n_split):
                    keep = hs[i].shape[-1] - emb_dim
                    h = jnp.concatenate(
                        [hs[i][:, :keep], embs[i][:, :emb_dim]],
                        axis=-1) * inv_sqrt2
                    hs[i] = h.astype(jnp.bfloat16)
            # issue all splits' matmuls, then all epilogues: the
            # epilogue of split i is independent of split j's matmul,
            # giving the scheduler MXU/VPU overlap to exploit
            xs = [jnp.dot(hs[i], w_refs[layer][:],
                          preferred_element_type=jnp.float32)
                  + b_refs[layer][:] for i in range(n_split)]
            if layer < n_layers - 1:
                hs = [_act_variant(x, act).astype(jnp.bfloat16)
                      for x in xs]
            else:
                hs = xs
        for i in range(n_split):
            h = hs[i][:, :out_cols]
            if clamp is not None:
                scale, radius = clamp
                p = pts_ref[pl.ds(i * rows, rows), :][:, :3]
                sphere = scale * (radius - jnp.sqrt(
                    jnp.sum(p * p, axis=-1, keepdims=True)))
                lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
                h = jnp.where(lane == 0, jnp.minimum(h, sphere), h)
            out_ref[pl.ds(i * rows, rows), :] = h

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("cfg", "block_rows", "n_split", "act"))
def fused_sdf_mlp_split(params, cfg, points, block_rows=1024, n_split=2,
                        act="f32"):
    n = points.shape[0]
    dims = cfg.layer_dims()
    n_layers = len(dims) - 1
    n_pad = _round_up(max(n, 1), block_rows)
    embed = cfg.embed_fn()
    feats = embed(points) if embed is not None else points
    emb_dim = feats.shape[-1]
    emb_pad = _round_up(emb_dim, _LANES)
    feats = jnp.pad(feats, ((0, n_pad - n), (0, emb_pad - emb_dim)))
    feats = feats.astype(jnp.bfloat16)

    ws, bs = _materialize_weights(params, cfg)
    out_cols = 8
    wl, bl = ws[-1][:, :out_cols], bs[-1][:out_cols]
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

    kernel = _make_split_kernel(cfg, emb_dim, n_layers, out_cols,
                                block_rows, clamp, n_split, act=act)
    grid = (n_pad // block_rows,)
    in_specs = [pl.BlockSpec((block_rows, emb_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if clamp is not None:
        in_specs += [pl.BlockSpec((block_rows, 8), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(w.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for w in ws]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for b in bs]
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * sum(w.shape[0] * w.shape[1] for w in ws),
            bytes_accessed=n_pad * (emb_pad + out_cols) * 2,
            transcendentals=n_pad * sum(dims[1:-1])),
    )(feats, *clamp_inputs, *ws, *bs)
    return out[:n, 0]


def timeit(fn, *args, steps=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=204800)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    params = implicit_net_init(jax.random.PRNGKey(0), ICFG)
    pts = jax.random.normal(jax.random.PRNGKey(1), (args.n, 3)) * 1.5

    dims = ICFG.layer_dims()
    flops = 0
    for i in range(len(dims) - 1):
        d_in = dims[i] + (dims[0] if i in ICFG.skip_in else 0)
        d_out = 8 if i == len(dims) - 2 else dims[i + 1]
        flops += 2 * d_in * d_out
    flops *= args.n

    base = np.asarray(fused_sdf_mlp(params, ICFG, pts))
    rows = []
    for br in (512, 1024, 2048):
        ms = timeit(lambda: fused_sdf_mlp(params, ICFG, pts,
                                          block_rows=br), steps=args.steps)
        rows.append({"variant": f"shipped_br{br}", "ms": round(ms, 3),
                     "tflops": round(flops / ms / 1e9, 1)})
    for br, spl, act in ((1024, 1, "f32"), (1024, 1, "none"),
                         (1024, 1, "bf16"), (1024, 1, "fast"),
                         (1024, 2, "fast"), (2048, 1, "fast"),
                         (1024, 2, "f32")):
        try:
            got = np.asarray(fused_sdf_mlp_split(params, ICFG, pts,
                                                 block_rows=br,
                                                 n_split=spl, act=act))
            err = float(np.max(np.abs(got - base)))
            ms = timeit(lambda: fused_sdf_mlp_split(params, ICFG, pts,
                                                    block_rows=br,
                                                    n_split=spl,
                                                    act=act),
                        steps=args.steps)
            rows.append({"variant": f"split{spl}_br{br}_{act}",
                         "ms": round(ms, 3),
                         "tflops": round(flops / ms / 1e9, 1),
                         "max_abs_err_vs_shipped": err})
        except Exception as e:  # VMEM OOM etc. — record and continue
            rows.append({"variant": f"split{spl}_br{br}_{act}",
                         "error": str(e).split("\n")[0][:160]})
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
