"""Fused implicit-MLP forward + spatial gradient + features in one kernel.

The evaluation render path (`render_rays(training=False)`) needs
(sdf, feature, dSDF/dx) at every sample for the normal map
(`/root/reference/model/eval/recon.py:161-190` runs it under no_grad +
autograd-for-normals). As XLA this is a ~40-fusion chain per chunk; here
it is ONE kernel: the forward propagates activations AND three
forward-mode tangent streams (the xyz basis) through the layer stack,
entirely in VMEM.

Forward-mode through a layer y = act(x @ W + b):
    t_y = act'(z) * (t_x @ W)        (per tangent)
The embedding's tangents are analytic (d/dx of [x, sin(fx), cos(fx)]).
Softplus(beta=100)' = sigmoid(100 z) (1 above the linear threshold).

No AD rules: this path is never differentiated (eval only / detached
normals); callers pass stop_gradient'ed params.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.mlp import ImplicitNetConfig
from .fused_mlp import _materialize_weights, _round_up

_LANES = 128


def _make_kernel(cfg: ImplicitNetConfig, emb_dim: int, n_layers: int,
                 out_cols: int, block_rows: int):
    skip_in = set(cfg.skip_in)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(emb_ref, t0_ref, t1_ref, t2_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        out_ref, g_ref = refs[2 * n_layers], refs[2 * n_layers + 1]

        emb = emb_ref[:]                     # (BR, emb_pad) bf16
        tangents = [t0_ref[:], t1_ref[:], t2_ref[:]]  # embedding tangents
        h = emb
        th = list(tangents)
        for layer in range(n_layers):
            if layer in skip_in:
                keep = h.shape[-1] - emb_dim
                h = jnp.concatenate(
                    [h[:, :keep], emb[:, :emb_dim]], axis=-1) * inv_sqrt2
                h = h.astype(jnp.bfloat16)
                th = [
                    (jnp.concatenate(
                        [t[:, :keep], tangents[k][:, :emb_dim]], axis=-1)
                     * inv_sqrt2).astype(jnp.bfloat16)
                    for k, t in enumerate(th)
                ]
            w = w_refs[layer][:]
            z = jnp.dot(h, w, preferred_element_type=jnp.float32)
            z = z + b_refs[layer][:]
            tz = [jnp.dot(t, w, preferred_element_type=jnp.float32)
                  for t in th]
            if layer < n_layers - 1:
                # softplus(100 z)/100 with linear region; derivative is
                # sigmoid(100 z) saturating to 1
                act = jnp.where(z * 100.0 > 20.0, z,
                                jax.nn.softplus(z * 100.0) / 100.0)
                dact = jnp.where(z * 100.0 > 20.0, 1.0,
                                 jax.nn.sigmoid(z * 100.0))
                h = act.astype(jnp.bfloat16)
                th = [(dact * t).astype(jnp.bfloat16) for t in tz]
            else:
                h = z
                th = tz
        width = h.shape[-1]
        if width < out_cols:
            h = jnp.concatenate(
                [h, jnp.zeros((block_rows, out_cols - width), h.dtype)],
                axis=-1)
        out_ref[:] = h[:, :out_cols]
        # gradient of the sdf (column 0) wrt xyz
        g_ref[:] = jnp.concatenate(
            [th[0][:, :1], th[1][:, :1], th[2][:, :1],
             jnp.zeros((block_rows, 5), jnp.float32)], axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "block_rows",
                                             "interpret"))
def fused_sdf_outputs(params, cfg: ImplicitNetConfig, points: jnp.ndarray,
                      block_rows: int = 512, interpret: bool = False):
    """(N, 3) -> (sdf (N, 1), feat (N, F), grad (N, 3)), forward-only."""
    n = points.shape[0]
    dims = cfg.layer_dims()
    n_layers = len(dims) - 1
    feat_dim = cfg.feature_vector_size
    out_cols = _round_up(1 + feat_dim, _LANES)

    # Block-layout PE ([x | sin dim-major | cos dim-major], embedder.py)
    # + matching analytic tangents; shared with the training-path kernels.
    from .fused_grad import _embed_with_tangents

    feats, tangents = _embed_with_tangents(cfg, points)
    emb_dim = feats.shape[-1]
    emb_pad = _round_up(emb_dim, _LANES)

    n_pad = _round_up(max(n, 1), block_rows)

    def pad(x):
        return jnp.pad(x, ((0, n_pad - n), (0, emb_pad - emb_dim))
                       ).astype(jnp.bfloat16)

    feats_p = pad(feats)
    t_p = [pad(t) for t in tangents]

    ws, bs = _materialize_weights(params, cfg)
    ws = [w.astype(jnp.bfloat16) for w in ws]
    bs = [b.reshape(1, -1).astype(jnp.float32) for b in bs]

    kernel = _make_kernel(cfg, emb_dim, n_layers, out_cols, block_rows)
    grid = (n_pad // block_rows,)
    row_spec = pl.BlockSpec((block_rows, emb_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [row_spec, row_spec, row_spec, row_spec]
    in_specs += [pl.BlockSpec(w.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for w in ws]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for b in bs]

    out, grad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_rows, out_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad * sum(w.shape[0] * w.shape[1] for w in ws),
            bytes_accessed=n_pad * (4 * emb_pad * 2 + out_cols * 4),
            transcendentals=4 * n_pad * sum(dims[1:-1])),
        interpret=interpret,
    )(feats_p, *t_p, *ws, *bs)

    sdf = out[:n, :1]
    feat = out[:n, 1:1 + feat_dim]
    grad = grad[:n, :3]
    if cfg.sdf_bounding_sphere > 0.0:
        # clamp + its gradient branch
        norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
        sphere_sdf = cfg.sphere_scale * (cfg.sdf_bounding_sphere - norm)
        take_sphere = sphere_sdf < sdf
        sphere_grad = -cfg.sphere_scale * points / jnp.maximum(norm, 1e-12)
        sdf = jnp.minimum(sdf, sphere_sdf)
        grad = jnp.where(take_sphere, sphere_grad, grad)
    return sdf, feat, grad
