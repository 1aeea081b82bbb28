"""Custom-VJP fused SDF forward (value + features + spatial gradient)
with a hand-written Pallas backward — the training hot path.

The training step differentiates the render forward w.r.t. parameters
THROUGH the per-point spatial gradient (normal-map loss), i.e.
second-order terms. As XLA this is the dominant chain of the optimizer
step (~60% at the shipped config); here forward and backward are one
Pallas kernel launch each.

Per layer (z = h W + b, act = softplus(100.)/100., tangent streams
t_out^k = act'(z) * (t_in^k W) for the xyz basis k):

backward, given adjoints dh_out (primal) and r_out^k (tangents):
    dz     = dh_out * act'(z) + sum_k r_out^k * (t_in^k W) * act''(z)
    rho^k  = r_out^k * act'(z)
    dW    += h_in^T dz + sum_k (t_in^k)^T rho^k
    db    += sum_rows(dz)
    dh_in  = dz W^T ;   r_in^k = rho^k W^T
with act' = sigmoid(100 z) (1 in the linear region) and act'' =
100 s (1-s) (0 in the linear region). The skip layer's concat/sqrt(2)
splits adjoints; the embedding block is constant (ray positions are
stop_gradient'd upstream, so dx is not produced).

The backward stashes only h_in / t_in^k (bf16) per layer and recomputes
z / t_in W on the MXU during the reverse sweep — f32 activation
precision without the VMEM cost. dW/db accumulate across grid steps in
VMEM-resident output blocks. Weight-norm (v, g) stays OUTSIDE: callers
materialize W via `linear_weight` (differentiable XLA), so this op's
weight cotangents flow back through the reparametrization for free.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.mlp import ImplicitNetConfig
from .fused_mlp import _round_up

_LANES = 128


def _embed_with_tangents(cfg: ImplicitNetConfig, points):
    """Positional encoding + analytic xyz tangents (XLA-side, wide ops).

    Block PE layout (models/embedder.py): emb = [x | sin(x@B) | cos(x@B)]
    with B[i, i*F+j] = f_j, so d emb/dx_k = [e_k | cos(xf)*B[k] |
    -sin(xf)*B[k]] — three wide elementwise products instead of the 2F
    per-frequency (N, 3) concats of the interleaved layout."""
    from ...models.embedder import pe_frequencies

    embed = cfg.embed_fn()
    one = jnp.ones_like(points[:, :1])
    eye = [jnp.concatenate([one if i == k else 0 * one for i in range(3)],
                           axis=-1) for k in range(3)]
    if embed is None:
        return points, eye
    feats = embed(points)
    freqs = pe_frequencies(cfg.multires)
    F = cfg.multires
    B = np.zeros((3, 3 * F), np.float32)
    for i in range(3):
        B[i, i * F:(i + 1) * F] = freqs
    xf = points @ jnp.asarray(B)
    sin_xf, cos_xf = jnp.sin(xf), jnp.cos(xf)
    tangents = [
        jnp.concatenate([eye[k], cos_xf * B[k], -sin_xf * B[k]], axis=-1)
        for k in range(3)
    ]
    return feats, tangents


def _act_all(z):
    act = jnp.where(z * 100.0 > 20.0, z, jax.nn.softplus(z * 100.0) / 100.0)
    s = jax.nn.sigmoid(z * 100.0)
    dact = jnp.where(z * 100.0 > 20.0, 1.0, s)
    d2act = jnp.where(z * 100.0 > 20.0, 0.0, 100.0 * s * (1.0 - s))
    return act, dact, d2act


def _forward_stash(emb, tangents, w_refs, b_refs, n_layers, skip_in,
                   emb_dim):
    """Shared forward sweep; returns (h, th, h_in_l, t_in_l)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    h = emb
    th = list(tangents)
    h_in_l, t_in_l = [], []
    for layer in range(n_layers):
        if layer in skip_in:
            # h arrives already narrowed (raw unpadded weights): concat
            # the WHOLE h with the embedding block
            h = (jnp.concatenate([h, emb[:, :emb_dim]], -1)
                 * inv_sqrt2).astype(jnp.bfloat16)
            th = [(jnp.concatenate([t, tangents[k][:, :emb_dim]], -1)
                   * inv_sqrt2).astype(jnp.bfloat16)
                  for k, t in enumerate(th)]
        h_in_l.append(h)
        t_in_l.append(th)
        w = w_refs[layer][:]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) \
            + b_refs[layer][:]
        tz = [jnp.dot(t, w, preferred_element_type=jnp.float32) for t in th]
        if layer < n_layers - 1:
            act, dact, _ = _act_all(z)
            h = act.astype(jnp.bfloat16)
            th = [(dact * t).astype(jnp.bfloat16) for t in tz]
        else:
            h, th = z, tz
    return h, th, h_in_l, t_in_l


def _make_fwd_kernel(cfg, emb_dim, n_layers, out_cols, block_rows):
    skip_in = set(cfg.skip_in)

    def kernel(emb_ref, t0_ref, t1_ref, t2_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        out_ref, g_ref = refs[2 * n_layers], refs[2 * n_layers + 1]
        h, th, _, _ = _forward_stash(
            emb_ref[:], [t0_ref[:], t1_ref[:], t2_ref[:]], w_refs, b_refs,
            n_layers, skip_in, emb_dim)
        width = h.shape[-1]
        if width < out_cols:
            h = jnp.concatenate(
                [h, jnp.zeros((block_rows, out_cols - width), h.dtype)], -1)
        out_ref[:] = h[:, :out_cols]
        g_ref[:] = jnp.concatenate(
            [th[0][:, :1], th[1][:, :1], th[2][:, :1],
             jnp.zeros((block_rows, 5), jnp.float32)], -1)

    return kernel


def _make_bwd_kernel(cfg, emb_dim, n_layers, dims, out_cols, block_rows):
    skip_in = set(cfg.skip_in)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(*refs):
        emb_ref, t0_ref, t1_ref, t2_ref, cout_ref, cg_ref = refs[:6]
        w_refs = refs[6:6 + n_layers]
        b_refs = refs[6 + n_layers:6 + 2 * n_layers]
        dw_refs = refs[6 + 2 * n_layers:6 + 3 * n_layers]
        db_refs = refs[6 + 3 * n_layers:6 + 4 * n_layers]

        first = pl.program_id(0) == 0
        _, _, h_in_l, t_in_l = _forward_stash(
            emb_ref[:], [t0_ref[:], t1_ref[:], t2_ref[:]], w_refs, b_refs,
            n_layers, skip_in, emb_dim)

        last_w = dims[-1]
        dh = cout_ref[:][:, :last_w]
        c_g = cg_ref[:]
        zeros_tail = jnp.zeros((block_rows, last_w - 1), jnp.float32)
        r = [jnp.concatenate([c_g[:, k:k + 1], zeros_tail], -1)
             for k in range(3)]

        for layer in reversed(range(n_layers)):
            w = w_refs[layer][:]
            h_in = h_in_l[layer]
            t_in = t_in_l[layer]
            if layer < n_layers - 1:
                # recompute z and tangent pre-activations on the MXU
                z = jnp.dot(h_in, w, preferred_element_type=jnp.float32) \
                    + b_refs[layer][:]
                tz = [jnp.dot(t, w, preferred_element_type=jnp.float32)
                      for t in t_in]
                _, dact, d2act = _act_all(z)
                dz = dh * dact
                for k in range(3):
                    dz = dz + r[k] * tz[k] * d2act
                rho = [r[k] * dact for k in range(3)]
            else:
                dz = dh
                rho = r
            dzb = dz.astype(jnp.bfloat16)
            rhob = [x.astype(jnp.bfloat16) for x in rho]
            # contract over rows via dimension_numbers — an explicit .T
            # is a costly Mosaic relayout
            def _atb(a, b):
                return jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            dw = _atb(h_in, dzb)
            for k in range(3):
                dw = dw + _atb(t_in[k], rhob[k])
            db = jnp.sum(dz, axis=0, keepdims=True)

            @pl.when(first)
            def _init(layer=layer, dw=dw, db=db):
                dw_refs[layer][:] = dw
                db_refs[layer][:] = db

            @pl.when(jnp.logical_not(first))
            def _acc(layer=layer, dw=dw, db=db):
                dw_refs[layer][:] = dw_refs[layer][:] + dw
                db_refs[layer][:] = db_refs[layer][:] + db

            if layer == 0:
                break

            def _abt(a, b):
                # a (BR, out) x b (in, out) -> (BR, in): contract over cols
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            wb = w.astype(jnp.bfloat16) if w.dtype != jnp.bfloat16 else w
            dh_full = _abt(dzb, wb)
            r_full = [_abt(rhob[k], wb) for k in range(3)]
            if layer in skip_in:
                keep = dims[layer] - emb_dim
                dh = dh_full[:, :keep] * inv_sqrt2
                r = [x[:, :keep] * inv_sqrt2 for x in r_full]
            else:
                dh = dh_full
                r = r_full

    return kernel


def _prep(cfg, ws, bs, x, block_rows):
    """Embed + pad everything to kernel-friendly shapes."""
    n = x.shape[0]
    feats, tangents = _embed_with_tangents(cfg, x)
    emb_dim = feats.shape[-1]
    emb_pad = _round_up(emb_dim, _LANES)
    n_pad = _round_up(max(n, 1), block_rows)

    def pad_rows(a):
        return jnp.pad(a, ((0, n_pad - n), (0, emb_pad - emb_dim))
                       ).astype(jnp.bfloat16)

    feats_p = pad_rows(feats)
    t_p = [pad_rows(t) for t in tangents]
    ws_p = [jnp.pad(ws[0], ((0, emb_pad - ws[0].shape[0]), (0, 0)))
            .astype(jnp.bfloat16)] + [w.astype(jnp.bfloat16)
                                      for w in ws[1:]]
    bs_p = [b.reshape(1, -1).astype(jnp.float32) for b in bs]
    return feats_p, t_p, ws_p, bs_p, n_pad, emb_dim, emb_pad


@functools.lru_cache(maxsize=None)
def get_sdf_outputs_op(cfg: ImplicitNetConfig, block_rows: int = 128,
                       interpret: bool = False):
    """custom_vjp op: (ws, bs, x) -> (out (N, 1+F), grad_x (N, 3)).

    `ws`/`bs` are the materialized per-layer weights (tuples); the SDF
    clamp (bounding sphere) is NOT applied — callers compose it in XLA.
    """
    dims = cfg.layer_dims()
    n_layers = len(dims) - 1
    out_dim = dims[-1]
    out_cols = _round_up(out_dim, _LANES)
    skip = pl.BlockSpec  # alias

    def _forward(ws, bs, x):
        n = x.shape[0]
        feats_p, t_p, ws_p, bs_p, n_pad, emb_dim, emb_pad = _prep(
            cfg, ws, bs, x, block_rows)
        kernel = _make_fwd_kernel(cfg, emb_dim, n_layers, out_cols,
                                  block_rows)
        grid = (n_pad // block_rows,)
        row = skip((block_rows, emb_pad), lambda i: (i, 0),
                   memory_space=pltpu.VMEM)
        in_specs = [row] * 4
        in_specs += [skip(w.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for w in ws_p]
        in_specs += [skip(b.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for b in bs_p]
        out, grad = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=(
                skip((block_rows, out_cols), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
                skip((block_rows, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
            ),
            interpret=interpret,
        )(feats_p, *t_p, *ws_p, *bs_p)
        return out[:n, :out_dim], grad[:n, :3]

    def _backward(ws, bs, x, c_out, c_g):
        n = x.shape[0]
        feats_p, t_p, ws_p, bs_p, n_pad, emb_dim, emb_pad = _prep(
            cfg, ws, bs, x, block_rows)
        c_out_p = jnp.pad(c_out.astype(jnp.float32),
                          ((0, n_pad - n), (0, out_cols - out_dim)))
        c_g_p = jnp.pad(c_g.astype(jnp.float32),
                        ((0, n_pad - n), (0, 8 - 3)))
        kernel = _make_bwd_kernel(cfg, emb_dim, n_layers, dims, out_cols,
                                  block_rows)
        grid = (n_pad // block_rows,)
        row = skip((block_rows, emb_pad), lambda i: (i, 0),
                   memory_space=pltpu.VMEM)
        in_specs = [row, row, row, row,
                    skip((block_rows, out_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
                    skip((block_rows, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)]
        in_specs += [skip(w.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for w in ws_p]
        in_specs += [skip(b.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for b in bs_p]
        out_specs = tuple(
            skip(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in ws_p) + tuple(
            skip(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for b in bs_p)
        out_shape = tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_p
        ) + tuple(jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs_p)
        outs = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(feats_p, *t_p, c_out_p, c_g_p, *ws_p, *bs_p)
        dws_p = outs[:n_layers]
        dbs_p = outs[n_layers:]
        dws = tuple(
            dw[:w.shape[0], :w.shape[1]].astype(w.dtype)
            for dw, w in zip(dws_p, ws))
        dbs = tuple(db[0, :b.shape[0]].astype(b.dtype)
                    for db, b in zip(dbs_p, bs))
        return dws, dbs

    @jax.custom_vjp
    def op(ws, bs, x):
        return _forward(ws, bs, x)

    def op_fwd(ws, bs, x):
        return _forward(ws, bs, x), (ws, bs, x)

    def op_bwd(res, cts):
        ws, bs, x = res
        c_out, c_g = cts
        dws, dbs = _backward(ws, bs, x, c_out, c_g)
        return dws, dbs, jnp.zeros_like(x)

    op.defvjp(op_fwd, op_bwd)
    return op


def sdf_outputs_fused_grad(params, cfg: ImplicitNetConfig, x,
                           block_rows: int = 256, interpret: bool = False):
    """Drop-in for `mlp.sdf_outputs(..., returns_grad=True)` on the
    training path: differentiable w.r.t. params (incl. through grad_x)."""
    from ...models import mlp as mlp_mod

    n_layers = len(cfg.layer_dims()) - 1
    ws = tuple(mlp_mod.linear_weight(params[f"lin{i}"])
               for i in range(n_layers))
    bs = tuple(params[f"lin{i}"]["b"] for i in range(n_layers))
    op = get_sdf_outputs_op(cfg, block_rows, interpret)
    out, grad = op(ws, bs, x)
    sdf = out[:, :1]
    feat = out[:, 1:]
    if cfg.sdf_bounding_sphere > 0.0:
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        sphere_sdf = cfg.sphere_scale * (cfg.sdf_bounding_sphere - norm)
        take_sphere = sphere_sdf < sdf
        sphere_grad = -cfg.sphere_scale * x / jnp.maximum(norm, 1e-12)
        sdf = jnp.minimum(sdf, sphere_sdf)
        grad = jnp.where(take_sphere, sphere_grad, grad)
    return sdf, feat, grad
