"""Reverse-sweep fused SDF forward (value + features + spatial gradient)
with a hand-written second-order Pallas backward — v2 of the training
hot-path kernel (`fused_grad.py` is the tangent-stream v1).

Why v2: the spatial gradient of a scalar output is ONE reverse sweep
(L matmuls) instead of THREE forward tangent streams (3L). The same
factor carries into the custom-VJP backward. Matmul-stream counts per
layer (all (BR, w) x (w, w)):

                       v1 (tangents)   v2 (reverse sweep)
    forward kernel          4                2
    backward kernel        12                6

Math. Forward: z_l = X_l W_l + b_l, X_{l+1} = act(z_l) (skip layers
concat the embedding, /sqrt(2)); y = z_{L-1}. Spatial gradient via the
transpose sweep r_{L-1} = e_sdf, a_l = r_l W_l^T, r_{l-1} = a_l act'(z_{l-1});
g = d(emb)^T a_0 where d(emb) are the analytic PE tangents (XLA-side).

Backward, given cotangents (c_y, c_g): the reverse sweep is linear in r
with coefficients W^T and s_l = act'(z_l), so its transpose runs UPWARD:
    dg_emb = sum_k c_g[:,k] * t_k
    da_l   = [l=0] dg_emb | [l>0] dr_{l-1} * s_{l-1} (skip: concat dg_emb, /sqrt2)
    dW_l  += da_l^T r_l ;  dr_l = da_l W_l
    dz+_l  = dr_l * a_{l+1,kept} * act''(z_l)      (second-order term)
then the standard downward sweep with the extra dz+ injections:
    dz_{L-1} = c_y ;  dW_l += X_l^T dz_l ;  db_l += sum dz_l
    dz_{l-1} = (dz_l W_l^T)_kept * s_{l-1} + dz+_{l-1}
Verified against jax.grad through mlp.sdf_outputs incl. the
normal-map/eikonal second-order terms (tests/test_pallas_rev.py).

Parity: replaces the reference's double-backward training graph
(`/root/reference/model/network/mlp.py:107-141` under loss.backward()).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.mlp import ImplicitNetConfig
from .fused_grad import _act_all, _embed_with_tangents, _prep
from .fused_mlp import _round_up

_LANES = 128


def _atb(a, b):
    """(BR, i), (BR, o) -> (i, o): contract rows without a Mosaic .T."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _abt(a, w):
    """(BR, o), (i, o) -> (BR, i): contract columns."""
    return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_rev(emb, w_refs, b_refs, n_layers, skip_in, emb_dim):
    """Forward + reverse sweep. Returns (y, g_emb, X_l list, dact list,
    r list, ah list) — the stashes the backward needs."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    h = emb
    X_l, dact_l = [], []
    for layer in range(n_layers):
        if layer in skip_in:
            h = (jnp.concatenate([h, emb[:, :emb_dim]], -1)
                 * inv_sqrt2).astype(jnp.bfloat16)
        X_l.append(h)
        z = jnp.dot(h, w_refs[layer][:],
                    preferred_element_type=jnp.float32) + b_refs[layer][:]
        if layer < n_layers - 1:
            act, dact, _ = _act_all(z)
            h = act.astype(jnp.bfloat16)
            dact_l.append(dact)
        else:
            y = z

    # reverse sweep for the spatial gradient
    br = emb.shape[0]
    d_out = y.shape[-1]
    e_sdf = jnp.concatenate(
        [jnp.ones((br, 1), jnp.bfloat16),
         jnp.zeros((br, d_out - 1), jnp.bfloat16)], -1)
    r = e_sdf
    r_l = [None] * n_layers
    ah_l = [None] * n_layers
    emb_pad = emb.shape[-1]
    g_emb = jnp.zeros((br, emb_pad), jnp.float32)
    for layer in reversed(range(n_layers)):
        r_l[layer] = r
        a = _abt(r, w_refs[layer][:])
        if layer in skip_in:
            keep = a.shape[-1] - emb_dim
            ah = a[:, :keep] * inv_sqrt2
            # the concatenated embedding block contributes directly
            g_emb = g_emb + jnp.pad(
                a[:, keep:] * inv_sqrt2,
                ((0, 0), (0, emb_pad - emb_dim)))
        else:
            ah = a
        ah_l[layer] = ah
        if layer > 0:
            r = (ah * dact_l[layer - 1]).astype(jnp.bfloat16)
        else:
            g_emb = g_emb + ah  # width emb_pad (W0 row-padded with zeros)
    return y, g_emb, X_l, dact_l, r_l, ah_l


def _make_fwd_kernel(cfg, emb_dim, n_layers, out_cols, block_rows):
    skip_in = set(cfg.skip_in)

    def kernel(emb_ref, t0_ref, t1_ref, t2_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        out_ref, g_ref = refs[2 * n_layers], refs[2 * n_layers + 1]
        y, g_emb, _, _, _, _ = _forward_rev(
            emb_ref[:], w_refs, b_refs, n_layers, skip_in, emb_dim)
        width = y.shape[-1]
        if width < out_cols:
            y = jnp.concatenate(
                [y, jnp.zeros((block_rows, out_cols - width), y.dtype)], -1)
        out_ref[:] = y[:, :out_cols]
        gs = [jnp.sum(g_emb * t_ref[:], axis=-1, keepdims=True)
              for t_ref in (t0_ref, t1_ref, t2_ref)]
        g_ref[:] = jnp.concatenate(
            gs + [jnp.zeros((block_rows, 5), jnp.float32)], -1)

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

        emb = emb_ref[:]
        _, _, X_l, dact_l, r_l, ah_l = _forward_rev(
            emb, w_refs, b_refs, n_layers, skip_in, emb_dim)

        c_g = cg_ref[:]
        dg_emb = (c_g[:, 0:1] * t0_ref[:] + c_g[:, 1:2] * t1_ref[:]
                  + c_g[:, 2:3] * t2_ref[:])

        # upward: transpose of the reverse sweep (second-order terms)
        dz_extra = [None] * (n_layers - 1)
        dws = [None] * n_layers
        dr_prev = None
        for layer in range(n_layers):
            if layer == 0:
                da = dg_emb
            else:
                s = dact_l[layer - 1]
                dah = dr_prev * s
                if layer in skip_in:
                    da = (jnp.concatenate([dah, dg_emb[:, :emb_dim]], -1)
                          * inv_sqrt2)
                else:
                    da = dah
                d2 = 100.0 * s * (1.0 - s)  # act'' from act' (0 in linear)
                dz_extra[layer - 1] = (dr_prev * ah_l[layer] * d2
                                       ).astype(jnp.bfloat16)
            dab = da.astype(jnp.bfloat16)
            dws[layer] = _atb(dab, r_l[layer])
            if layer < n_layers - 1:
                dr_prev = jnp.dot(dab, w_refs[layer][:],
                                  preferred_element_type=jnp.float32)

        # downward: standard backprop with the dz_extra injections
        last_w = dims[-1]
        dz = cout_ref[:][:, :last_w]
        for layer in reversed(range(n_layers)):
            dzb = dz.astype(jnp.bfloat16)
            dw = dws[layer] + _atb(X_l[layer], dzb)
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
            dxin = _abt(dzb, w_refs[layer][:])
            if layer in skip_in:
                keep = dims[layer] - emb_dim
                dh = dxin[:, :keep] * inv_sqrt2
            else:
                dh = dxin
            dz = dh * dact_l[layer - 1] + dz_extra[layer - 1]

    return kernel


@functools.lru_cache(maxsize=None)
def get_rev_op(cfg: ImplicitNetConfig, block_rows: int = 256,
               interpret: bool = False):
    """custom_vjp op: (ws, bs, x) -> (out (N, 1+F), grad_x (N, 3)).

    Same contract as fused_grad.get_sdf_outputs_op (raw materialized
    weights in/out; SDF clamp composed by the caller in XLA) with the
    reverse-sweep kernels.
    """
    dims = cfg.layer_dims()
    n_layers = len(dims) - 1
    out_dim = dims[-1]
    out_cols = _round_up(out_dim, _LANES)
    bs_spec = pl.BlockSpec

    layer_flops = sum(2 * block_rows * dims[i] * dims[i + 1]
                      for i in range(n_layers))

    def _forward(ws, bs, x):
        n = x.shape[0]
        feats_p, t_p, ws_p, bs_p, n_pad, emb_dim, emb_pad = _prep(
            cfg, ws, bs, x, block_rows)
        kernel = _make_fwd_kernel(cfg, emb_dim, n_layers, out_cols,
                                  block_rows)
        grid = (n_pad // block_rows,)
        row = bs_spec((block_rows, emb_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
        in_specs = [row] * 4
        in_specs += [bs_spec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in ws_p]
        in_specs += [bs_spec(b.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for b in bs_p]
        out, grad = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=(
                bs_spec((block_rows, out_cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
                bs_spec((block_rows, 8), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * layer_flops * (n_pad // block_rows),
                bytes_accessed=n_pad * (4 * emb_pad + out_cols + 8) * 4,
                transcendentals=n_pad * sum(dims[1:-1])),
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
        row = bs_spec((block_rows, emb_pad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
        in_specs = [row, row, row, row,
                    bs_spec((block_rows, out_cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM),
                    bs_spec((block_rows, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]
        in_specs += [bs_spec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in ws_p]
        in_specs += [bs_spec(b.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for b in bs_p]
        out_specs = tuple(
            bs_spec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in ws_p) + tuple(
            bs_spec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for b in bs_p)
        out_shape = tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_p
        ) + tuple(jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs_p)
        outs = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=6 * layer_flops * (n_pad // block_rows),
                bytes_accessed=n_pad * (4 * emb_pad + out_cols + 8) * 4,
                transcendentals=n_pad * sum(dims[1:-1])),
            interpret=interpret,
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


def sdf_outputs_fused_rev(params, cfg: ImplicitNetConfig, x,
                          block_rows: int = 256, interpret: bool = False):
    """Drop-in for `mlp.sdf_outputs(..., returns_grad=True)` on the
    training path (differentiable w.r.t. params incl. through grad_x)."""
    from ...models import mlp as mlp_mod

    n_layers = len(cfg.layer_dims()) - 1
    ws = tuple(mlp_mod.linear_weight(params[f"lin{i}"])
               for i in range(n_layers))
    bs = tuple(params[f"lin{i}"]["b"] for i in range(n_layers))
    op = get_rev_op(cfg, block_rows, interpret)
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
