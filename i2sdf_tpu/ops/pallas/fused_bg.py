"""Fused NeRF++ background MLP pair (implicit sigma/feature net +
radiance net) — forward and first-order backward, one Pallas launch
each.

The foreground kernels (fused_train/fused_rev) carry spatial-gradient
machinery because the SDF's normals feed losses; the background nets
need none of it — nothing upstream of the inverse-sphere points or the
view directions is trainable, so the op's VJP only produces weight/bias
cotangents. That makes this the simplest kernel in the family: two
plain MLP chains, VMEM-resident weights, bf16 MXU matmuls with f32
accumulation, dW/db accumulated across row-blocks in the output refs.

Parity: the background branch of the reference renderer
(`/root/reference/model/network/__init__.py:37-44,131-152` builds the
bg ImplicitNetwork/RenderingNetwork; this repo's XLA path is
`models/renderer.py::render_rays` `cfg.use_bg` branch). Numerics match
the XLA path within bf16 tolerance (tests/test_pallas_bg.py), including
the loss gradient through both nets' weight-norm parameters.

Layout contracts (mirroring fused_train's):
* the implicit net's LAST layer is column-permuted to [features |
  sigma] so the (BR, feat) slice feeding the radiance net is
  lane-aligned; the returned dW is un-permuted.
* the radiance net's FIRST layer is row-permuted/padded to
  [features | PE(view)] for the same reason (nerf input order is
  [PE(view), features], `models/mlp.py:338-355`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.mlp import ImplicitNetConfig, RenderingNetConfig
from .fused_grad import _act_all
from .fused_mlp import _round_up
from .fused_rev import _abt, _atb

_LANES = 128


def supports_bg_core(icfg: ImplicitNetConfig,
                     rcfg: RenderingNetConfig) -> bool:
    """nerf-mode radiance only (the reference's bg is always nerf-mode:
    no points/normals enter the bg radiance input)."""
    return (rcfg.mode == "nerf"
            and rcfg.output_activation == "sigmoid"
            and icfg.output_activation is None)


def _bg_forward_chain(emb, w_refs, b_refs, n_layers, skip_in, emb_dim):
    """Implicit chain (softplus(100) hiddens, skip concat /sqrt2).
    Returns (y f32, X_l bf16 linear inputs, dact_l f32)."""
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
    return y, X_l, dact_l


def _rad_forward_chain(rad_in, w_refs, b_refs, n_layers):
    """Radiance chain (relu hiddens, raw final z). Returns
    (z_last f32, X_l bf16, relu masks f32)."""
    h = rad_in
    X_l, dact_l = [], []
    for layer in range(n_layers):
        X_l.append(h)
        z = jnp.dot(h, w_refs[layer][:],
                    preferred_element_type=jnp.float32) + b_refs[layer][:]
        if layer < n_layers - 1:
            dact_l.append((z > 0.0).astype(jnp.float32))
            h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        else:
            y = z
    return y, X_l, dact_l


def _make_fwd_kernel(n_i, n_r, skip_in, emb_dim, feat_dim, vpad,
                     block_rows):
    def kernel(emb_ref, view_ref, *refs):
        wsi = refs[:n_i]
        bsi = refs[n_i:2 * n_i]
        wsr = refs[2 * n_i:2 * n_i + n_r]
        bsr = refs[2 * n_i + n_r:2 * n_i + 2 * n_r]
        out_ref = refs[2 * n_i + 2 * n_r]

        y, _, _ = _bg_forward_chain(emb_ref[:], wsi, bsi, n_i, skip_in,
                                    emb_dim)
        feat = y[:, :feat_dim]
        sigma = y[:, feat_dim:feat_dim + 1]
        rad_in = jnp.concatenate(
            [feat.astype(jnp.bfloat16), view_ref[:]], -1)
        z, _, _ = _rad_forward_chain(rad_in, wsr, bsr, n_r)
        rgb = jax.nn.sigmoid(z)
        width = rgb.shape[-1]
        out_ref[:] = jnp.concatenate(
            [rgb, sigma,
             jnp.zeros((block_rows, _LANES - width - 1), jnp.float32)],
            -1)

    return kernel


def _make_bwd_kernel(n_i, n_r, skip_in, emb_dim, feat_dim, vpad,
                     dims_i, block_rows):
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(*refs):
        emb_ref, view_ref, c_ref = refs[:3]
        wsi = refs[3:3 + n_i]
        bsi = refs[3 + n_i:3 + 2 * n_i]
        wsr = refs[3 + 2 * n_i:3 + 2 * n_i + n_r]
        bsr = refs[3 + 2 * n_i + n_r:3 + 2 * n_i + 2 * n_r]
        outs = refs[3 + 2 * n_i + 2 * n_r:]
        dwi = outs[:n_i]
        dbi = outs[n_i:2 * n_i]
        dwr = outs[2 * n_i:2 * n_i + n_r]
        dbr = outs[2 * n_i + n_r:]
        first = pl.program_id(0) == 0

        emb = emb_ref[:]
        y, Xi, Di = _bg_forward_chain(emb, wsi, bsi, n_i, skip_in,
                                      emb_dim)
        feat = y[:, :feat_dim]
        rad_in = jnp.concatenate(
            [feat.astype(jnp.bfloat16), view_ref[:]], -1)
        z, Xr, Dr = _rad_forward_chain(rad_in, wsr, bsr, n_r)
        rgb = jax.nn.sigmoid(z)

        c = c_ref[:]
        width = z.shape[-1]
        c_rgb = c[:, :width]
        c_sigma = c[:, width:width + 1]

        # radiance reverse sweep (sigmoid output, relu hiddens)
        dz = c_rgb * rgb * (1.0 - rgb)
        d_rad_in = None
        for layer in reversed(range(n_r)):
            dzb = dz.astype(jnp.bfloat16)
            dw = _atb(Xr[layer], dzb)
            db = jnp.sum(dz, axis=0, keepdims=True)

            @pl.when(first)
            def _init(dw_ref=dwr[layer], db_ref=dbr[layer], dw=dw, db=db):
                dw_ref[:] = dw
                db_ref[:] = db

            @pl.when(jnp.logical_not(first))
            def _acc(dw_ref=dwr[layer], db_ref=dbr[layer], dw=dw, db=db):
                dw_ref[:] = dw_ref[:] + dw
                db_ref[:] = db_ref[:] + db

            dxin = _abt(dzb, wsr[layer][:])
            if layer > 0:
                dz = dxin * Dr[layer - 1]
            else:
                d_rad_in = dxin

        # implicit cotangent: [d_feat | c_sigma] in the permuted
        # [features | sigma] column layout
        d_feat = d_rad_in[:, :feat_dim]
        dz = jnp.concatenate([d_feat, c_sigma], -1)
        for layer in reversed(range(n_i)):
            dzb = dz.astype(jnp.bfloat16)
            dw = _atb(Xi[layer], dzb)
            db = jnp.sum(dz, axis=0, keepdims=True)

            @pl.when(first)
            def _init(dw_ref=dwi[layer], db_ref=dbi[layer], dw=dw, db=db):
                dw_ref[:] = dw
                db_ref[:] = db

            @pl.when(jnp.logical_not(first))
            def _acc(dw_ref=dwi[layer], db_ref=dbi[layer], dw=dw, db=db):
                dw_ref[:] = dw_ref[:] + dw
                db_ref[:] = db_ref[:] + db

            if layer == 0:
                break
            dxin = _abt(dzb, wsi[layer][:])
            if layer in skip_in:
                keep = dims_i[layer] - emb_dim
                dh = dxin[:, :keep] * inv_sqrt2
            else:
                dh = dxin
            dz = dh * Di[layer - 1]

    return kernel


@functools.lru_cache(maxsize=None)
def get_bg_core_op(icfg: ImplicitNetConfig, rcfg: RenderingNetConfig,
                   block_rows: int = 256, interpret: bool = False):
    """custom_vjp op: (wsi, bsi, wsr, bsr, x4, dirs) ->
    (sigma (N, 1), rgb (N, 3)) with weight/bias cotangents only
    (nothing upstream of x/dirs is trainable in the bg branch)."""
    assert supports_bg_core(icfg, rcfg), (icfg, rcfg)
    dims_i = icfg.layer_dims()
    n_i = len(dims_i) - 1
    feat_dim = icfg.feature_vector_size
    emb_dim = dims_i[0]
    epad = _round_up(emb_dim, _LANES)
    skip_in = frozenset(icfg.skip_in)

    dims_r = rcfg.layer_dims()
    n_r = len(dims_r) - 1
    out_r = dims_r[-1]
    vdim = dims_r[0] - feat_dim  # PE(view) width in the nerf input
    vpad = _round_up(vdim, _LANES)
    rpad = feat_dim + vpad
    bs_spec = pl.BlockSpec

    layer_flops = (sum(2 * block_rows * dims_i[i] * dims_i[i + 1]
                       for i in range(n_i))
                   + sum(2 * block_rows * dims_r[i] * dims_r[i + 1]
                         for i in range(n_r)))

    def _prep(x, dirs):
        n = x.shape[0]
        n_pad = _round_up(max(n, 1), block_rows)
        efn = icfg.embed_fn()
        emb = efn(x) if efn is not None else x
        assert emb.shape[-1] == emb_dim, (emb.shape, emb_dim)
        vfn = rcfg.view_embed_fn()
        pe_v = vfn(dirs) if vfn is not None else dirs
        emb_p = jnp.pad(emb, ((0, n_pad - n), (0, epad - emb_dim))
                        ).astype(jnp.bfloat16)
        view_p = jnp.pad(pe_v, ((0, n_pad - n), (0, vpad - vdim))
                         ).astype(jnp.bfloat16)
        return emb_p, view_p, n_pad

    def _perm_weights(wsi, bsi, wsr, bsr):
        """Apply the layout contracts (docstring) + padding, in XLA."""
        wsi_p = [jnp.pad(wsi[0], ((0, epad - wsi[0].shape[0]), (0, 0)))]
        wsi_p += list(wsi[1:])
        # last implicit layer: [sigma | features] -> [features | sigma]
        wsi_p[-1] = jnp.concatenate([wsi_p[-1][:, 1:], wsi_p[-1][:, :1]],
                                    -1)
        bsi_p = [b.reshape(1, -1) for b in bsi]
        bsi_p[-1] = jnp.concatenate([bsi_p[-1][:, 1:], bsi_p[-1][:, :1]],
                                    -1)
        # first radiance layer: rows [PE(view); features] ->
        # [features; PE(view) zero-padded to vpad]
        w0 = wsr[0]
        w0_p = jnp.concatenate(
            [w0[vdim:], jnp.pad(w0[:vdim],
                                ((0, vpad - vdim), (0, 0)))], 0)
        wsr_p = [w0_p] + list(wsr[1:])
        bsr_p = [b.reshape(1, -1) for b in bsr]
        wsi_p = [w.astype(jnp.bfloat16) for w in wsi_p]
        wsr_p = [w.astype(jnp.bfloat16) for w in wsr_p]
        bsi_p = [b.astype(jnp.float32) for b in bsi_p]
        bsr_p = [b.astype(jnp.float32) for b in bsr_p]
        return wsi_p, bsi_p, wsr_p, bsr_p

    def _weight_specs(ws):
        return [bs_spec(w.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for w in ws]

    def _forward(wsi, bsi, wsr, bsr, x, dirs):
        n = x.shape[0]
        emb_p, view_p, n_pad = _prep(x, dirs)
        wsi_p, bsi_p, wsr_p, bsr_p = _perm_weights(wsi, bsi, wsr, bsr)
        kernel = _make_fwd_kernel(n_i, n_r, skip_in, emb_dim, feat_dim,
                                  vpad, block_rows)
        in_specs = [bs_spec((block_rows, epad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM),
                    bs_spec((block_rows, vpad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]
        in_specs += (_weight_specs(wsi_p) + _weight_specs(bsi_p)
                     + _weight_specs(wsr_p) + _weight_specs(bsr_p))
        out = pl.pallas_call(
            kernel, grid=(n_pad // block_rows,),
            in_specs=in_specs,
            out_specs=bs_spec((block_rows, _LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * layer_flops * (n_pad // block_rows),
                bytes_accessed=n_pad * (epad + vpad + _LANES) * 4,
                transcendentals=n_pad * sum(dims_i[1:-1])),
            interpret=interpret,
        )(emb_p, view_p, *wsi_p, *bsi_p, *wsr_p, *bsr_p)
        sigma = out[:n, out_r:out_r + 1]
        rgb = out[:n, :out_r]
        return sigma, rgb

    def _backward(wsi, bsi, wsr, bsr, x, dirs, c_sigma, c_rgb):
        n = x.shape[0]
        emb_p, view_p, n_pad = _prep(x, dirs)
        wsi_p, bsi_p, wsr_p, bsr_p = _perm_weights(wsi, bsi, wsr, bsr)
        c = jnp.zeros((n_pad, _LANES), jnp.float32)
        c = c.at[:n, :out_r].set(c_rgb.astype(jnp.float32))
        c = c.at[:n, out_r:out_r + 1].set(c_sigma.astype(jnp.float32))
        kernel = _make_bwd_kernel(n_i, n_r, skip_in, emb_dim, feat_dim,
                                  vpad, dims_i, block_rows)
        in_specs = [bs_spec((block_rows, epad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM),
                    bs_spec((block_rows, vpad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM),
                    bs_spec((block_rows, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]
        in_specs += (_weight_specs(wsi_p) + _weight_specs(bsi_p)
                     + _weight_specs(wsr_p) + _weight_specs(bsr_p))
        out_specs = tuple(
            bs_spec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for group in (wsi_p, bsi_p, wsr_p, bsr_p) for w in group)
        out_shape = tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32)
            for group in (wsi_p, bsi_p, wsr_p, bsr_p) for w in group)
        outs = pl.pallas_call(
            kernel, grid=(n_pad // block_rows,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=6 * layer_flops * (n_pad // block_rows),
                bytes_accessed=n_pad * (epad + vpad + _LANES) * 4,
                transcendentals=n_pad * sum(dims_i[1:-1])),
            interpret=interpret,
        )(emb_p, view_p, c, *wsi_p, *bsi_p, *wsr_p, *bsr_p)
        dwi_p = list(outs[:n_i])
        dbi_p = list(outs[n_i:2 * n_i])
        dwr_p = list(outs[2 * n_i:2 * n_i + n_r])
        dbr_p = list(outs[2 * n_i + n_r:])
        # un-permute: [features | sigma] -> [sigma | features]
        dwi_p[-1] = jnp.concatenate(
            [dwi_p[-1][:, -1:], dwi_p[-1][:, :-1]], -1)
        dbi_p[-1] = jnp.concatenate(
            [dbi_p[-1][:, -1:], dbi_p[-1][:, :-1]], -1)
        # un-permute rad W0 rows: [features; PE(view)+pad] ->
        # [PE(view); features]
        dwr_p[0] = jnp.concatenate(
            [dwr_p[0][feat_dim:feat_dim + vdim], dwr_p[0][:feat_dim]], 0)
        dwi = tuple(dw[:w.shape[0], :w.shape[1]].astype(w.dtype)
                    for dw, w in zip(dwi_p, wsi))
        dbi = tuple(db[0, :b.shape[0]].astype(b.dtype)
                    for db, b in zip(dbi_p, bsi))
        dwr = tuple(dw[:w.shape[0], :w.shape[1]].astype(w.dtype)
                    for dw, w in zip(dwr_p, wsr))
        dbr = tuple(db[0, :b.shape[0]].astype(b.dtype)
                    for db, b in zip(dbr_p, bsr))
        return dwi, dbi, dwr, dbr

    @jax.custom_vjp
    def op(wsi, bsi, wsr, bsr, x, dirs):
        return _forward(wsi, bsi, wsr, bsr, x, dirs)

    def op_fwd(wsi, bsi, wsr, bsr, x, dirs):
        return _forward(wsi, bsi, wsr, bsr, x, dirs), (wsi, bsi, wsr,
                                                       bsr, x, dirs)

    def op_bwd(res, cts):
        wsi, bsi, wsr, bsr, x, dirs = res
        c_sigma, c_rgb = cts
        dwi, dbi, dwr, dbr = _backward(wsi, bsi, wsr, bsr, x, dirs,
                                       c_sigma, c_rgb)
        return (dwi, dbi, dwr, dbr, jnp.zeros_like(x),
                jnp.zeros_like(dirs))

    op.defvjp(op_fwd, op_bwd)
    return op


def bg_core_fused(params_i, icfg: ImplicitNetConfig, params_r,
                  rcfg: RenderingNetConfig, x, dirs,
                  block_rows: int = 256, interpret: bool = False):
    """Drop-in for the renderer's XLA bg pair: (sigma (N,1), rgb (N,3)).
    Differentiable w.r.t. both nets' (weight-norm) parameters."""
    from ...models import mlp as mlp_mod

    n_i = len(icfg.layer_dims()) - 1
    n_r = len(rcfg.layer_dims()) - 1
    wsi = tuple(mlp_mod.linear_weight(params_i[f"lin{i}"])
                for i in range(n_i))
    bsi = tuple(params_i[f"lin{i}"]["b"] for i in range(n_i))
    wsr = tuple(mlp_mod.linear_weight(params_r[f"lin{i}"])
                for i in range(n_r))
    bsr = tuple(params_r[f"lin{i}"]["b"] for i in range(n_r))
    op = get_bg_core_op(icfg, rcfg, block_rows, interpret)
    return op(wsi, bsi, wsr, bsr, x, dirs)
