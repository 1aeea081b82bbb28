"""Whole-render fused train kernel: SDF MLP + radiance MLP, forward and
backward, ONE Pallas launch each (v3 of the training hot path; v2 =
`fused_rev.py` covers the SDF net only).

Why v3: with the SDF-only fused op (`fused_rev.py`), the radiance MLP
and its transpose still run as an XLA chain at ~42 TFLOP/s, and the
(N, 256) feature tensor + its cotangent round-trip HBM between the two
(2 x 159 MB/step at the flagship config). Folding the radiance net into
the same kernels keeps features VMEM-resident and collapses ~13 ms of
XLA-side work into ~2 ms of extra in-kernel matmuls (the kernels run at
115-124 TFLOP/s bf16 on v5e).

Design (flagship `nerf` mode, no light net — the renderer falls back to
the v2 path otherwise):

* ONE packed input stream (N, P): `[pe(x) | pe(dirs) | 0...]` — the
  positional encodings in the framework's wide-block layout
  (models/embedder.py). No separate tangent streams: the PE tangents
  are derived IN-KERNEL from the block layout via
  `tilde = packed @ P' + e_xyz` (P' swaps sin<->cos blocks and scales
  by the frequency; d sin(f x)/dx = f cos(f x)) and
  `g_xyz = (g_emb * tilde) @ Sel` (Sel sums each dim's columns) —
  two small MXU ops replacing three (N, 128) HBM streams per kernel.
* ONE packed output stream (N, 128): `[grad(3) | sdf(1) | rgb(3) | 0]`,
  and the same layout for the backward's cotangent stream.
* The SDF output layer is fed COLUMN-PERMUTED as `[features | sdf]` so
  the radiance input concat `[features | pe(dirs)]` and the feature
  cotangent slice stay lane-ALIGNED (no 1-lane shifts). The wrapper
  permutes the weight (and un-permutes its gradient) in XLA — a (256,
  257) shuffle, free next to the kernel.
* Radiance first-layer weight is fed ROW-PERMUTED/padded to match that
  concat order (reference order is [pe(view), feature],
  `/root/reference/model/network/mlp.py:208-217`).
* Backward kernel = recompute forward + radiance backprop (ReLU masks,
  sigmoid output) -> feature cotangents join the SDF output cotangent,
  then the v2 upward/downward sweeps (second-order eikonal/normal terms
  included). Gradient parity vs jax.grad: tests/test_pallas_train.py.

Parity: replaces the reference's whole differentiated render forward
under loss.backward() (`/root/reference/model/network/mlp.py:107-141`,
`mlp.py:184-229`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.embedder import pe_frequencies
from ...models.mlp import ImplicitNetConfig, RenderingNetConfig
from .fused_grad import _act_all
from .fused_mlp import _round_up

_LANES = 128


def _atb(a, b):
    """(BR, i), (BR, o) -> (i, o) without a Mosaic transpose."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _abt(a, w):
    """(BR, o), (i, o) -> (BR, i): contract columns."""
    return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pe_tangent_mats(multires: int, emb_dim: int, ppad: int):
    """(P', Sel) for the in-kernel tangent derivation.

    Block PE layout: cols [0:3] = x, [3:3+3F] = sin (dim-major),
    [3+3F:3+6F] = cos. tilde = emb @ P' + e_xyz gives
    d emb_j / dx_{dim(j)}; Sel[j, k] = 1 iff col j belongs to dim k, so
    g_xyz = (g_emb * tilde) @ Sel and (transpose) dg_emb =
    (c_g @ Sel^T) * tilde."""
    F = multires
    freqs = pe_frequencies(multires)
    Pp = np.zeros((ppad, ppad), np.float32)
    Sel = np.zeros((ppad, ppad), np.float32)
    for k in range(3):
        Sel[k, k] = 1.0
    for i in range(3):
        for j in range(F):
            sin_c = 3 + i * F + j
            cos_c = 3 + 3 * F + i * F + j
            Pp[cos_c, sin_c] = freqs[j]      # d sin = f * cos
            Pp[sin_c, cos_c] = -freqs[j]     # d cos = -f * sin
            Sel[sin_c, i] = 1.0
            Sel[cos_c, i] = 1.0
    assert 3 + 6 * F == emb_dim
    return Pp, Sel


def _sdf_forward_rev(emb, w_refs, b_refs, n_layers, skip_in, emb_dim,
                     feat_dim):
    """SDF forward + reverse sweep with the [feat | sdf] output layout.

    Returns (y, g_emb, X_l, dact_l, r_l, ah_l)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    br = emb.shape[0]
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

    d_out = y.shape[-1]
    # e_sdf selects the sdf column (= feat_dim in the permuted layout)
    parts = [jnp.zeros((br, feat_dim), jnp.bfloat16),
             jnp.ones((br, 1), jnp.bfloat16)]
    if d_out - feat_dim - 1 > 0:
        parts.append(jnp.zeros((br, d_out - feat_dim - 1), jnp.bfloat16))
    e_sdf = jnp.concatenate(parts, -1)
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
            g_emb = g_emb + jnp.pad(
                a[:, keep:] * inv_sqrt2,
                ((0, 0), (0, emb_pad - emb_dim)))
        else:
            ah = a
        ah_l[layer] = ah
        if layer > 0:
            r = (ah * dact_l[layer - 1]).astype(jnp.bfloat16)
        else:
            g_emb = g_emb + ah
    return y, g_emb, X_l, dact_l, r_l, ah_l


def _rad_forward(rad_in, w_refs, b_refs, n_rad):
    """ReLU-hidden / sigmoid-output radiance forward.

    Returns (rgb_sig, X_l, mask_l)."""
    h = rad_in
    X_l, mask_l = [], []
    for layer in range(n_rad):
        X_l.append(h)
        z = jnp.dot(h, w_refs[layer][:],
                    preferred_element_type=jnp.float32) + b_refs[layer][:]
        if layer < n_rad - 1:
            mask_l.append((z > 0).astype(jnp.bfloat16))
            h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        else:
            h = jax.nn.sigmoid(z)
    return h, X_l, mask_l


def _light_forward(lin_in, w_refs, b_refs, n_l):
    """Light head: softplus(100)-hidden / sigmoid-output MLP over
    relu(features) (models/mlp.py implicit_net_apply semantics for the
    light ImplicitNetConfig: no skips, no embedding).

    Returns (lm_sig, X_l, dact_l)."""
    ip = w_refs[0].shape[0]
    if lin_in.shape[-1] < ip:  # zero-pad to the padded first-layer rows
        lin_in = jnp.concatenate(
            [lin_in, jnp.zeros((lin_in.shape[0], ip - lin_in.shape[-1]),
                               lin_in.dtype)], -1)
    h = lin_in
    X_l, dact_l = [], []
    for layer in range(n_l):
        X_l.append(h)
        z = jnp.dot(h, w_refs[layer][:],
                    preferred_element_type=jnp.float32) + b_refs[layer][:]
        if layer < n_l - 1:
            act, dact, _ = _act_all(z)
            h = act.astype(jnp.bfloat16)
            dact_l.append(dact)
        else:
            h = jax.nn.sigmoid(z)
    return h, X_l, dact_l


def _rad_input(E, feat, gsel, emb_dim, vdim, feat_dim, rpad, idr):
    """Assemble the radiance input block. Kernel-internal layout keeps
    features lane-aligned at offset 0 in BOTH modes (the wrapper
    row-permutes the first radiance weight to match):

    * nerf: [feat | pe(view)]
    * idr:  [feat | pe(view) | pts | grad] — pts are the raw xyz
      (E[:, :3], include_input PE) and grad the in-kernel spatial
      gradient; reference order is [pts, pe(view), normals, feat]
      (`/root/reference/model/network/mlp.py:208-217`).
    """
    br = E.shape[0]
    parts = [feat.astype(jnp.bfloat16), E[:, emb_dim:emb_dim + vdim]]
    used = feat_dim + vdim
    if idr:
        parts += [E[:, :3], gsel[:, :3].astype(jnp.bfloat16)]
        used += 6
    if rpad - used > 0:
        parts.append(jnp.zeros((br, rpad - used), jnp.bfloat16))
    return jnp.concatenate(parts, -1)


def _make_fwd_kernel(n_sdf, n_rad, skip_in, emb_dim, vdim, feat_dim,
                     rpad, block_rows, n_l=0, idr=False):
    def kernel(packed_ref, pp_ref, sel_ref, *refs):
        k = 0
        w_sdf = refs[k:k + n_sdf]; k += n_sdf
        b_sdf = refs[k:k + n_sdf]; k += n_sdf
        w_rad = refs[k:k + n_rad]; k += n_rad
        b_rad = refs[k:k + n_rad]; k += n_rad
        w_l = refs[k:k + n_l]; k += n_l
        b_l = refs[k:k + n_l]; k += n_l
        out_ref = refs[k]

        E = packed_ref[:]
        y, g_emb, _, _, _, _ = _sdf_forward_rev(
            E, w_sdf, b_sdf, n_sdf, skip_in, emb_dim, feat_dim)

        # in-kernel PE tangents: tilde = E @ P' + e_xyz
        br, ppad = E.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, ppad), 1)
        tilde = jnp.dot(E, pp_ref[:], preferred_element_type=jnp.float32)
        tilde = tilde + (lane < 3).astype(jnp.float32)
        gsel = jnp.dot((g_emb * tilde).astype(jnp.bfloat16),
                       sel_ref[:], preferred_element_type=jnp.float32)

        feat = y[:, :feat_dim]
        sdfv = y[:, feat_dim:feat_dim + 1]
        rad_in = _rad_input(E, feat, gsel, emb_dim, vdim, feat_dim, rpad,
                            idr)
        rgb, _, _ = _rad_forward(rad_in, w_rad, b_rad, n_rad)

        if n_l:
            # light head over relu(features) — the feature tensor is
            # already VMEM-resident (the whole point of v3)
            lin_in = jnp.maximum(feat, 0.0).astype(jnp.bfloat16)
            lm, _, _ = _light_forward(lin_in, w_l, b_l, n_l)
            lmask = lm[:, :1]
        else:
            lmask = jnp.zeros((br, 1), jnp.float32)

        out_ref[:] = jnp.concatenate(
            [gsel[:, :3], sdfv, rgb[:, :3], lmask,
             jnp.zeros((br, _LANES - 8), jnp.float32)], -1)

    return kernel


def _make_bwd_kernel(n_sdf, n_rad, skip_in, emb_dim, vdim, feat_dim,
                     rpad, dims_sdf, block_rows, n_l=0,
                     detach_light=True, idr=False):
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(*refs):
        packed_ref, pp_ref, sel_ref, cot_ref = refs[:4]
        k = 4
        w_sdf = refs[k:k + n_sdf]; k += n_sdf
        b_sdf = refs[k:k + n_sdf]; k += n_sdf
        w_rad = refs[k:k + n_rad]; k += n_rad
        b_rad = refs[k:k + n_rad]; k += n_rad
        w_l = refs[k:k + n_l]; k += n_l
        b_l = refs[k:k + n_l]; k += n_l
        dw_sdf = refs[k:k + n_sdf]; k += n_sdf
        db_sdf = refs[k:k + n_sdf]; k += n_sdf
        dw_rad = refs[k:k + n_rad]; k += n_rad
        db_rad = refs[k:k + n_rad]; k += n_rad
        dw_l = refs[k:k + n_l]; k += n_l
        db_l = refs[k:k + n_l]; k += n_l
        first = pl.program_id(0) == 0

        E = packed_ref[:]
        br, ppad = E.shape
        y, g_emb, X_l, dact_l, r_l, ah_l = _sdf_forward_rev(
            E, w_sdf, b_sdf, n_sdf, skip_in, emb_dim, feat_dim)

        lane = jax.lax.broadcasted_iota(jnp.int32, (br, ppad), 1)
        tilde = jnp.dot(E, pp_ref[:], preferred_element_type=jnp.float32)
        tilde = tilde + (lane < 3).astype(jnp.float32)
        gsel = jnp.dot((g_emb * tilde).astype(jnp.bfloat16),
                       sel_ref[:], preferred_element_type=jnp.float32)

        feat = y[:, :feat_dim]
        rad_in = _rad_input(E, feat, gsel, emb_dim, vdim, feat_dim, rpad,
                            idr)
        rgb, rX_l, rmask_l = _rad_forward(rad_in, w_rad, b_rad, n_rad)

        cot = cot_ref[:]
        c_sdf = cot[:, 3:4]
        c_rgb = cot[:, 4:7]

        # ---- radiance backward (sigmoid output, ReLU hidden) ----------
        dz = c_rgb * rgb[:, :3] * (1.0 - rgb[:, :3])
        dws_r = [None] * n_rad
        dbs_r = [None] * n_rad
        for layer in reversed(range(n_rad)):
            dzb = dz.astype(jnp.bfloat16)
            dws_r[layer] = _atb(rX_l[layer], dzb)
            dbs_r[layer] = jnp.sum(dz, axis=0, keepdims=True)
            dh = _abt(dzb, w_rad[layer][:])
            if layer > 0:
                dz = dh * rmask_l[layer - 1]
            else:
                c_radin = dh
        c_feat = c_radin[:, :feat_dim]

        # ---- light-head backward (sigmoid out, softplus-100 hidden) ----
        if n_l:
            lin_in = jnp.maximum(feat, 0.0).astype(jnp.bfloat16)
            lm, lX_l, ldact_l = _light_forward(lin_in, w_l, b_l, n_l)
            c_lm = cot[:, 7:8]
            # padded output cols carry zero cotangent
            out_pad = lm.shape[-1]
            dz_l = jnp.concatenate(
                [c_lm * lm[:, :1] * (1.0 - lm[:, :1]),
                 jnp.zeros((br, out_pad - 1), jnp.float32)], -1)
            dws_l = [None] * n_l
            dbs_l = [None] * n_l
            for layer in reversed(range(n_l)):
                dzb = dz_l.astype(jnp.bfloat16)
                dws_l[layer] = _atb(lX_l[layer], dzb)
                dbs_l[layer] = jnp.sum(dz_l, axis=0, keepdims=True)
                dh = _abt(dzb, w_l[layer][:])
                if layer > 0:
                    dz_l = dh * ldact_l[layer - 1]
                else:
                    c_lin = dh
            if not detach_light:
                # relu'(feat) gates the feature cotangent (the
                # reference's detach_light_feature=False path)
                c_feat = c_feat + c_lin[:, :feat_dim] * (feat > 0.0)

        # ---- SDF output cotangent in the [feat | sdf] layout ----------
        d_out = dims_sdf[-1]
        cy_parts = [c_feat, c_sdf]
        if d_out - feat_dim - 1 > 0:
            cy_parts.append(jnp.zeros((br, d_out - feat_dim - 1),
                                      jnp.float32))
        c_y = jnp.concatenate(cy_parts, -1)

        # ---- spatial-gradient cotangent into the embedding -------------
        # g_xyz = (g_emb * tilde) @ Sel  =>  dg_emb = (c_g @ Sel^T) * tilde
        # (only cot's first 3 columns reach Sel). In idr mode the
        # radiance input itself consumes the spatial gradient, so its
        # backward contributes an ADDITIONAL gradient cotangent that
        # joins the external one before the second-order sweeps.
        cot_g = cot
        if idr:
            off = feat_dim + vdim + 3
            c_g_int = c_radin[:, off:off + 3]
            cot_g = cot + jnp.concatenate(
                [c_g_int, jnp.zeros((br, _LANES - 3), jnp.float32)], -1)
        dg_emb = _abt(cot_g.astype(jnp.bfloat16), sel_ref[:]) * tilde

        # ---- upward sweep: transpose of the reverse sweep (2nd order) --
        dz_extra = [None] * (n_sdf - 1)
        dws = [None] * n_sdf
        dr_prev = None
        for layer in range(n_sdf):
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
                d2 = 100.0 * s * (1.0 - s)
                dz_extra[layer - 1] = (dr_prev * ah_l[layer] * d2
                                       ).astype(jnp.bfloat16)
            dab = da.astype(jnp.bfloat16)
            dws[layer] = _atb(dab, r_l[layer])
            if layer < n_sdf - 1:
                dr_prev = jnp.dot(dab, w_sdf[layer][:],
                                  preferred_element_type=jnp.float32)

        # ---- downward sweep with the dz_extra injections ---------------
        dz = c_y
        for layer in reversed(range(n_sdf)):
            dzb = dz.astype(jnp.bfloat16)
            dw = dws[layer] + _atb(X_l[layer], dzb)
            db = jnp.sum(dz, axis=0, keepdims=True)

            @pl.when(first)
            def _init(layer=layer, dw=dw, db=db):
                dw_sdf[layer][:] = dw
                db_sdf[layer][:] = db

            @pl.when(jnp.logical_not(first))
            def _acc(layer=layer, dw=dw, db=db):
                dw_sdf[layer][:] = dw_sdf[layer][:] + dw
                db_sdf[layer][:] = db_sdf[layer][:] + db

            if layer == 0:
                break
            dxin = _abt(dzb, w_sdf[layer][:])
            if layer in skip_in:
                keep = dims_sdf[layer] - emb_dim
                dh = dxin[:, :keep] * inv_sqrt2
            else:
                dh = dxin
            dz = dh * dact_l[layer - 1] + dz_extra[layer - 1]

        for layer in range(n_rad):
            @pl.when(first)
            def _initr(layer=layer):
                dw_rad[layer][:] = dws_r[layer]
                db_rad[layer][:] = dbs_r[layer]

            @pl.when(jnp.logical_not(first))
            def _accr(layer=layer):
                dw_rad[layer][:] = dw_rad[layer][:] + dws_r[layer]
                db_rad[layer][:] = db_rad[layer][:] + dbs_r[layer]

        for layer in range(n_l):
            @pl.when(first)
            def _initl(layer=layer):
                dw_l[layer][:] = dws_l[layer]
                db_l[layer][:] = dbs_l[layer]

            @pl.when(jnp.logical_not(first))
            def _accl(layer=layer):
                dw_l[layer][:] = dw_l[layer][:] + dws_l[layer]
                db_l[layer][:] = db_l[layer][:] + dbs_l[layer]

    return kernel


@functools.lru_cache(maxsize=None)
def get_render_core_op(icfg: ImplicitNetConfig, rcfg: RenderingNetConfig,
                       block_rows: int = 256, interpret: bool = False,
                       lcfg: ImplicitNetConfig | None = None,
                       detach_light: bool = True):
    """custom_vjp op (raw materialized weights in/out):

        (ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs)
            -> (grad_x (N,3), sdf (N,1), rgb (N,3))
    or, with a light head (lcfg — the light-mask config's in-kernel MLP
    over relu(features), parity `model/network/__init__.py:161-170`):
        (ws_sdf, bs_sdf, ws_rad, bs_rad, ws_l, bs_l, x, dirs)
            -> (grad_x (N,3), sdf (N,1), rgb (N,3), lmask (N,1))

    ws_sdf's LAST layer must be column-permuted to [features | sdf] and
    ws_rad's FIRST layer row-permuted/padded to [features | pe(dirs)]
    (see `render_core_fused`, which does both). The SDF sphere clamp is
    composed by the caller in XLA."""
    dims_sdf = icfg.layer_dims()
    n_sdf = len(dims_sdf) - 1
    feat_dim = icfg.feature_vector_size
    emb_dim = dims_sdf[0]
    skip_in = frozenset(icfg.skip_in)

    dims_rad = rcfg.layer_dims()
    n_rad = len(dims_rad) - 1
    idr = rcfg.mode == "idr"
    # view-PE width (idr additionally carries raw pts(3) + grad(3))
    vdim = dims_rad[0] - feat_dim - (6 if idr else 0)
    rpad = _round_up(dims_rad[0], _LANES)
    ppad = _round_up(emb_dim + vdim, _LANES)

    n_l = 0
    lout_pad = 0
    if lcfg is not None:
        dims_l = lcfg.layer_dims()
        n_l = len(dims_l) - 1
        assert dims_l[0] == feat_dim, (dims_l, feat_dim)
        lout_pad = _round_up(dims_l[-1], _LANES)

    Pp_np, Sel_np = _pe_tangent_mats(icfg.multires, emb_dim, ppad)
    bs_spec = pl.BlockSpec

    def _prep_packed(x, dirs):
        n = x.shape[0]
        n_pad = _round_up(max(n, 1), block_rows)
        emb = icfg.embed_fn()(x)
        pe_d = rcfg.view_embed_fn()(dirs)
        packed = jnp.concatenate([emb, pe_d], axis=-1)
        packed = jnp.pad(packed, ((0, n_pad - n),
                                  (0, ppad - packed.shape[-1])))
        return packed.astype(jnp.bfloat16), n_pad

    def _pad_weights(ws_sdf, ws_rad):
        ws_sdf_p = [jnp.pad(ws_sdf[0], ((0, ppad - ws_sdf[0].shape[0]),
                                        (0, 0))).astype(jnp.bfloat16)]
        ws_sdf_p += [w.astype(jnp.bfloat16) for w in ws_sdf[1:]]
        ws_rad_p = [jnp.pad(ws_rad[0], ((0, rpad - ws_rad[0].shape[0]),
                                        (0, 0))).astype(jnp.bfloat16)]
        ws_rad_p += [w.astype(jnp.bfloat16) for w in ws_rad[1:]]
        return ws_sdf_p, ws_rad_p

    def _pad_light(ws_l, bs_l):
        """Pad every light layer to lane-multiple in/out (zero rows keep
        padded activations from leaking; padded dw rows/cols are sliced
        away on output)."""
        ws_p, bs_p = [], []
        for w, b in zip(ws_l, bs_l):
            ip = _round_up(w.shape[0], _LANES)
            op_ = _round_up(w.shape[1], _LANES)
            ws_p.append(jnp.pad(w, ((0, ip - w.shape[0]),
                                    (0, op_ - w.shape[1])))
                        .astype(jnp.bfloat16))
            bs_p.append(jnp.pad(b, (0, op_ - b.shape[0]))
                        .reshape(1, -1).astype(jnp.float32))
        return ws_p, bs_p

    def _const_specs():
        return [bs_spec((ppad, ppad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * 2

    def _weight_specs(ws):
        return [bs_spec(w.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for w in ws]

    layer_flops = (sum(2 * block_rows * dims_sdf[i] * dims_sdf[i + 1]
                       for i in range(n_sdf))
                   + sum(2 * block_rows * dims_rad[i] * dims_rad[i + 1]
                         for i in range(n_rad)))

    def _forward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs,
                 ws_l=(), bs_l=()):
        n = x.shape[0]
        packed, n_pad = _prep_packed(x, dirs)
        ws_sdf_p, ws_rad_p = _pad_weights(ws_sdf, ws_rad)
        bs_sdf_p = [b.reshape(1, -1).astype(jnp.float32) for b in bs_sdf]
        bs_rad_p = [b.reshape(1, -1).astype(jnp.float32) for b in bs_rad]
        ws_l_p, bs_l_p = _pad_light(ws_l, bs_l)
        kernel = _make_fwd_kernel(n_sdf, n_rad, skip_in, emb_dim, vdim,
                                  feat_dim, rpad, block_rows, n_l=n_l,
                                  idr=idr)
        row = bs_spec((block_rows, ppad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
        in_specs = ([row] + _const_specs()
                    + _weight_specs(ws_sdf_p) + _weight_specs(bs_sdf_p)
                    + _weight_specs(ws_rad_p) + _weight_specs(bs_rad_p)
                    + _weight_specs(ws_l_p) + _weight_specs(bs_l_p))
        out = pl.pallas_call(
            kernel, grid=(n_pad // block_rows,),
            in_specs=in_specs,
            out_specs=bs_spec((block_rows, _LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=3 * layer_flops * (n_pad // block_rows),
                bytes_accessed=n_pad * (2 * ppad + 4 * _LANES),
                transcendentals=n_pad * sum(dims_sdf[1:-1])),
            interpret=interpret,
        )(packed, jnp.asarray(Pp_np), jnp.asarray(Sel_np),
          *ws_sdf_p, *bs_sdf_p, *ws_rad_p, *bs_rad_p, *ws_l_p, *bs_l_p)
        return out[:n, :3], out[:n, 3:4], out[:n, 4:7], out[:n, 7:8]

    def _backward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs, c_g, c_sdf,
                  c_rgb, ws_l=(), bs_l=(), c_lm=None):
        n = x.shape[0]
        packed, n_pad = _prep_packed(x, dirs)
        ws_sdf_p, ws_rad_p = _pad_weights(ws_sdf, ws_rad)
        bs_sdf_p = [b.reshape(1, -1).astype(jnp.float32) for b in bs_sdf]
        bs_rad_p = [b.reshape(1, -1).astype(jnp.float32) for b in bs_rad]
        ws_l_p, bs_l_p = _pad_light(ws_l, bs_l)
        cot_parts = [c_g.astype(jnp.float32), c_sdf.astype(jnp.float32),
                     c_rgb.astype(jnp.float32)]
        cot_parts.append(jnp.zeros((n, 1), jnp.float32) if c_lm is None
                         else c_lm.astype(jnp.float32))
        cot = jnp.concatenate(cot_parts, axis=-1)
        cot = jnp.pad(cot, ((0, n_pad - n), (0, _LANES - 8)))
        kernel = _make_bwd_kernel(n_sdf, n_rad, skip_in, emb_dim, vdim,
                                  feat_dim, rpad, dims_sdf, block_rows,
                                  n_l=n_l, detach_light=detach_light,
                                  idr=idr)
        row = bs_spec((block_rows, ppad), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
        cot_spec = bs_spec((block_rows, _LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        in_specs = ([row] + _const_specs() + [cot_spec]
                    + _weight_specs(ws_sdf_p) + _weight_specs(bs_sdf_p)
                    + _weight_specs(ws_rad_p) + _weight_specs(bs_rad_p)
                    + _weight_specs(ws_l_p) + _weight_specs(bs_l_p))
        grads_shapes = (
            [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_sdf_p]
            + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
               for b in bs_sdf_p]
            + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_rad_p]
            + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
               for b in bs_rad_p]
            + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_l_p]
            + [jax.ShapeDtypeStruct(b.shape, jnp.float32)
               for b in bs_l_p])
        out_specs = tuple(
            bs_spec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in grads_shapes)
        outs = pl.pallas_call(
            kernel, grid=(n_pad // block_rows,),
            in_specs=in_specs, out_specs=out_specs,
            out_shape=tuple(grads_shapes),
            cost_estimate=pl.CostEstimate(
                flops=7 * layer_flops * (n_pad // block_rows),
                bytes_accessed=n_pad * (2 * ppad + 4 * _LANES),
                transcendentals=n_pad * sum(dims_sdf[1:-1])),
            interpret=interpret,
        )(packed, jnp.asarray(Pp_np), jnp.asarray(Sel_np), cot,
          *ws_sdf_p, *bs_sdf_p, *ws_rad_p, *bs_rad_p, *ws_l_p, *bs_l_p)
        k = 0
        dws_sdf = outs[k:k + n_sdf]; k += n_sdf
        dbs_sdf = outs[k:k + n_sdf]; k += n_sdf
        dws_rad = outs[k:k + n_rad]; k += n_rad
        dbs_rad = outs[k:k + n_rad]; k += n_rad
        dws_l = outs[k:k + n_l]; k += n_l
        dbs_l = outs[k:k + n_l]
        dws_sdf = tuple(dw[:w.shape[0], :w.shape[1]].astype(w.dtype)
                        for dw, w in zip(dws_sdf, ws_sdf))
        dbs_sdf = tuple(db[0, :b.shape[0]].astype(b.dtype)
                        for db, b in zip(dbs_sdf, bs_sdf))
        dws_rad = tuple(dw[:w.shape[0], :w.shape[1]].astype(w.dtype)
                        for dw, w in zip(dws_rad, ws_rad))
        dbs_rad = tuple(db[0, :b.shape[0]].astype(b.dtype)
                        for db, b in zip(dbs_rad, bs_rad))
        dws_l = tuple(dw[:w.shape[0], :w.shape[1]].astype(w.dtype)
                      for dw, w in zip(dws_l, ws_l))
        dbs_l = tuple(db[0, :b.shape[0]].astype(b.dtype)
                      for db, b in zip(dbs_l, bs_l))
        return dws_sdf, dbs_sdf, dws_rad, dbs_rad, dws_l, dbs_l

    if lcfg is None:
        @jax.custom_vjp
        def op(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs):
            g, s, r, _ = _forward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs)
            return g, s, r

        def op_fwd(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs):
            g, s, r, _ = _forward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs)
            return ((g, s, r),
                    (ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs))

        def op_bwd(res, cts):
            ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs = res
            c_g, c_sdf, c_rgb = cts
            grads = _backward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs,
                              c_g, c_sdf, c_rgb)[:4]
            # x/dirs are stop-gradient upstream (sampler z-vals + cameras)
            return (*grads, jnp.zeros_like(x), jnp.zeros_like(dirs))

        op.defvjp(op_fwd, op_bwd)
        return op

    @jax.custom_vjp
    def op_l(ws_sdf, bs_sdf, ws_rad, bs_rad, ws_l, bs_l, x, dirs):
        return _forward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs,
                        ws_l, bs_l)

    def op_l_fwd(ws_sdf, bs_sdf, ws_rad, bs_rad, ws_l, bs_l, x, dirs):
        return (op_l(ws_sdf, bs_sdf, ws_rad, bs_rad, ws_l, bs_l, x, dirs),
                (ws_sdf, bs_sdf, ws_rad, bs_rad, ws_l, bs_l, x, dirs))

    def op_l_bwd(res, cts):
        ws_sdf, bs_sdf, ws_rad, bs_rad, ws_l, bs_l, x, dirs = res
        c_g, c_sdf, c_rgb, c_lm = cts
        grads = _backward(ws_sdf, bs_sdf, ws_rad, bs_rad, x, dirs,
                          c_g, c_sdf, c_rgb, ws_l, bs_l, c_lm)
        return (*grads, jnp.zeros_like(x), jnp.zeros_like(dirs))

    op_l.defvjp(op_l_fwd, op_l_bwd)
    return op_l


def supports_render_core(icfg: ImplicitNetConfig,
                         rcfg: RenderingNetConfig,
                         lcfg: ImplicitNetConfig | None = None) -> bool:
    """True iff the flagship-style fused whole-render kernel applies
    (optionally with the light-mask head folded in-kernel)."""
    base = (rcfg.mode in ("nerf", "idr")
            and icfg.embed_type == "positional"
            and rcfg.embed_type == "positional"
            and icfg.d_in == 3 and rcfg.d_out == 3
            and rcfg.output_activation == "sigmoid"
            # idr consumes raw pts from the packed PE stream
            and (rcfg.mode == "nerf"
                 or not rcfg.embed_point_multires))
    if not base:
        return False
    if lcfg is None:
        return True
    return (lcfg.embed_type is None
            and not lcfg.skip_in
            and lcfg.d_in == icfg.feature_vector_size
            and lcfg.d_out == 1 and lcfg.feature_vector_size == 0
            and lcfg.output_activation == "sigmoid")


def render_core_fused(params_implicit, icfg: ImplicitNetConfig,
                      params_rendering, rcfg: RenderingNetConfig,
                      x, dirs, block_rows: int = 256,
                      interpret: bool = False,
                      params_light=None,
                      lcfg: ImplicitNetConfig | None = None,
                      detach_light: bool = True):
    """Drop-in for `mlp.sdf_outputs` + `mlp.rendering_net_apply` on the
    nerf-mode training path. Returns (sdf, grad, rgb) — or (sdf, grad,
    rgb, lmask) when a light head is given (the light-mask config,
    `/root/reference/config/synthetic_light_mask.yml`); the (N, feat)
    feature tensor never leaves VMEM either way. Differentiable w.r.t.
    all nets' parameters including through the spatial gradient;
    `detach_light` reproduces the reference's feature detach
    (network/__init__.py:163-165)."""
    from ...models import mlp as mlp_mod

    n_sdf = len(icfg.layer_dims()) - 1
    n_rad = len(rcfg.layer_dims()) - 1
    feat_dim = icfg.feature_vector_size
    vdim = rcfg.layer_dims()[0] - feat_dim

    ws_sdf = [mlp_mod.linear_weight(params_implicit[f"lin{i}"])
              for i in range(n_sdf)]
    bs_sdf = [params_implicit[f"lin{i}"]["b"] for i in range(n_sdf)]
    ws_rad = [mlp_mod.linear_weight(params_rendering[f"lin{i}"])
              for i in range(n_rad)]
    bs_rad = [params_rendering[f"lin{i}"]["b"] for i in range(n_rad)]

    # output layout [features | sdf]: roll the sdf column (0) to the end
    perm_out = np.concatenate([np.arange(1, feat_dim + 1), [0]])
    ws_sdf[-1] = ws_sdf[-1][:, perm_out]
    bs_sdf[-1] = bs_sdf[-1][perm_out]
    if rcfg.mode == "idr":
        # natural row order [pts(3), pe(view), normals(3), feat]
        # (rendering_net_apply) -> kernel order [feat, pe(view), pts, g]
        vdim_v = vdim - 6
        perm_in = np.concatenate([
            np.arange(3 + vdim_v + 3, 3 + vdim_v + 3 + feat_dim),
            np.arange(3, 3 + vdim_v),
            np.arange(3),
            np.arange(3 + vdim_v, 3 + vdim_v + 3)])
    else:
        # radiance input layout [features | pe(dirs)] (reference order
        # is [pe(view), features])
        perm_in = np.concatenate([np.arange(vdim, vdim + feat_dim),
                                  np.arange(vdim)])
    ws_rad[0] = ws_rad[0][perm_in, :]

    lmask = None
    if lcfg is not None:
        n_l = len(lcfg.layer_dims()) - 1
        ws_l = tuple(mlp_mod.linear_weight(params_light[f"lin{i}"])
                     for i in range(n_l))
        bs_l = tuple(params_light[f"lin{i}"]["b"] for i in range(n_l))
        op = get_render_core_op(icfg, rcfg, block_rows, interpret,
                                lcfg=lcfg, detach_light=detach_light)
        grad, sdf, rgb, lmask = op(
            tuple(ws_sdf), tuple(bs_sdf), tuple(ws_rad), tuple(bs_rad),
            ws_l, bs_l, x, dirs)
    else:
        op = get_render_core_op(icfg, rcfg, block_rows, interpret)
        grad, sdf, rgb = op(tuple(ws_sdf), tuple(bs_sdf), tuple(ws_rad),
                            tuple(bs_rad), x, dirs)
    if icfg.sdf_bounding_sphere > 0.0:
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        sphere_sdf = icfg.sphere_scale * (icfg.sdf_bounding_sphere - norm)
        take_sphere = sphere_sdf < sdf
        sphere_grad = -icfg.sphere_scale * x / jnp.maximum(norm, 1e-12)
        sdf = jnp.minimum(sdf, sphere_sdf)
        grad = jnp.where(take_sphere, sphere_grad, grad)
    if lcfg is not None:
        return sdf, grad, rgb, lmask
    return sdf, grad, rgb
