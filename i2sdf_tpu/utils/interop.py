"""Reference (PyTorch) checkpoint import.

Converts a trained I2-SDF Lightning checkpoint's state dict into this
framework's parameter pytree, so users of the reference can carry their
trained models over without retraining. Handles:

* module naming: `model.{implicit,rendering,light}_network.lin{i}`,
  `model.bg_{implicit,rendering}_network.lin{i}`, `model.density.beta`
  (`/root/reference/model/network/__init__.py:26-42`,
  `model/trainer/recon.py`);
* weight-norm storage: classic `weight_g`/`weight_v` pairs AND the
  newer `parametrizations.weight.original0/1` layout, plus plain
  `weight` (torch Linear is (out, in); ours is (in, out));
* the PE layout change: the reference embeds interleaved
  ([x, sin(f0 x), cos(f0 x), ...], `model/network/embedder.py:28-47`)
  while this framework uses the TPU-first block layout
  ([x | sin dim-major | cos dim-major], models/embedder.py) — every
  first-layer (and skip-layer) weight row that consumes an embedding
  segment is permuted with `pe_permutation_from_reference`.

The conversion is pure numpy -> pytree; `torch.load` only happens in
`load_torch_checkpoint`. Verified by tests/test_interop.py against a
numpy replica of the reference forward semantics.
"""

from __future__ import annotations

import numpy as np

from ..models.embedder import pe_permutation_from_reference
from ..models.mlp import ImplicitNetConfig, RenderingNetConfig


def _torch_linear(sd: dict, prefix: str):
    """(w (out, in), g (out,) | None, b (out,)) from any torch layout."""
    if f"{prefix}.weight_v" in sd:
        return (np.asarray(sd[f"{prefix}.weight_v"]),
                np.asarray(sd[f"{prefix}.weight_g"]).reshape(-1),
                np.asarray(sd[f"{prefix}.bias"]))
    if f"{prefix}.parametrizations.weight.original0" in sd:
        return (np.asarray(sd[f"{prefix}.parametrizations.weight.original1"]),
                np.asarray(sd[f"{prefix}.parametrizations.weight.original0"]
                           ).reshape(-1),
                np.asarray(sd[f"{prefix}.bias"]))
    return (np.asarray(sd[f"{prefix}.weight"]), None,
            np.asarray(sd[f"{prefix}.bias"]))


def _convert_linear(sd: dict, prefix: str, row_perm=None) -> dict:
    w, g, b = _torch_linear(sd, prefix)
    v = np.ascontiguousarray(w.T)  # (in, out)
    if row_perm is not None:
        v = v[row_perm]  # input-axis norms are permutation-invariant
    v = v.astype(np.float32)
    b = b.astype(np.float32)
    if g is not None:
        return {"v": v, "g": g.astype(np.float32), "b": b}
    return {"w": v, "b": b}


def _segmented_perm(segments):
    """Concatenate per-segment permutations: segments = [(perm|size)]."""
    parts, off = [], 0
    for seg in segments:
        if isinstance(seg, (int, np.integer)):
            parts.append(off + np.arange(seg))
            off += int(seg)
        else:
            parts.append(off + np.asarray(seg))
            off += len(seg)
    return np.concatenate(parts)


def _implicit_perms(cfg: ImplicitNetConfig) -> dict:
    """layer index -> input row permutation for an ImplicitNetwork."""
    if cfg.embed_type != "positional":
        return {}
    dims = cfg.layer_dims()
    emb_dim = dims[0]
    perm = pe_permutation_from_reference(cfg.multires, cfg.d_in)
    assert len(perm) == emb_dim
    out = {0: perm}
    for l in cfg.skip_in:
        keep = dims[l] - emb_dim
        out[l] = _segmented_perm([keep, perm])
    return out


def _rendering_perm(cfg: RenderingNetConfig):
    """First-layer input row permutation for a RenderingNetwork."""
    if cfg.embed_type != "positional":
        return None
    view_perm = pe_permutation_from_reference(cfg.multires, cfg.d_in)
    feat = cfg.feature_vector_size
    if cfg.mode == "idr":
        # [points, PE(view), normals, features] — points un-embedded in
        # the shipped configs (point_embed_type None). A point-PE
        # checkpoint would need its own row permutation for the points
        # segment; fail fast rather than silently misalign every
        # downstream segment offset.
        if cfg.embed_point_multires:
            raise NotImplementedError(
                "checkpoint import with idr point PE "
                "(embed_point_multires set) is not supported — the "
                "points segment would need its own PE row permutation")
        pts = 3
        return _segmented_perm([pts, view_perm, 3, feat])
    # nerf: [PE(view), features]
    return _segmented_perm([view_perm, feat])


def _convert_net(sd, prefix, n_layers, perms):
    return {f"lin{i}": _convert_linear(sd, f"{prefix}.lin{i}",
                                       perms.get(i))
            for i in range(n_layers)}


def convert_state_dict(sd: dict, cfg) -> dict:
    """Reference state dict (numpy/tensor values) -> our params pytree.

    `cfg` is an I2SDFConfig built from the SAME yaml config the
    checkpoint was trained with.
    """
    sd = {k: v for k, v in sd.items()}
    # tolerate both bare and Lightning-prefixed keys
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    params = {
        "implicit": _convert_net(
            sd, "implicit_network", len(cfg.implicit.layer_dims()) - 1,
            _implicit_perms(cfg.implicit)),
        "rendering": _convert_net(
            sd, "rendering_network", len(cfg.rendering.layer_dims()) - 1,
            {0: _rendering_perm(cfg.rendering)}),
        "beta": np.float32(np.asarray(sd["density.beta"]).reshape(())),
    }
    if cfg.use_light:
        params["light"] = _convert_net(
            sd, "light_network", len(cfg.light.layer_dims()) - 1, {})
    if cfg.use_bg:
        params["bg_implicit"] = _convert_net(
            sd, "bg_implicit_network",
            len(cfg.bg_implicit.layer_dims()) - 1,
            _implicit_perms(cfg.bg_implicit))
        params["bg_rendering"] = _convert_net(
            sd, "bg_rendering_network",
            len(cfg.bg_rendering.layer_dims()) - 1,
            {0: _rendering_perm(cfg.bg_rendering)})
    import jax.numpy as jnp

    return jax_tree_map(jnp.asarray, params)


def jax_tree_map(fn, tree):
    import jax

    return jax.tree.map(fn, tree)


def load_torch_checkpoint(path: str, with_meta: bool = False):
    """Load a Lightning .ckpt (or bare state-dict .pth) into numpy.

    `with_meta=True` also returns the non-weight checkpoint metadata
    (e.g. Lightning's `global_step`) so callers don't deserialize the
    file twice."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    weights = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    if not with_meta:
        return weights
    meta = ({k: v for k, v in blob.items() if k != "state_dict"}
            if isinstance(blob, dict) else {})
    return weights, meta
