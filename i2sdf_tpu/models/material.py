"""Spatial material field + learnable per-emitter emission.

This is the trainable core of the intrinsic-decomposition (editing)
stage. The reference scaffolds the stage but never released it: its
MaterialDataset (`/root/reference/dataset/train_dataset.py:212-350`),
Monte-Carlo RenderingLayer (`model/rendering/__init__.py:10-89`) and
per-emitter learnable emission parameters
(`model/network/__init__.py:49-75`) all ship as dead code. Here the
missing piece is provided: a positional-encoded MLP field mapping a
world-space surface point to (kd, ks, roughness), plus per-emitter
log-radiance parameters, optimized by `train/material.py` against the
observed images with the reconstructed geometry frozen.

TPU-first: one trunk with a fused 7-channel head (a single matmul chain
the MXU tiles cleanly) instead of the per-quantity separate networks an
incremental port would produce; parameters are plain pytrees consumed by
`jax.grad`.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .embedder import get_embedder
from .mlp import Params, linear_apply, linear_init


@dataclasses.dataclass(frozen=True)
class MaterialNetConfig:
    d_in: int = 3
    dims: Sequence[int] = (256,) * 4
    weight_norm: bool = True
    embed_type: str | None = "positional"
    multires: int = 6
    # physically-motivated output ranges: a perfectly smooth GGX lobe is
    # numerically singular, so roughness is floored; ks is a [0,1]
    # specular albedo (0.04 ~ dielectric F0)
    min_roughness: float = 0.04

    def layer_dims(self) -> list[int]:
        d0 = self.d_in
        if self.embed_type:
            _, d0 = get_embedder(self.embed_type, input_dims=self.d_in,
                                 multires=self.multires)
        # head: kd (3) + ks (3) + roughness (1)
        return [d0] + list(self.dims) + [7]

    def embed_fn(self):
        if self.embed_type:
            fn, _ = get_embedder(self.embed_type, input_dims=self.d_in,
                                 multires=self.multires)
            return fn
        return None

    @classmethod
    def from_cfgnode(cls, node) -> "MaterialNetConfig":
        return cls(
            d_in=node.get("d_in", 3),
            dims=tuple(node.get("dims", (256,) * 4)),
            weight_norm=node.get("weight_norm", True),
            embed_type=node.get("embed_type", "positional"),
            multires=node.get("multires", 6),
            min_roughness=node.get("min_roughness", 0.04),
        )


def material_net_init(key, cfg: MaterialNetConfig) -> Params:
    dims = cfg.layer_dims()
    keys = jax.random.split(key, len(dims) - 1)
    return {f"lin{i}": linear_init(keys[i], dims[i], dims[i + 1],
                                   weight_norm=cfg.weight_norm)
            for i in range(len(dims) - 1)}


def material_net_apply(params: Params, cfg: MaterialNetConfig,
                       x: jnp.ndarray) -> dict:
    """(N, 3) points -> {'kd': (N,3), 'ks': (N,3), 'rough': (N,)}."""
    embed = cfg.embed_fn()
    h = embed(x) if embed is not None else x
    n_layers = len(cfg.layer_dims()) - 1
    for i in range(n_layers):
        h = linear_apply(params[f"lin{i}"], h)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    kd = jax.nn.sigmoid(h[:, 0:3])
    ks = jax.nn.sigmoid(h[:, 3:6])
    rough = (cfg.min_roughness
             + (1.0 - cfg.min_roughness) * jax.nn.sigmoid(h[:, 6]))
    return {"kd": kd, "ks": ks, "rough": rough}


def emission_init(radiance, ambient: float = 0.02) -> Params:
    """Per-emitter learnable emission + a learnable global ambient
    irradiance, both parameterized in log space so the optimizer works
    multiplicatively across the HDR dynamic range and values stay
    positive (the reference registers raw RGB Parameters,
    `/root/reference/model/network/__init__.py:66-74`).

    The ambient term approximates indirect (multi-bounce) light: the
    material model's outgoing radiance is
    `kd * ambient + direct(kd, ks, rough)`. Without it, pixels whose
    geometry faces away from every emitter carry zero direct signal and
    their albedo is unconstrained noise (measured: near-zero albedo
    correlation on the demo scene, whose shading has an ambient term)."""
    radiance = jnp.asarray(radiance, jnp.float32)
    amb = jnp.full((3,), float(ambient), jnp.float32)
    return {"log_radiance": jnp.log(jnp.clip(radiance, 1e-4, None)),
            "log_ambient": jnp.log(amb)}


def emission_apply(params: Params) -> jnp.ndarray:
    """(E, 3) per-emitter radiance."""
    return jnp.exp(params["log_radiance"])


def ambient_apply(params: Params) -> jnp.ndarray:
    """(3,) global ambient irradiance (zeros for pre-ambient params)."""
    if "log_ambient" not in params:
        return jnp.zeros((3,), jnp.float32)
    return jnp.exp(params["log_ambient"])
