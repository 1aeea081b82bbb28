"""Alpha compositing for volume rendering (log-space transmittance).

Capability parity with `/root/reference/model/network/__init__.py:223-256`
(`volume_rendering` / `bg_volume_rendering`). Pure elementwise + cumsum
ops — XLA fuses these into the surrounding computation; all math in f32
(transmittance products are precision-sensitive).
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import prefix_sum


def render_weights(z_vals: jnp.ndarray, z_max: jnp.ndarray, density: jnp.ndarray):
    """VolSDF foreground compositing weights.

    z_vals: (R, S) sorted sample depths; z_max: (R,) the stripped last
    sample (sphere far intersection); density: (R, S).
    Returns (weights (R, S), bg_transmittance (R,)).
    """
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate(
        [dists, (z_max[:, None] - z_vals[:, -1:])], axis=-1)

    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-prefix_sum(shifted))
    fg_transmittance = transmittance[:, :-1]
    weights = alpha * fg_transmittance
    bg_transmittance = transmittance[:, -1]
    return weights, bg_transmittance


def render_weights_bg(z_vals_bg: jnp.ndarray, density: jnp.ndarray):
    """NeRF++ background compositing weights.

    z_vals_bg: (R, S) *descending* inverse-depths (flipped 1 -> 0);
    density: (R, S). Last interval is treated as infinite (1e10).
    """
    dists = z_vals_bg[:, :-1] - z_vals_bg[:, 1:]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1)
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-prefix_sum(shifted))
    return alpha * transmittance
