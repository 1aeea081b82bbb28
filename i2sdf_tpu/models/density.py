"""SDF -> volume density transforms.

Capability parity with `/root/reference/model/network/density.py:1-47`.
Pure functions: the learnable `beta` lives in the model parameter pytree.
"""

from __future__ import annotations

import jax.numpy as jnp


def effective_beta(beta_param, beta_min: float = 1e-4):
    """Learnable raw beta -> strictly positive beta (|b| + beta_min)."""
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf, beta):
    """alpha * Laplace(0, beta).CDF(-sdf), with alpha = 1/beta.

    Written as alpha*(0.5 + 0.5*sign(sdf)*expm1(-|sdf|/beta)) for
    numerical robustness (parity: density.py:21-26).
    """
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(x):
    """NeRF++-style background density (parity: density.py:33-35)."""
    return jnp.abs(x)


def simple_density(x, noise=None):
    """NeRF-style relu density with optional pre-activation noise
    (parity: density.py:38-47)."""
    if noise is not None:
        x = x + noise
    return jnp.maximum(x, 0.0)
