"""Differentiation-safe vector math.

`jnp.linalg.norm` has a NaN gradient at exactly zero (d||x||/dx = x/||x||);
these helpers clamp inside the sqrt so gradients vanish instead of
exploding — essential because the loss battery computes every term
unconditionally and scales by (possibly zero) weights, and 0 * NaN = NaN
would poison the whole gradient.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims: bool = False, eps: float = 1e-24):
    """||x|| with zero (not NaN) gradient at x == 0."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=keepdims),
                                eps))


def safe_normalize(x, axis=-1, eps: float = 1e-12):
    """x/||x|| with bounded gradient near x == 0."""
    return x / jnp.maximum(safe_norm(x, axis=axis, keepdims=True), eps)
