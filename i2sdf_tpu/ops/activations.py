"""Custom activations with stabilized gradients.

Capability parity with `/root/reference/utils/__init__.py:93-109`
(trunc_exp: exp with a clamped backward so large pre-activations don't
produce inf gradients) — as a `jax.custom_vjp` instead of a torch
autograd.Function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    # clamp the saved pre-activation to [-15, 15] in the backward only
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
