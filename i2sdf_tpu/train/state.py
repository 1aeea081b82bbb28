"""Train state: parameters + Adam(eps=1e-15) + exponential LR decay.

Optimizer parity with `/root/reference/model/trainer/recon.py:201-207`:
Adam with eps=1e-15 and per-step ExponentialLR with gamma =
decay_rate ** (1/decay_steps) (i.e. lr(t) = lr0 * decay_rate^(t/T)).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_lr_schedule(learning_rate: float, decay_rate: float,
                     decay_steps: int) -> optax.Schedule:
    return optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
    )


def make_optimizer(learning_rate: float = 5e-4, decay_rate: float = 0.1,
                   decay_steps: int = 200_000) -> optax.GradientTransformation:
    schedule = make_lr_schedule(learning_rate, decay_rate, decay_steps)
    # plain per-leaf Adam: optax.flatten measured as a NO-OP-to-negative
    # on v5e (XLA already fuses the whole update into the step program;
    # see docs/PERFORMANCE.md "Negative results")
    return optax.adam(schedule, eps=1e-15)


def create_train_state(params, learning_rate: float = 5e-4,
                       decay_rate: float = 0.1,
                       decay_steps: int = 200_000) -> tuple[TrainState,
                                                            optax.GradientTransformation]:
    import jax.numpy as jnp

    tx = make_optimizer(learning_rate, decay_rate, decay_steps)
    opt_state = tx.init(params)
    return TrainState(step=jnp.int32(0), params=params,
                      opt_state=opt_state), tx
