"""Train state pytree.

Unlike the reference — which checkpoints trainable variables only, losing
optimizer momentum, gradient accumulators, step and LR on restore
(reference network.py:100-102, SURVEY.md §5) — the state here is the FULL
resume unit: params, optimizer state (momentum + MultiSteps accumulators),
step counter and PRNG key.
"""

from __future__ import annotations

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar, counts microbatches like the reference's i
    params: dict
    opt_state: optax.OptState
    rng: jax.Array  # PRNG key threaded through dropout/E-step/augment

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng: jax.Array):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        )
