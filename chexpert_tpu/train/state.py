"""TrainState: the explicit, immutable run state.

The reference stuffs mutable run state into args (args.step, chexpert.py:157)
and module attributes; here params / batch_stats / optimizer state / step are
one pytree, which is what jit donates, the checkpointer serializes, and the
ensemble vmaps over.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )


def init_model(model, rng, input_shape, jit_init: bool = True):
    """Initialize model variables; returns (params, batch_stats).

    jit'd: eager flax init compiles each op separately (minutes on CPU);
    one jitted graph is far faster and is also what TPU wants.
    """
    dummy = jnp.zeros(input_shape, jnp.float32)

    def init_fn(r):
        return model.init(r, dummy, train=False)

    variables = (jax.jit(init_fn) if jit_init else init_fn)(rng)
    return variables["params"], variables.get("batch_stats", {})
