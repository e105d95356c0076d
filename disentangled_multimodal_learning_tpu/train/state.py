"""Train state pytree (params + optimizer state + BN stats + step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any  # None for models without BatchNorm
    step: jax.Array

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        params = variables["params"]
        return cls(
            params=params,
            opt_state=tx.init(params),
            batch_stats=variables.get("batch_stats"),
            step=jnp.zeros((), jnp.int32),
        )
