"""Exponential moving average of model variables (pure / jittable).

Matches the reference ModelEMA (src/utils/ema.py:27-72): decay ramps as
decay * (1 - exp(-updates / tau)); float leaves are lerped, integer leaves are
copied through untouched. On TPU there is no AMP GradScaler inf/nan skip path
(bf16 training needs none) — the trainer simply calls ema_update exactly once
per real optimizer step, which preserves the reference's "EMA advances only
when the optimizer stepped" semantics (train.py:419-427).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EmaState:
    variables: Any  # shadow copy of {"params":..., "batch_stats":...}
    updates: jnp.ndarray  # int32 counter
    decay: float = flax.struct.field(pytree_node=False, default=0.9999)
    tau: float = flax.struct.field(pytree_node=False, default=2000.0)


def ema_init(variables: Any, decay: float = 0.9999, tau: float = 2000.0) -> EmaState:
    # Deep-copy (reference ema.py:44 deepcopy) — the shadow must not alias the
    # live buffers, both for correctness and for XLA buffer donation.
    shadow = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
    return EmaState(variables=shadow, updates=jnp.zeros((), jnp.int32),
                    decay=decay, tau=tau)


def ema_update(state: EmaState, variables: Any) -> EmaState:
    updates = state.updates + 1
    d = state.decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / state.tau))

    def lerp(e, v):
        if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
            return e * d + jnp.asarray(v, e.dtype) * (1.0 - d)
        return e  # int buffers untouched (reference ema.py:61-65)

    new_vars = jax.tree_util.tree_map(lerp, state.variables, variables)
    return state.replace(variables=new_vars, updates=updates)
