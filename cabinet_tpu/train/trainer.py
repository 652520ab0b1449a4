"""Jitted training step: dual-head OHEM loss, gradient accumulation, EMA,
data-parallel sharding over a device mesh.

Capability parity with the reference train loop (src/scripts/train.py:411-480):
  - loss = OHEM(final) + OHEM(aux), each micro-batch loss scaled by
    1/accum_steps (:429-435),
  - gradients accumulate across `accum_steps` micro-batches; the optimizer
    steps once per window, with an end-of-epoch flush for the trailing
    partial window (:479-480),
  - global-norm clipping happens on the ACCUMULATED gradients at step time,
    inside the optax chain (:411-427),
  - EMA advances exactly once per real optimizer step (:419-427). On TPU
    there is no GradScaler inf/nan path — bf16 matmuls with fp32 master
    params replace torch AMP entirely (documented divergence, SURVEY §7.3).

TPU-first design: ONE jitted program handles both accumulate-only and apply
micro-steps via lax.cond (no host round-trip between micro-batches); the
TrainState is donated so parameter memory is reused in place; under a mesh
the batch is sharded on the data axis and XLA inserts the gradient psums.
BatchNorm uses per-device statistics, matching the reference's plain
nn.BatchNorm2d (SURVEY §2.6: per-replica BN decision).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from cabinet_tpu.train.ema import EmaState, ema_init, ema_update
from cabinet_tpu.train.losses import ohem_cross_entropy


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray          # optimizer steps taken (reference optim.it)
    micro_step: jnp.ndarray    # position within the accumulation window
    accum_grads: Any           # zeros between windows; running sum inside
    ema: EmaState

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def ema_variables(self):
        return self.ema.variables


def create_train_state(
    variables: Any,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    ema_tau: float = 2000.0,
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        micro_step=jnp.zeros((), jnp.int32),
        accum_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
        ema=ema_init({"params": params, "batch_stats": batch_stats},
                     decay=ema_decay, tau=ema_tau),
    )


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    n_min: int,
    thresh: float = 0.7,
    ignore_label: int = 255,
    class_weights: Optional[jnp.ndarray] = None,
    accum_steps: int = 1,
    compute_dtype: Any = jnp.float32,
    loss_type: str = "ohem",
    aux_weight: float = 1.0,
    ohem_method: str = "bisect",
    jit: bool = True,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], Tuple[TrainState, jnp.ndarray]]:
    """Build the jitted train step. `apply_fn(variables, x, train, mutable)`
    must return ((final, aux), {"batch_stats": ...}).

    loss_type: "ohem" (CABiNet recipe, reference train.py:435) or "ce"
    (plain weighted CE, YOLO-sem recipe). aux_weight scales the aux head's
    deep-supervision term (1.0 for CABiNet). jit=False returns the raw
    traceable step (e.g. to embed it in a lax.scan chain, bench.py)."""

    cw = None if class_weights is None else jnp.asarray(class_weights)

    def seg_loss(logits, labels):
        if loss_type == "ohem":
            # bisect method: O(N) quantile search instead of a full top_k
            # sort over ~8e6 pixels (identical value+grad, see losses.py)
            return ohem_cross_entropy(logits, labels, n_min, thresh,
                                      ignore_label, cw, method=ohem_method)
        from cabinet_tpu.train.losses import cross_entropy_mean

        return cross_entropy_mean(logits, labels, ignore_label, cw)

    def loss_fn(params, batch_stats, images, labels):
        (final, aux), mutated = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            images.astype(compute_dtype), train=True, mutable=["batch_stats"])
        loss = seg_loss(final, labels) + aux_weight * seg_loss(aux, labels)
        return loss / accum_steps, mutated["batch_stats"]

    def apply_update(state: TrainState, grads) -> TrainState:
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(state.ema, {"params": new_params,
                                         "batch_stats": state.batch_stats})
        return state.replace(
            params=new_params,
            opt_state=new_opt,
            step=state.step + 1,
            micro_step=jnp.zeros((), jnp.int32),
            accum_grads=jax.tree_util.tree_map(jnp.zeros_like, grads),
            ema=new_ema,
        )

    def train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray
                   ) -> Tuple[TrainState, jnp.ndarray]:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, labels)
        state = state.replace(batch_stats=new_stats)

        if accum_steps == 1:
            return apply_update(state, grads), loss * accum_steps

        summed = jax.tree_util.tree_map(jnp.add, state.accum_grads, grads)
        state = state.replace(micro_step=state.micro_step + 1)

        def do_apply(s):
            return apply_update(s, summed)

        def do_hold(s):
            return s.replace(accum_grads=summed)

        state = jax.lax.cond(state.micro_step >= accum_steps, do_apply,
                             do_hold, state)
        return state, loss * accum_steps

    if jit:
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step


def make_flush_step(tx: optax.GradientTransformation
                    ) -> Callable[[TrainState], TrainState]:
    """End-of-epoch flush of a trailing partial accumulation window
    (reference train.py:479-480). No-op when the window is empty."""

    @partial(jax.jit, donate_argnums=(0,))
    def flush(state: TrainState) -> TrainState:
        def do_apply(s):
            updates, new_opt = tx.update(s.accum_grads, s.opt_state, s.params)
            new_params = optax.apply_updates(s.params, updates)
            new_ema = ema_update(s.ema, {"params": new_params,
                                         "batch_stats": s.batch_stats})
            return s.replace(
                params=new_params,
                opt_state=new_opt,
                step=s.step + 1,
                micro_step=jnp.zeros((), jnp.int32),
                accum_grads=jax.tree_util.tree_map(jnp.zeros_like, s.accum_grads),
                ema=new_ema,
            )

        return jax.lax.cond(state.micro_step > 0, do_apply, lambda s: s, state)

    return flush


def make_eval_loss_step(
    apply_fn: Callable,
    n_min: int,
    thresh: float = 0.7,
    ignore_label: int = 255,
    class_weights: Optional[jnp.ndarray] = None,
    compute_dtype: Any = jnp.float32,
) -> Callable:
    """Validation loss on the raw (non-EMA) weights, full resolution
    (reference train.py:443-456)."""
    cw = None if class_weights is None else jnp.asarray(class_weights)

    @jax.jit
    def eval_loss(variables, images, labels):
        final, aux = apply_fn(variables, images.astype(compute_dtype),
                              train=False)
        return (ohem_cross_entropy(final, labels, n_min, thresh, ignore_label,
                                   cw, method="bisect")
                + ohem_cross_entropy(aux, labels, n_min, thresh, ignore_label,
                                     cw, method="bisect"))

    return eval_loss
