"""Optax optimizer: SGD + momentum, linear warmup + polynomial decay,
4 parameter groups with differential weight decay and decoder x10 LR.

Numeric contract mirrors the reference Optimizer (src/utils/optimizer.py:34-156):
  - lr(it) = warmup_start + (it/warmup)*(lr0-warmup_start) for it < warmup,
    else lr0 * (1 - k)^power with k = (it-warmup)/(max_iter-warmup)
    (here k is additionally clamped to <=1 so steps beyond max_iter yield
    lr=0 instead of NaN — intentional hardening),
  - `it` counts OPTIMIZER steps, not micro-batches (optimizer.py:21-32);
    gradient accumulation lives outside this transformation,
  - group assignment mirrors CABiNet.get_params (reference cabinet.py:249-300):
    decoder modules (ab/ffm/conv_out) get lr x `lr_multiplier`; only conv
    kernels get weight decay (BN scale/bias, conv/dense biases, SE dense
    kernels and the CAB gamma are no-wd, exactly like the reference's
    isinstance(Conv2d) test),
  - torch-SGD update order: g += wd*p, buf = mu*buf + g, p -= lr*buf.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from cabinet_tpu.models.cabinet import DECODER_MODULES

WD = "wd"
NOWD = "nowd"
WD_X = "wd_x10"
NOWD_X = "nowd_x10"


def warmup_poly_schedule(
    lr0: float,
    max_iter: int,
    power: float = 0.9,
    warmup_steps: int = 0,
    warmup_start_lr: float = 1e-5,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear warmup then poly decay (reference optimizer.py:124-138)."""

    def schedule(count: jnp.ndarray) -> jnp.ndarray:
        count = jnp.asarray(count, jnp.float32)
        warm = warmup_start_lr + (count / max(warmup_steps, 1)) * (lr0 - warmup_start_lr)
        # 1-k computed as (max_iter - count)/(max_iter - warmup): no f32
        # cancellation near max_iter, and clamping to >=0 hardens the
        # reference formula against NaN beyond max_iter (optimizer.py:134-136).
        remaining = jnp.clip(
            (float(max_iter) - count) / max(float(max_iter) - warmup_steps, 1.0),
            0.0, 1.0)
        poly = lr0 * remaining ** power
        if warmup_steps <= 0:
            return poly
        return jnp.where(count < warmup_steps, warm, poly)

    return schedule


def warmup_cosine_schedule(
    lr0: float,
    lrf: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_start_lr: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Ultralytics-style one-cycle cosine: lr(x) = lr0 * ((1-cos(pi x))/2 *
    (lrf - 1) + 1), x in [0,1], with linear warmup (the YOLO pipeline's
    schedule, reference configs/train_yolo.yaml: cos_lr + lrf)."""

    def schedule(count: jnp.ndarray) -> jnp.ndarray:
        count = jnp.asarray(count, jnp.float32)
        warm = warmup_start_lr + (count / max(warmup_steps, 1)) * (lr0 - warmup_start_lr)
        x = jnp.clip((count - warmup_steps)
                     / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = lr0 * ((1.0 - jnp.cos(jnp.pi * x)) / 2.0 * (lrf - 1.0) + 1.0)
        if warmup_steps <= 0:
            return cos
        return jnp.where(count < warmup_steps, warm, cos)

    return schedule


def build_sgd(
    params: Any,
    schedule: Callable,
    momentum: float = 0.937,
    wd: float = 5e-4,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Uniform-LR SGD with wd on conv kernels only (YOLO-sem pipeline)."""
    groups = {
        WD: _sgd_group(schedule, momentum, wd, 1.0),
        NOWD: _sgd_group(schedule, momentum, 0.0, 1.0),
    }
    labels = jax.tree_util.tree_map_with_path(
        lambda path, leaf: WD if (path and getattr(path[-1], "key", None) ==
                                  "kernel" and jnp.ndim(leaf) == 4) else NOWD,
        params)
    tx = optax.multi_transform(groups, labels)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def param_labels(params: Any,
                 decoder_modules: Sequence[str] = DECODER_MODULES) -> Any:
    """Label tree for optax.multi_transform, mirroring CABiNet.get_params.

    A leaf gets weight decay iff it is a conv kernel (4D, leaf name 'kernel');
    it gets the x10 LR iff its top-level module is a decoder module.
    """

    def label(path, leaf) -> str:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        top = keys[0] if keys else None
        decode = top in decoder_modules
        is_kernel = keys and keys[-1] == "kernel" and jnp.ndim(leaf) == 4
        if decode:
            return WD_X if is_kernel else NOWD_X
        return WD if is_kernel else NOWD

    return jax.tree_util.tree_map_with_path(label, params)


def _sgd_group(schedule: Callable, momentum: float, wd: float,
               lr_scale: float) -> optax.GradientTransformation:
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    scaled = (lambda c: schedule(c) * lr_scale) if lr_scale != 1.0 else schedule
    parts.append(optax.scale_by_learning_rate(scaled))
    return optax.chain(*parts)


def build_optimizer(
    params: Any,
    lr0: float,
    max_iter: int,
    momentum: float = 0.9,
    wd: float = 5e-4,
    power: float = 0.9,
    warmup_steps: int = 0,
    warmup_start_lr: float = 1e-5,
    lr_multiplier: float = 10.0,
    max_grad_norm: Optional[float] = None,
    decoder_modules: Sequence[str] = DECODER_MODULES,
) -> optax.GradientTransformation:
    """Build the full gradient transformation (clipping + grouped SGD)."""
    schedule = warmup_poly_schedule(lr0, max_iter, power, warmup_steps,
                                    warmup_start_lr)
    groups: Dict[str, optax.GradientTransformation] = {
        WD: _sgd_group(schedule, momentum, wd, 1.0),
        NOWD: _sgd_group(schedule, momentum, 0.0, 1.0),
        WD_X: _sgd_group(schedule, momentum, wd, lr_multiplier),
        NOWD_X: _sgd_group(schedule, momentum, 0.0, lr_multiplier),
    }
    labels = param_labels(params, decoder_modules)
    tx = optax.multi_transform(groups, labels)
    if max_grad_norm:
        # Reference clips the global grad norm before stepping (train.py:411-427).
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def current_lr(schedule: Callable, step: int) -> float:
    return float(schedule(jnp.asarray(step)))
