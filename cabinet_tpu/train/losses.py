"""Segmentation losses, formulated for XLA (static shapes, no host sync).

OHEM cross-entropy matches the reference's dynamic-shape algorithm
(src/utils/loss.py:38-80) exactly, re-derived with static shapes:

reference:  sort valid per-pixel CE descending; if the n_min-th value is above
            `thresh`, average every value above thresh, else average the top
            n_min (n_min clamped to the number of valid pixels); empty valid
            mask -> 0.

here:       invalid pixels get loss -inf so they can never be selected; the
            n_min-th largest VALID loss (`kth`) comes from a full descending
            sort (or `jax.lax.top_k`); both candidate means are computed with
            masked sums and selected with `jnp.where`. No data-dependent
            shapes, so the whole loss jits into one fused program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cabinet_tpu.core.constants import DEFAULT_IGNORE_LABEL

_NEG_INF = -jnp.inf


def _per_pixel_ce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int,
    class_weights: Optional[jnp.ndarray],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel weighted CE and validity mask.

    logits: (..., C) float; labels: (...,) int. Matches
    F.cross_entropy(reduction='none', ignore_index, weight).
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    # picked log-prob via one-hot arithmetic: take_along_axis gathers are
    # ~100x slower than this on TPU (measured 182 ms vs ~2 ms for a
    # (8,1024,1024,8) batch on v5e).
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
    picked = (jnp.sum(logits * onehot, axis=-1)
              - jax.nn.logsumexp(logits, axis=-1))
    loss = -picked
    if class_weights is not None:
        w = jnp.sum(jnp.asarray(class_weights, jnp.float32) * onehot, axis=-1)
        loss = loss * w
    loss = jnp.where(valid, loss, 0.0)
    return loss, valid


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    n_min: int,
    thresh: float = 0.7,
    ignore_label: int = DEFAULT_IGNORE_LABEL,
    class_weights: Optional[jnp.ndarray] = None,
    method: str = "topk",
) -> jnp.ndarray:
    """Online-hard-example-mining CE over NHWC logits (B,H,W,C) / labels (B,H,W).

    `n_min` must be a static Python int (caller computes
    batch*crop_h*crop_w // OHEM_DIVISOR, reference train.py:330).

    method:
      - "topk": exact, via jax.lax.top_k (full sort under the hood — slow on
        TPU for the production n_min of ~5e5 over ~8e6 pixels),
      - "bisect": O(N)-pass value-domain quantile search. The selected MEAN
        is exact up to the bisection interval (~max_loss * 2^-40, below f32
        resolution after 40 halvings): mean-of-top-k only needs the sum of
        losses above the k-th value plus the tie mass AT that value, both of
        which masked reductions provide without materializing any ordering.
        This is the trainer's default (train/trainer.py).
    """
    loss, valid = _per_pixel_ce(logits, labels, ignore_label, class_weights)
    flat = jnp.where(valid.reshape(-1), loss.reshape(-1), _NEG_INF)
    n_valid = jnp.sum(valid)
    n_min = int(min(max(n_min, 1), flat.shape[0]))
    n_top = jnp.minimum(n_valid, n_min)  # clamp (reference loss.py:71-74)

    # Candidate A: mean of all valid losses above thresh.
    above = flat > thresh  # -inf entries are never above
    sum_above = jnp.sum(jnp.where(above, flat, 0.0))
    cnt_above = jnp.sum(above)
    mean_above = sum_above / jnp.maximum(cnt_above, 1)

    if method == "topk":
        top = jax.lax.top_k(flat, n_min)[0]  # descending, -inf beyond n_valid
        top_is_valid = top > _NEG_INF
        # n_min-th largest valid loss (clamped to n_valid).
        kth = jnp.min(jnp.where(top_is_valid, top, jnp.inf))
        sum_top = jnp.sum(jnp.where(top_is_valid, top, 0.0))
        mean_top = sum_top / jnp.maximum(n_top, 1)
        kth_above_thresh = kth > thresh
    elif method == "bisect":
        vals = jnp.where(flat > _NEG_INF, flat, 0.0)
        hi0 = jnp.max(vals) + 1.0
        lo0 = jnp.zeros((), jnp.float32)  # CE >= 0

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum(flat > mid)
            # keep count(flat > lo) >= n_top >= count(flat > hi)
            return jnp.where(cnt >= n_top, mid, lo), jnp.where(cnt >= n_top, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 40, body, (lo0, hi0))
        # stop_gradient: the cut value is built arithmetically from
        # max(vals), which would otherwise leak a spurious gradient onto
        # the argmax element through the tie-fill term below.
        lo = jax.lax.stop_gradient(lo)
        hi = jax.lax.stop_gradient(hi)
        kth = lo  # count(flat > lo) >= n_top, interval width ~2^-40 * max
        strictly = flat > hi
        sum_strict = jnp.sum(jnp.where(strictly, flat, 0.0))
        cnt_strict = jnp.sum(strictly)
        # fill the remainder with the (tied) cut value
        sum_top = sum_strict + (n_top - cnt_strict) * kth
        mean_top = sum_top / jnp.maximum(n_top, 1)
        kth_above_thresh = kth > thresh
    else:
        raise ValueError(f"Unknown OHEM method: {method}")

    picked = jnp.where(kth_above_thresh, mean_above, mean_top)
    return jnp.where(n_valid > 0, picked, 0.0)


def softmax_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_label: int = DEFAULT_IGNORE_LABEL,
) -> jnp.ndarray:
    """Focal loss matching the reference (src/utils/loss.py:86-127):
    nll of (1-p)^gamma * log p, with torch nll_loss weighted-mean semantics
    (sum of weighted losses / sum of picked class weights)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    logits = logits.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    focal = (1.0 - p) ** gamma * logp
    onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
    picked = jnp.sum(focal * onehot, axis=-1)

    if class_weights is not None:
        w = jnp.sum(jnp.asarray(class_weights, jnp.float32) * onehot, axis=-1)
    else:
        w = jnp.ones_like(picked)
    w = jnp.where(valid, w, 0.0)
    num = -jnp.sum(w * jnp.where(valid, picked, 0.0))
    den = jnp.sum(w)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)


def cross_entropy_mean(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = DEFAULT_IGNORE_LABEL,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain masked-mean CE (validation loss; torch mean semantics: with class
    weights the denominator is the sum of picked weights)."""
    loss, valid = _per_pixel_ce(logits, labels, ignore_label, class_weights)
    if class_weights is not None:
        safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
        onehot = jax.nn.one_hot(safe_labels, logits.shape[-1],
                                dtype=jnp.float32)
        w = jnp.sum(jnp.asarray(class_weights, jnp.float32) * onehot, axis=-1)
        den = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        den = jnp.sum(valid)
    return jnp.where(den > 0, jnp.sum(loss) / jnp.maximum(den, 1e-12), 0.0)
