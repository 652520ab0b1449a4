"""On-device segmentation metrics.

The reference computes its confusion matrix per image on the HOST
(argmax D2H copy + numpy bincount, evaluate.py:161-191,222-228) — the eval
throughput limiter called out in SURVEY §3.2. Here the (C,C) histogram is
accumulated ON DEVICE (a single bincount over pred*C+label with the ignore
mask folded into an overflow bin) and only the tiny (C,C) matrix crosses to
the host per batch. Under a sharded eval step, psum over the data axis
replaces the reference's dist.reduce (evaluate.py:230-235).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, n_classes: int,
                     ignore_label: int = 255) -> jnp.ndarray:
    """(C, C) histogram, rows = pred, cols = label (reference compute_hist
    indexing: intersection = pred * C + label, evaluate.py:184-190).

    Computed as one_hot(pred)^T @ one_hot(label) with the ignore mask folded
    into the pred side — an MXU matmul instead of bincount's scatter path
    (scatters/gathers are the slow ops on TPU)."""
    import jax

    valid = (label != ignore_label).reshape(-1)
    p = jnp.clip(pred, 0, n_classes - 1).astype(jnp.int32).reshape(-1)
    lb = jnp.clip(label, 0, n_classes - 1).astype(jnp.int32).reshape(-1)
    oh_p = jax.nn.one_hot(p, n_classes, dtype=jnp.float32) * valid[:, None]
    oh_l = jax.nn.one_hot(lb, n_classes, dtype=jnp.float32)
    hist = jax.lax.dot_general(oh_p, oh_l,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return hist.astype(jnp.int32)


def metrics_from_hist(hist: np.ndarray) -> Dict[str, object]:
    """mIoU / accuracy / per-class IoU from an accumulated confusion matrix
    (reference evaluate.py:238-251)."""
    hist = np.asarray(hist, dtype=np.float64)
    diag = np.diag(hist)
    ious = diag / (hist.sum(axis=0) + hist.sum(axis=1) - diag + 1e-8)
    with np.errstate(invalid="ignore"):
        miou = float(np.nanmean(ious))
    total = hist.sum()
    acc = float(diag.sum() / total) if total > 0 else 0.0
    return {
        "mIoU": miou,
        "accuracy": acc,
        "iou_per_class": {f"class_{i}": float(v) for i, v in enumerate(ious)},
        "confusion_matrix": hist,
    }
