from cabinet_tpu.train.early_stopping import EarlyStopping
from cabinet_tpu.train.ema import EmaState, ema_init, ema_update
from cabinet_tpu.train.losses import ohem_cross_entropy, softmax_focal_loss
from cabinet_tpu.train.optimizer import (
    build_optimizer,
    param_labels,
    warmup_poly_schedule,
)

__all__ = [
    "EarlyStopping",
    "EmaState",
    "build_optimizer",
    "ema_init",
    "ema_update",
    "ohem_cross_entropy",
    "param_labels",
    "softmax_focal_loss",
    "warmup_poly_schedule",
]
