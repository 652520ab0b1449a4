"""Patience-based early stopping (parity: reference src/utils/early_stopping.py:17-45)."""

from __future__ import annotations

import math
from typing import Any, Dict, Optional


class EarlyStopping:
    """Stop when fitness (mIoU) hasn't improved for `patience` epochs.

    Numeric contract (kept identical to the reference so resumed runs stop
    at the same epoch): patience=0 disables stopping entirely; fitness=None
    epochs are no-ops (they neither improve nor advance the patience clock's
    reference point); a stored best of exactly 0.0 is treated as "no best
    yet", so the first real measurement always becomes the new best even if
    it is worse than an (impossible) zero mIoU.
    """

    def __init__(self, patience: int = 0) -> None:
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or math.inf

    def __call__(self, epoch: int, fitness: Optional[float]) -> bool:
        if fitness is None:
            return False
        if fitness > self.best_fitness or self.best_fitness == 0:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience

    def state_dict(self) -> Dict[str, Any]:
        return {"best_fitness": self.best_fitness, "best_epoch": self.best_epoch}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.best_fitness = state["best_fitness"]
        self.best_epoch = state["best_epoch"]
