"""Dataset mean/std computation (replaces the reference's three
compute_*_stats.py one-off scripts with one function)."""

from __future__ import annotations

import os
import os.path as osp
from typing import Tuple

import numpy as np
from PIL import Image


def compute_dataset_stats(image_dir: str,
                          extensions: Tuple[str, ...] = (".png", ".jpg", ".jpeg"),
                          max_images: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std over images in a directory (values in [0,1]).

    Matches the reference scripts' accumulation (sum of per-image channel
    means / squared means, e.g. compute_uavid_stats.py:13-27).
    """
    files = sorted(f for f in os.listdir(image_dir)
                   if f.lower().endswith(extensions))
    if max_images:
        files = files[:max_images]
    if not files:
        raise FileNotFoundError(f"No images found in {image_dir}")

    mean = np.zeros(3, dtype=np.float64)
    sq = np.zeros(3, dtype=np.float64)
    for f in files:
        arr = np.asarray(Image.open(osp.join(image_dir, f)).convert("RGB"),
                         dtype=np.float64) / 255.0
        mean += arr.mean(axis=(0, 1))
        sq += (arr ** 2).mean(axis=(0, 1))
    mean /= len(files)
    sq /= len(files)
    std = np.sqrt(np.maximum(sq - mean ** 2, 0))
    return mean.astype(np.float32), std.astype(np.float32)
