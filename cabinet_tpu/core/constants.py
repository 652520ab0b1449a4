"""Model/eval/training constants.

Numeric contracts mirror the reference (src/models/constants.py:6-35) so that
checkpoints, eval protocols and training recipes are interchangeable.
"""

from typing import Any, Dict

# MobileNetV3 backbone final feature widths (pre-pool 1x1 conv output).
MOBILENET_LARGE_FEATURES = 960
MOBILENET_SMALL_FEATURES = 576

# Channels entering the attention branch per backbone mode.
MODEL_CONFIG: Dict[str, Dict[str, Any]] = {
    "large": {
        "attention_planes": MOBILENET_LARGE_FEATURES,
        "output_channel": 1280,
    },
    "small": {
        "attention_planes": MOBILENET_SMALL_FEATURES,
        "output_channel": 1024,
    },
}

# Training constants.
OHEM_DIVISOR = 16  # n_min = batch * crop_h * crop_w // OHEM_DIVISOR
DEFAULT_SCORE_THRESHOLD = 0.7  # OHEM loss threshold

# Evaluation constants (sliding-window protocol, reference evaluate.py:124-126).
EVAL_STRIDE_RATE = 5 / 6.0
DEFAULT_EVAL_SCALES = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]

# Dataset constants.
CITYSCAPES_NUM_CLASSES = 19
UAVID_NUM_CLASSES = 8
DEFAULT_IGNORE_LABEL = 255

# Visualization constants.
VISUALIZATION_SAMPLE_LIMIT = 50
