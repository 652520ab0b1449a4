from cabinet_tpu.core.constants import (
    CITYSCAPES_NUM_CLASSES,
    DEFAULT_EVAL_SCALES,
    DEFAULT_IGNORE_LABEL,
    DEFAULT_SCORE_THRESHOLD,
    EVAL_STRIDE_RATE,
    MOBILENET_LARGE_FEATURES,
    MOBILENET_SMALL_FEATURES,
    MODEL_CONFIG,
    OHEM_DIVISOR,
    UAVID_NUM_CLASSES,
    VISUALIZATION_SAMPLE_LIMIT,
)
from cabinet_tpu.core.exceptions import (
    CABiNetError,
    ConfigurationError,
    DatasetError,
    ModelLoadError,
    TrainingError,
)

__all__ = [
    "CITYSCAPES_NUM_CLASSES",
    "DEFAULT_EVAL_SCALES",
    "DEFAULT_IGNORE_LABEL",
    "DEFAULT_SCORE_THRESHOLD",
    "EVAL_STRIDE_RATE",
    "MOBILENET_LARGE_FEATURES",
    "MOBILENET_SMALL_FEATURES",
    "MODEL_CONFIG",
    "OHEM_DIVISOR",
    "UAVID_NUM_CLASSES",
    "VISUALIZATION_SAMPLE_LIMIT",
    "CABiNetError",
    "ConfigurationError",
    "DatasetError",
    "ModelLoadError",
    "TrainingError",
]
