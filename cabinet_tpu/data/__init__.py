from cabinet_tpu.data.datasets import (
    DATASET_KWARGS_BUILDERS,
    DATASET_REGISTRY,
    AeroScapes,
    CityScapes,
    UAVid,
    VDD,
)
from cabinet_tpu.data.loader import DataLoader

__all__ = [
    "AeroScapes",
    "CityScapes",
    "DATASET_KWARGS_BUILDERS",
    "DATASET_REGISTRY",
    "DataLoader",
    "UAVid",
    "VDD",
]
