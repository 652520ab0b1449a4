"""Parallelism utilities (re-export of the mesh/collectives layer).

The framework's distributed design lives in cabinet_tpu.core.mesh (device
mesh, batch/replicated shardings, multi-host index sharding); the jitted
train/eval steps get their gradient psums and histogram reductions from XLA
via sharding annotations. This package name mirrors the conventional layout
(models/ops/parallel/utils) for discoverability.
"""

from cabinet_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    auto_data_axis,
    batch_sharding,
    local_batch_size,
    make_mesh,
    process_shard,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "auto_data_axis",
    "batch_sharding",
    "local_batch_size",
    "make_mesh",
    "process_shard",
    "replicate",
    "replicated",
    "shard_batch",
]
