"""Grain-based input pipeline (optional alternative to data/loader.py).

Wraps any framework dataset (FolderSegDataset / MosaicSegDataset — anything
with __len__ / __getitem__ returning (image HWC f32, label HW i64)) as a
grain RandomAccessDataSource and builds a grain DataLoader with:

  - per-epoch seeded shuffling (IndexSampler),
  - multi-host sharding via ShardByJaxProcess (each JAX process reads its own
    slice — same contract as DataLoader(shard=...)),
  - multiprocess workers (true parallelism for the PIL/numpy augmentation
    work, vs the thread pool in data/loader.py),
  - batch collation to stacked numpy arrays.

Use when the host-side augmentation becomes the training bottleneck; the
thread loader remains the zero-dependency default.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Tuple

import numpy as np


def make_grain_loader(
    dataset: Any,
    batch_size: int,
    shuffle: bool = False,
    num_epochs: Optional[int] = None,
    seed: int = 0,
    num_workers: int = 0,
    drop_remainder: bool = True,
    shard_by_process: bool = True,
):
    """Returns an iterable of (images (B,H,W,3) f32, labels (B,H,W) i64)."""
    import grain.python as gp

    class _Source(gp.RandomAccessDataSource):
        def __len__(self) -> int:
            return len(dataset)

        def __getitem__(self, idx: int):
            img, lbl = dataset[int(idx)]
            return {"image": np.asarray(img, np.float32),
                    "label": np.asarray(lbl, np.int64)}

    source = _Source()
    sharding = (gp.ShardByJaxProcess(drop_remainder=drop_remainder)
                if shard_by_process else gp.NoSharding())
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=sharding,
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    operations = [gp.Batch(batch_size=batch_size,
                           drop_remainder=drop_remainder)]
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=operations,
        worker_count=num_workers,
    )

    def as_tuples() -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for batch in loader:
            yield batch["image"], batch["label"]

    return as_tuples()
