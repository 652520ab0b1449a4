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
    shard: Optional[Tuple[int, int]] = None,
):
    """Returns an iterable of (images (B,H,W,3) f32, labels (B,H,W) i64).

    ``shard=(index, count)`` gives this iterator records
    ``index::count``-style ownership of the dataset (grain's equalized
    sharding) — the EXPLICIT tuple is honored, matching the thread
    ``DataLoader(shard=...)`` contract, rather than silently substituting
    grain's own ``jax.process_index()``."""
    import grain.python as gp

    class _Source(gp.RandomAccessDataSource):
        def __len__(self) -> int:
            return len(dataset)

        def __getitem__(self, idx: int):
            item = dataset[int(idx)]
            if len(item) == 3:  # geometric='device': (canvas, label, hw)
                return {"image": np.asarray(item[0]),
                        "label": np.asarray(item[1]),
                        "hw": np.asarray(item[2])}
            img, lbl = item
            return {"image": np.asarray(img, np.float32),
                    "label": np.asarray(lbl, np.int64)}

    source = _Source()
    # Shard-level remainder handling is deliberately DECOUPLED from batch
    # drop_remainder: shards are always equalized (each process gets exactly
    # n // shard_count records) so every process yields the same number of
    # batches — unequal per-host batch counts deadlock synchronized
    # multi-host training on the first collective of the missing step.
    sharding = (gp.ShardOptions(shard_index=int(shard[0]),
                                shard_count=int(shard[1]),
                                drop_remainder=True)
                if shard is not None else gp.NoSharding())
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

    def as_tuples() -> Iterator[Tuple[np.ndarray, ...]]:
        for batch in loader:
            if "hw" in batch:
                yield batch["image"], batch["label"], batch["hw"]
            else:
                yield batch["image"], batch["label"]

    return as_tuples()


class GrainLoader:
    """Drop-in replacement for ``data.loader.DataLoader`` backed by grain
    worker PROCESSES (the reference trains through torch DataLoader worker
    processes, src/scripts/train.py:248-275; the thread loader is GIL-bound
    for PIL augmentation on multicore hosts).

    Same contract as the thread loader where ``cli.train``/``cli.evaluate``
    use it: ``len()`` = batches per epoch, ``set_epoch(e)`` reshuffles
    deterministically from (seed, epoch), and each ``__iter__`` yields one
    epoch of (images (B,H,W,3) f32, labels (B,H,W) i64) numpy batches —
    re-iterable (the int8-calibration + evaluate double pass). A fresh grain
    DataLoader is built per pass so the per-epoch seed and any
    ``dataset.set_epoch`` augmentation state are captured at worker-spawn
    time. Selected via the ``runtime.loader=grain`` config knob.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        shard: Optional[Tuple[int, int]] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = int(num_workers)
        self.seed = int(seed)
        self.shard = shard
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.shard is not None:
            # matches ShardByJaxProcess(drop_remainder=True): every process
            # gets exactly n // process_count records (see make_grain_loader)
            n = n // self.shard[1]
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return make_grain_loader(
            self.dataset,
            self.batch_size,
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + self._epoch,
            num_workers=self.num_workers,
            drop_remainder=self.drop_last,
            shard=self.shard,
        )
