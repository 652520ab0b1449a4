"""Grain pipeline adapter tests (single-process; multiprocess workers are
exercised in real training, not under pytest)."""

import numpy as np
import pytest

pytest.importorskip("grain")

from cabinet_tpu.data.grain_loader import make_grain_loader


class ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (np.full((4, 4, 3), float(i), np.float32),
                np.full((4, 4), i % 3, np.int64))


def test_batches_and_shapes():
    it = make_grain_loader(ToyDataset(10), batch_size=4, num_epochs=1)
    batches = list(it)
    assert len(batches) == 2  # drop_remainder
    imgs, lbls = batches[0]
    assert imgs.shape == (4, 4, 4, 3) and imgs.dtype == np.float32
    assert lbls.shape == (4, 4, 4) and lbls.dtype == np.int64


def test_shuffle_deterministic_by_seed():
    def order(seed):
        it = make_grain_loader(ToyDataset(12), batch_size=12, shuffle=True,
                               num_epochs=1, seed=seed)
        (imgs, _), = list(it)
        return imgs[:, 0, 0, 0].astype(int).tolist()

    a, b, c = order(1), order(1), order(2)
    assert a == b
    assert a != c
    assert sorted(a) == list(range(12))


def test_covers_all_samples():
    it = make_grain_loader(ToyDataset(8), batch_size=2, num_epochs=1)
    seen = []
    for imgs, _ in it:
        seen.extend(imgs[:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(8))


def test_grain_loader_epoch_interface():
    """GrainLoader matches the thread DataLoader contract cli.train uses:
    len(), set_epoch reshuffle, re-iterability within an epoch."""
    from cabinet_tpu.data.grain_loader import GrainLoader

    dl = GrainLoader(ToyDataset(10), batch_size=4, shuffle=True,
                     drop_last=True, num_workers=0, seed=3)
    assert len(dl) == 2

    def order():
        return [int(v) for imgs, _ in dl for v in imgs[:, 0, 0, 0]]

    dl.set_epoch(0)
    e0a, e0b = order(), order()
    assert e0a == e0b  # re-iterable, deterministic within an epoch
    dl.set_epoch(1)
    e1 = order()
    assert e0a != e1  # reshuffled across epochs
    assert len(e0a) == len(e1) == 8


def test_grain_loader_no_drop_last():
    from cabinet_tpu.data.grain_loader import GrainLoader

    dl = GrainLoader(ToyDataset(10), batch_size=4, num_workers=0)
    assert len(dl) == 3
    sizes = [imgs.shape[0] for imgs, _ in dl]
    assert sizes == [4, 4, 2]


def test_grain_loader_worker_processes():
    """One real grain worker process round-trips batches (the multiprocess
    path cli.train selects with runtime.loader=grain)."""
    from cabinet_tpu.data.grain_loader import GrainLoader

    dl = GrainLoader(ToyDataset(8), batch_size=4, num_workers=1, seed=0)
    seen = sorted(int(v) for imgs, _ in dl for v in imgs[:, 0, 0, 0])
    assert seen == list(range(8))


def test_explicit_shard_tuple_is_honored():
    """An explicit shard=(index, count) must partition the records like the
    thread DataLoader does — NOT silently fall back to grain's own
    jax.process_index() (which is 0 here, so a fallback would hand shard 1
    the full dataset)."""
    seen = {}
    for idx in (0, 1):
        it = make_grain_loader(ToyDataset(8), batch_size=2, num_epochs=1,
                               shard=(idx, 2))
        ids = []
        for imgs, _ in it:
            ids.extend(imgs[:, 0, 0, 0].astype(int).tolist())
        assert len(ids) == 4, ids  # equalized: 8 // 2 records per shard
        seen[idx] = set(ids)
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == set(range(8))
