"""DataLoader batching/shuffle/shard tests + class-weight formula tests."""

import numpy as np

from cabinet_tpu.data.class_weights import compute_class_weights, get_class_pixel_counts
from cabinet_tpu.data.loader import DataLoader


class ToyDataset:
    def __init__(self, n=10, shape=(4, 4)):
        self.n = n
        self.shape = shape

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((*self.shape, 3), i, np.float32)
        lb = np.full(self.shape, i % 3, np.int64)
        return img, lb


def test_loader_batches_and_shapes():
    dl = DataLoader(ToyDataset(10), batch_size=4, num_workers=2)
    batches = list(dl)
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    assert batches[0][0].shape == (4, 4, 4, 3)
    assert batches[0][1].dtype == np.int64


def test_loader_drop_last():
    dl = DataLoader(ToyDataset(10), batch_size=4, drop_last=True, num_workers=0)
    assert len(dl) == 2
    assert [b[0].shape[0] for b in list(dl)] == [4, 4]


def test_loader_shuffle_is_seeded_and_reshuffles():
    dl = DataLoader(ToyDataset(16), batch_size=16, shuffle=True, seed=1,
                    num_workers=0)
    first = list(dl)[0][0][:, 0, 0, 0].astype(int).tolist()
    # second epoch differs (epoch advanced internally)
    second = list(dl)[0][0][:, 0, 0, 0].astype(int).tolist()
    assert first != second
    assert sorted(first) == list(range(16))
    dl2 = DataLoader(ToyDataset(16), batch_size=16, shuffle=True, seed=1,
                     num_workers=0)
    again = list(dl2)[0][0][:, 0, 0, 0].astype(int).tolist()
    assert again == first  # same seed+epoch => same order


def test_loader_host_sharding_partitions_indices():
    ds = ToyDataset(12)
    seen = []
    for pid in range(3):
        dl = DataLoader(ds, batch_size=2, shard=(pid, 3), num_workers=0)
        for imgs, _ in dl:
            seen.extend(imgs[:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(12))


def test_loader_workers_preserve_order():
    a = [b[0][:, 0, 0, 0].astype(int).tolist()
         for b in DataLoader(ToyDataset(20), batch_size=3, num_workers=4)]
    b = [b[0][:, 0, 0, 0].astype(int).tolist()
         for b in DataLoader(ToyDataset(20), batch_size=3, num_workers=0)]
    assert a == b


def test_class_pixel_counts_and_cap():
    ds = ToyDataset(300, shape=(2, 2))
    counts = get_class_pixel_counts(ds, num_classes=3, max_samples=200)
    assert counts.sum() == 200 * 4  # sampling capped at 200 items


def test_enet_weight_formula():
    counts = np.array([100, 400, 500], np.int64)
    w = compute_class_weights(counts, cls_pw=1.0)
    p = counts / counts.sum()
    np.testing.assert_allclose(w, (1 / np.log(1.02 + p)), rtol=1e-6)
    # cls_pw=0.5 is the sqrt
    w2 = compute_class_weights(counts, cls_pw=0.5)
    np.testing.assert_allclose(w2, np.sqrt(w), rtol=1e-6)


def test_zero_cls_pw_uniform():
    w = compute_class_weights(np.array([1, 10, 100]), cls_pw=0.0)
    np.testing.assert_array_equal(w, np.ones(3, np.float32))


def test_ignore_label_excluded_from_counts():
    class WithIgnore(ToyDataset):
        def __getitem__(self, i):
            img, lb = super().__getitem__(i)
            lb = lb.copy()
            lb[0, 0] = 255
            return img, lb

    counts = get_class_pixel_counts(WithIgnore(4, shape=(2, 2)), num_classes=3,
                                    max_samples=4)
    assert counts.sum() == 4 * 3  # one pixel per sample ignored
