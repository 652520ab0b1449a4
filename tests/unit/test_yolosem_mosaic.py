"""YOLO-sem model family + mosaic/copy-paste wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.data.mosaic import MosaicSegDataset
from cabinet_tpu.models.yolosem import build_yolosem


def test_variant_lookup_from_reference_names():
    for v in "nsmlx":
        m = build_yolosem(8, f"yolo26{v}-sem")
        assert m.variant == v
    with pytest.raises(ValueError):
        build_yolosem(8, "resnet50")


def test_forward_shapes_and_dual_output():
    m = build_yolosem(5, "yolo26n-sem")
    x = jnp.zeros((2, 64, 96, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out, aux = m.apply(variables, x)
    assert out.shape == (2, 64, 96, 5)
    assert aux.shape == (2, 64, 96, 5)


def test_train_mode_updates_batch_stats():
    m = build_yolosem(5, "yolo26n-sem")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


class ToySeg:
    def __init__(self, n=6, hw=(32, 32)):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((*self.hw, 3), float(i), np.float32)
        lbl = np.full(self.hw, i % 4, np.int64)
        return img, lbl


def test_mosaic_output_shape_preserved():
    ds = MosaicSegDataset(ToySeg(), mosaic=1.0, mixup=0.0, copy_paste=0.0)
    img, lbl = ds[0]
    assert img.shape == (32, 32, 3)
    assert lbl.shape == (32, 32)
    # mosaic mixes multiple source images
    assert len(np.unique(img[..., 0])) > 1


def test_mosaic_disabled_passthrough():
    ds = MosaicSegDataset(ToySeg(), mosaic=1.0, mixup=0.0, copy_paste=0.0)
    ds.set_mosaic(False)
    img, lbl = ds[2]
    np.testing.assert_array_equal(img, np.full((32, 32, 3), 2.0))
    np.testing.assert_array_equal(lbl, np.full((32, 32), 2))


def test_copy_paste_brings_partner_classes():
    base = ToySeg()
    ds = MosaicSegDataset(base, mosaic=0.0, mixup=0.0, copy_paste=1.0)
    changed = False
    for idx in range(6):
        _, lbl = ds[idx]
        _, orig = base[idx]
        if not np.array_equal(lbl, orig):
            changed = True
            break
    assert changed  # some sample received pasted pixels of another class


def test_mixup_hard_label():
    ds = MosaicSegDataset(ToySeg(), mosaic=0.0, mixup=1.0, copy_paste=0.0)
    img, lbl = ds[1]
    # blended image values strictly between two integers
    assert not np.all(img == np.round(img)) or len(np.unique(lbl)) == 1
    assert lbl.dtype == np.int64


def test_deterministic_per_epoch():
    ds = MosaicSegDataset(ToySeg(), mosaic=1.0)
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a[0], b[0])
    ds.set_epoch(3)
    c = ds[0]
    assert not np.array_equal(a[0], c[0])
