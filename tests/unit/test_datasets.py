"""Dataset loader tests over synthetic on-disk trees
(reference test_uavid_dataset.py analog)."""

import numpy as np
import pytest
from PIL import Image

from cabinet_tpu.core.exceptions import DatasetError
from cabinet_tpu.data.datasets import (
    DATASET_KWARGS_BUILDERS,
    DATASET_REGISTRY,
    AeroScapes,
    CityScapes,
    UAVid,
    VDD,
)


def test_registry_contents():
    assert set(DATASET_REGISTRY) == {"cityscapes", "uavid", "aeroscapes", "vdd"}
    assert set(DATASET_KWARGS_BUILDERS) == set(DATASET_REGISTRY)


def test_uavid_loads_pairs(fake_seg_tree):
    root = fake_seg_tree(splits=("train", "val"), n_images=3)
    ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="train")
    assert len(ds) == 3
    img, lb = ds[0]
    assert img.shape == (8, 8, 3) and img.dtype == np.float32
    assert lb.shape == (8, 8) and lb.dtype == np.int64


def test_val_mode_native_resolution(fake_seg_tree):
    root = fake_seg_tree(splits=("val",), n_images=2, size=(12, 10))
    ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="val")
    img, lb = ds[0]
    assert img.shape == (12, 10, 3)  # no crop/resize in val
    assert lb.shape == (12, 10)


def test_mask_values_passthrough(fake_seg_tree):
    root = fake_seg_tree(splits=("val",), n_images=1, num_classes=8)
    ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="val")
    _, lb = ds[0]
    assert set(np.unique(lb)) <= set(range(8))


def test_missing_mask_skipped_with_warning(fake_seg_tree, tmp_path):
    root = fake_seg_tree(splits=("train",), n_images=3)
    (root / "masks" / "train" / "seq1_0001.png").unlink()
    with pytest.warns(UserWarning):
        ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="train")
    assert len(ds) == 2


def test_empty_dataset_raises(tmp_path):
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "masks" / "train").mkdir(parents=True)
    with pytest.raises(DatasetError):
        UAVid(ignore_lb=255, rootpth=str(tmp_path), cropsize=(8, 8), mode="train")


def test_missing_root_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        UAVid(ignore_lb=255, rootpth=str(tmp_path / "nope"), cropsize=(8, 8))


def test_invalid_mode_raises(fake_seg_tree):
    root = fake_seg_tree(splits=("train",), n_images=1)
    with pytest.raises(ValueError):
        UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="trainval")


def test_aeroscapes_no_test_split(fake_seg_tree):
    root = fake_seg_tree(splits=("train",), n_images=1, img_ext=".jpg")
    with pytest.raises(DatasetError):
        AeroScapes(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="test")


def test_aeroscapes_jpg_and_norm(fake_seg_tree):
    root = fake_seg_tree(splits=("val",), n_images=1, img_ext=".jpg",
                         num_classes=12)
    ds = AeroScapes(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="val")
    img, _ = ds[0]
    assert img.dtype == np.float32


def test_vdd_has_test_split(fake_seg_tree):
    root = fake_seg_tree(splits=("test",), n_images=2, img_ext=".jpg",
                         num_classes=7)
    ds = VDD(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="test")
    assert len(ds) == 2


def test_augmentation_override_merges(fake_seg_tree):
    root = fake_seg_tree(splits=("train",), n_images=1)
    ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="train",
               augmentation={"mixup": 0.0, "degrees": 5.0})
    assert ds.mixup_p == 0.0
    assert ds.aug["degrees"] == 5.0
    assert ds.aug["fliplr"] == 0.5  # default preserved


def test_getitem_deterministic_per_epoch(fake_seg_tree):
    root = fake_seg_tree(splits=("train",), n_images=2, size=(32, 32))
    ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(16, 16), mode="train")
    a1, l1 = ds[0]
    a2, l2 = ds[0]
    np.testing.assert_array_equal(a1, a2)
    ds.set_epoch(1)
    b1, _ = ds[0]
    assert not np.array_equal(a1, b1)  # new epoch, new augmentation draw


def test_normalization_applied(fake_seg_tree):
    root = fake_seg_tree(splits=("val",), n_images=1)
    ds = UAVid(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="val")
    img, _ = ds[0]
    # normalized values leave [0,1]
    assert img.min() < 0 or img.max() > 1


def _make_cityscapes_tree(tmp_path):
    rng = np.random.default_rng(0)
    for city in ("aachen",):
        im_dir = tmp_path / "leftImg8bit" / "val" / city
        gt_dir = tmp_path / "gtFine" / "val" / city
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            raw_ids = rng.integers(0, 34, (16, 16), dtype=np.uint8)
            Image.fromarray(img).save(im_dir / f"{city}_{i:06d}_leftImg8bit.png")
            Image.fromarray(raw_ids).save(gt_dir / f"{city}_{i:06d}_gtFine_labelIds.png")
    return tmp_path


def test_cityscapes_lut_remap(tmp_path):
    root = _make_cityscapes_tree(tmp_path)
    ds = CityScapes(ignore_lb=255, rootpth=str(root), cropsize=(8, 8), mode="val")
    assert len(ds) == 2
    _, lb = ds[0]
    vals = set(np.unique(lb))
    assert vals <= set(range(19)) | {255}  # raw ids remapped to trainIds


def _make_cityscapes_train_tree(tmp_path):
    rng = np.random.default_rng(0)
    im_dir = tmp_path / "leftImg8bit" / "train" / "aachen"
    gt_dir = tmp_path / "gtFine" / "train" / "aachen"
    im_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    for i in range(2):
        img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
        raw_ids = rng.integers(0, 34, (16, 24), dtype=np.uint8)
        Image.fromarray(img).save(im_dir / f"aachen_{i:06d}_leftImg8bit.png")
        Image.fromarray(raw_ids).save(
            gt_dir / f"aachen_{i:06d}_gtFine_labelIds.png")
    return tmp_path


def test_cityscapes_device_geometric_canvas(tmp_path):
    """geometric='device': CityScapes ships a u8 canvas with trainId-
    remapped labels (the LUT runs on host; the street warp runs on chip)
    and exposes the street geometric params for the device sampler."""
    root = _make_cityscapes_train_tree(tmp_path)
    ds = CityScapes(ignore_lb=255, rootpth=str(root), cropsize=(8, 8),
                    mode="train", photometric="device", geometric="device")
    ci, cl, hw = ds[0]
    assert ci.dtype == np.uint8 and cl.dtype == np.uint8
    # the canvas must hold the NATIVE 16x24 resolution unresized (the host
    # street recipe never resizes — a 2*cropsize canvas would silently
    # downscale), so it is floored at the native longer side, 24
    assert ci.shape == (24, 24, 3) and cl.shape == (24, 24)
    h, w = int(hw[0]), int(hw[1])
    assert (h, w) == (16, 24)  # full native, no ResizeIfLarger reduction
    vals = set(np.unique(cl[:h, :w]))
    assert vals <= set(range(19)) | {255}  # trainIds, not raw ids
    assert (cl[h:, :] == 255).all()  # canvas padding ignore-filled
    assert ds.aug["scale_choices"] == CityScapes.SCALE_CHOICES
    assert ds.aug["degrees"] == 0.0 and ds.aug["translate"] == 0.0
    assert ds.RECIPE == "street"


def test_cityscapes_device_geometric_requires_device_photometric(tmp_path):
    root = _make_cityscapes_train_tree(tmp_path)
    with pytest.raises(ValueError, match="requires photometric"):
        CityScapes(ignore_lb=255, rootpth=str(root), cropsize=(8, 8),
                   mode="train", photometric="host", geometric="device")
