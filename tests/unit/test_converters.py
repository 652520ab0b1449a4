"""Converter tests (reference test_*_yolo_convert.py analogs): LUT values,
unknown-colour->255, round-trip, dry-run writes nothing, validation."""

import numpy as np
from PIL import Image

from cabinet_tpu.data.converters import (
    build_colour_map,
    build_rgb_lut,
    convert_aeroscapes,
    convert_rgb_mask,
    convert_uavid,
    convert_vdd,
    validate_id_mask,
)
from cabinet_tpu.data.palettes import UAVID_CLASSES


def test_colour_map_ordered_by_trainid():
    cmap = build_colour_map(UAVID_CLASSES)
    assert cmap[(0, 0, 0)] == 0          # Clutter
    assert cmap[(128, 0, 0)] == 1        # Building
    assert cmap[(64, 0, 128)] == 7       # Moving Car
    assert len(cmap) == 8


def test_lut_unknown_colour_maps_to_255():
    lut = build_rgb_lut(build_colour_map(UAVID_CLASSES))
    assert lut[1, 2, 3] == 255
    assert lut[128, 0, 0] == 1


def test_rgb_mask_roundtrip_all_classes(tmp_path):
    lut = build_rgb_lut(build_colour_map(UAVID_CLASSES))
    colors = np.array([c["color"] for c in UAVID_CLASSES], np.uint8)
    rgb = colors[np.arange(8) % 8].reshape(2, 4, 3)
    src = tmp_path / "mask.png"
    Image.fromarray(rgb).save(src)
    dst = tmp_path / "out.png"
    convert_rgb_mask(src, dst, lut)
    out = np.asarray(Image.open(dst))
    np.testing.assert_array_equal(out.reshape(-1), np.arange(8) % 8)
    assert Image.open(dst).mode == "L"


def _make_uavid_raw(tmp_path, splits=("train",), seqs=("seq1", "seq2"), n=2):
    colors = np.array([c["color"] for c in UAVID_CLASSES], np.uint8)
    rng = np.random.default_rng(0)
    for split in splits:
        for seq in seqs:
            (tmp_path / split / seq / "Images").mkdir(parents=True)
            (tmp_path / split / seq / "Labels").mkdir(parents=True)
            for i in range(n):
                img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                ids = rng.integers(0, 8, (8, 8))
                Image.fromarray(img).save(
                    tmp_path / split / seq / "Images" / f"{i:06d}.png")
                Image.fromarray(colors[ids]).save(
                    tmp_path / split / seq / "Labels" / f"{i:06d}.png")
    return tmp_path


def test_convert_uavid_end_to_end(tmp_path):
    src = _make_uavid_raw(tmp_path / "raw")
    dst = tmp_path / "out"
    n = convert_uavid(src, dst, UAVID_CLASSES, workers=1)
    assert n == 4
    imgs = sorted((dst / "images" / "train").iterdir())
    masks = sorted((dst / "masks" / "train").iterdir())
    assert [p.name for p in imgs] == ["seq1_000000.png", "seq1_000001.png",
                                      "seq2_000000.png", "seq2_000001.png"]
    assert [p.name for p in masks] == [p.name for p in imgs]
    assert imgs[0].is_symlink()
    vals = np.unique(np.asarray(Image.open(masks[0])))
    assert set(vals.tolist()) <= set(range(8))


def test_convert_uavid_dry_run_writes_nothing(tmp_path):
    src = _make_uavid_raw(tmp_path / "raw")
    dst = tmp_path / "out"
    n = convert_uavid(src, dst, UAVID_CLASSES, workers=1, dry_run=True)
    assert n == 4
    assert not dst.exists()


def test_convert_uavid_copy_images(tmp_path):
    src = _make_uavid_raw(tmp_path / "raw", seqs=("seq1",), n=1)
    dst = tmp_path / "out"
    convert_uavid(src, dst, UAVID_CLASSES, workers=1, copy_images=True)
    img = next((dst / "images" / "train").iterdir())
    assert not img.is_symlink()


def test_convert_uavid_missing_label_skipped(tmp_path, capsys):
    src = _make_uavid_raw(tmp_path / "raw", seqs=("seq1",), n=2)
    (src / "train" / "seq1" / "Labels" / "000001.png").unlink()
    n = convert_uavid(src, tmp_path / "out", UAVID_CLASSES, workers=1)
    assert n == 1
    assert "skipping" in capsys.readouterr().out


def _make_aeroscapes_raw(tmp_path, n=3, bad_pixel=False):
    rng = np.random.default_rng(0)
    (tmp_path / "JPEGImages").mkdir(parents=True)
    (tmp_path / "SegmentationClass").mkdir()
    (tmp_path / "ImageSets").mkdir()
    stems = [f"im{i}" for i in range(n)]
    for i, stem in enumerate(stems):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            tmp_path / "JPEGImages" / f"{stem}.jpg")
        ids = rng.integers(0, 12, (8, 8)).astype(np.uint8)
        if bad_pixel and i == 0:
            ids[0, 0] = 77
        Image.fromarray(ids, mode="L").save(
            tmp_path / "SegmentationClass" / f"{stem}.png")
    (tmp_path / "ImageSets" / "trn.txt").write_text("\n".join(stems[:-1]))
    (tmp_path / "ImageSets" / "val.txt").write_text(stems[-1])
    return tmp_path


def test_convert_aeroscapes_copies_by_split(tmp_path):
    src = _make_aeroscapes_raw(tmp_path / "raw")
    dst = tmp_path / "out"
    n = convert_aeroscapes(src, dst)
    assert n == 3
    assert len(list((dst / "images" / "train").iterdir())) == 2
    assert len(list((dst / "images" / "val").iterdir())) == 1
    assert not next((dst / "images" / "train").iterdir()).is_symlink()
    assert not (dst / "images" / "test").exists()


def test_convert_aeroscapes_invalid_mask_skipped(tmp_path, capsys):
    src = _make_aeroscapes_raw(tmp_path / "raw", bad_pixel=True)
    n = convert_aeroscapes(src, tmp_path / "out")
    assert n == 2
    assert "invalid pixel values" in capsys.readouterr().out


def _make_vdd_raw(tmp_path, splits=("train", "val", "test"), n=2):
    rng = np.random.default_rng(0)
    for split in splits:
        (tmp_path / split / "src").mkdir(parents=True)
        (tmp_path / split / "gt").mkdir()
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
                tmp_path / split / "src" / f"{i:03d}.JPG")
            Image.fromarray(rng.integers(0, 7, (8, 8)).astype(np.uint8),
                            mode="L").save(tmp_path / split / "gt" / f"{i:03d}.png")
    return tmp_path


def test_convert_vdd_symlinks_and_renames(tmp_path):
    src = _make_vdd_raw(tmp_path / "raw")
    dst = tmp_path / "out"
    n = convert_vdd(src, dst)
    assert n == 6
    imgs = sorted((dst / "images" / "train").iterdir())
    assert [p.suffix for p in imgs] == [".jpg", ".jpg"]  # .JPG -> .jpg
    assert imgs[0].is_symlink()
    assert (dst / "masks" / "test").exists()


def test_validate_id_mask(tmp_path):
    good = tmp_path / "good.png"
    Image.fromarray(np.array([[0, 6], [255, 3]], np.uint8), mode="L").save(good)
    ok, _ = validate_id_mask(good, 7)
    assert ok
    bad = tmp_path / "bad.png"
    Image.fromarray(np.array([[0, 9]], np.uint8), mode="L").save(bad)
    ok, msg = validate_id_mask(bad, 7)
    assert not ok and "9" in msg
