"""Decode backends (data/decode.py — the VERDICT r4 weak #6 lever).

The cv2 backend's whole contract is "bit-equal, just faster", so every
test here is an exact-equality gate against the PIL path the recipes are
specified in (reference transform.py decodes via PIL); reduced JPEG decode
is gated on geometry + the PIL-draft == cv2-REDUCED identity the probe
measured.
"""

import numpy as np
import pytest
from PIL import Image

from cabinet_tpu.data import decode


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("decode")
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    mask = rng.integers(0, 20, (96, 128), dtype=np.uint8)
    paths = {"rgb": rgb, "mask": mask}
    Image.fromarray(rgb).save(root / "img.png")
    Image.fromarray(mask, "L").save(root / "mask.png")
    Image.fromarray(rgb).save(root / "img.jpg", quality=92)
    # paletted mask: the cv2 path must refuse it (palette-expanded BGR)
    # and fall back to PIL's convert("L")
    pal = Image.fromarray(mask, "L").convert("P")
    pal.save(root / "mask_p.png")
    # big JPEG for the reduced path (256 longest side, reduce to <=128)
    big = rng.integers(0, 256, (192, 256, 3), dtype=np.uint8)
    Image.fromarray(big).save(root / "big.jpg", quality=92)
    return root, paths


def test_cv2_png_bit_equal(files):
    root, paths = files
    if not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    a = np.asarray(decode.open_rgb(str(root / "img.png"), "pil"))
    b = np.asarray(decode.open_rgb(str(root / "img.png"), "cv2"))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, paths["rgb"])


def test_cv2_jpeg_bit_equal(files):
    root, _ = files
    if not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    a = np.asarray(decode.open_rgb(str(root / "img.jpg"), "pil"))
    b = np.asarray(decode.open_rgb(str(root / "img.jpg"), "cv2"))
    np.testing.assert_array_equal(a, b)


def test_cv2_mask_bit_equal_and_palette_fallback(files):
    root, paths = files
    if not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    a = np.asarray(decode.open_mask(str(root / "mask.png"), "cv2"))
    np.testing.assert_array_equal(a, paths["mask"])
    # paletted file: both backends must agree (cv2 path falls back to PIL)
    p = np.asarray(decode.open_mask(str(root / "mask_p.png"), "pil"))
    c = np.asarray(decode.open_mask(str(root / "mask_p.png"), "cv2"))
    assert p.ndim == 2 and c.ndim == 2
    np.testing.assert_array_equal(p, c)


def test_reduce_factor_matches_box_reduce_floor():
    # r must never shrink past ceil(longest/max) (the box path's own k)
    assert decode._reduce_factor(3840, 2048) == 2  # k=ceil(1.875)=2
    assert decode._reduce_factor(2048, 2048) == 1  # at the cap: no-op
    assert decode._reduce_factor(4096, 1024) == 4
    assert decode._reduce_factor(4096, 256) == 8  # k=16 -> capped at 8
    assert decode._reduce_factor(512, 2048) == 1  # never upscale-side
    assert decode._reduce_factor(3000, 1024) == 2  # k=3 -> partial r=2


@pytest.mark.parametrize("backend", ["pil", "cv2"])
def test_reduced_jpeg_decode_halves(files, backend):
    root, _ = files
    if backend == "cv2" and not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    full = decode.open_rgb(str(root / "big.jpg"), backend)
    red = decode.open_rgb(str(root / "big.jpg"), backend, reduce_to=128)
    assert full.size == (256, 192)
    assert red.size == (128, 96)


def test_reduced_identical_across_backends(files):
    root, _ = files
    if not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    a = np.asarray(decode.open_rgb(str(root / "big.jpg"), "pil",
                                   reduce_to=128))
    b = np.asarray(decode.open_rgb(str(root / "big.jpg"), "cv2",
                                   reduce_to=128))
    np.testing.assert_array_equal(a, b)


def test_reduced_noop_on_png(files):
    root, paths = files
    out = decode.open_rgb(str(root / "img.png"), "pil", reduce_to=16)
    np.testing.assert_array_equal(np.asarray(out), paths["rgb"])


def test_check_decoder():
    assert decode.check_decoder("pil") == "pil"
    with pytest.raises(ValueError):
        decode.check_decoder("turbojpeg")


# --------------------------------------------------------------------------
# dataset-level: the knob changes nothing observable (host path) and keeps
# the canvas contract (device path, incl. the reduced label alignment)
# --------------------------------------------------------------------------


def _tree(root, size=(40, 56), fmt="png", n=2):
    rng = np.random.default_rng(7)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "masks" / split).mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
            mask = rng.integers(0, 8, size, dtype=np.uint8)
            Image.fromarray(img).save(
                root / "images" / split / f"s{i}.{fmt}")
            Image.fromarray(mask, "L").save(root / "masks" / split / f"s{i}.png")
    return root


def test_dataset_cv2_bit_equal_host_path(tmp_path):
    if not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    from cabinet_tpu.data.datasets import UAVid

    root = _tree(tmp_path)
    kw = dict(ignore_lb=255, rootpth=str(root), cropsize=[16, 16],
              mode="train", seed=3)
    a = UAVid(decoder="pil", **kw)
    b = UAVid(decoder="cv2", **kw)
    ia, la = a[0]
    ib, lb = b[0]
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(la, lb)


def test_dataset_cv2_bit_equal_canvas_path(tmp_path):
    if not decode.HAS_CV2:
        pytest.skip("no cv2 in this environment")
    from cabinet_tpu.data.datasets import UAVid

    root = _tree(tmp_path)
    kw = dict(ignore_lb=255, rootpth=str(root), cropsize=[16, 16],
              mode="train", seed=3, geometric="device", photometric="device")
    a = UAVid(decoder="pil", **kw)
    b = UAVid(decoder="cv2", **kw)
    for xa, xb in zip(a[0], b[0]):
        np.testing.assert_array_equal(xa, xb)


def test_dataset_reduced_decode_canvas_contract(tmp_path):
    """JPEG sources 2x over the canvas cap: the reduced path must produce
    a consistent (image, label, hw) canvas triple with the label NEAREST-
    aligned to the (DCT-downscaled) image geometry."""
    from cabinet_tpu.data.datasets import AeroScapes

    root = _tree(tmp_path, size=(96, 128), fmt="jpg")
    kw = dict(ignore_lb=255, rootpth=str(root), cropsize=[16, 16],
              mode="train", seed=3, geometric="device", photometric="device")
    base = AeroScapes(decoder="pil", **kw)  # canvas cap = 32 -> k=4 full path
    red = AeroScapes(decoder="pil", reduced_decode=True, **kw)
    ci, cl, hw = red[0]
    assert ci.shape == (red.canvas, red.canvas, 3)
    assert cl.shape == (red.canvas, red.canvas)
    h, w = int(hw[0]), int(hw[1])
    # k = ceil(128/32) = 4 is DCT-supported: identical landing geometry
    bh, bw = int(base[0][2][0]), int(base[0][2][1])
    assert (h, w) == (bh, bw)
    # outside the valid region stays ignore-filled
    assert (cl[h:] == 255).all() and (cl[:, w:] == 255).all()
    # both paths NEAREST-resize the same source mask to the same size
    # (ResizeIfLarger in base; the post-transform alignment in reduced),
    # so the label canvases are bit-equal even though the images differ
    # (DCT scaling vs box-reduce)
    np.testing.assert_array_equal(cl, base[0][1])


def test_reduced_decode_requires_device_geometric(tmp_path):
    from cabinet_tpu.data.datasets import UAVid

    root = _tree(tmp_path)
    with pytest.raises(ValueError, match="reduced_decode"):
        UAVid(ignore_lb=255, rootpth=str(root), cropsize=[16, 16],
              mode="train", seed=3, reduced_decode=True)


def test_decode_cache_roundtrip_and_invalidation(tmp_path):
    """The canvas path is deterministic, so the disk cache must be exact;
    the key must invalidate when the source file changes."""
    import os
    import time

    from cabinet_tpu.data.datasets import UAVid

    root = _tree(tmp_path / "data")
    cache = tmp_path / "cache"
    kw = dict(ignore_lb=255, rootpth=str(root), cropsize=[16, 16],
              mode="train", seed=3, geometric="device", photometric="device")
    plain = UAVid(**kw)
    cached = UAVid(decode_cache=str(cache), **kw)

    ref = plain[0]
    first = cached[0]
    files = list((cache / "uavid_train").glob("*.npz"))
    assert len(files) == 1  # miss -> wrote one shard
    warm = cached[0]  # hit
    for a, b, c in zip(ref, first, warm):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)

    # corrupt shard: served by recompute, then healed
    files[0].write_bytes(b"garbage")
    healed = cached[0]
    for a, b in zip(ref, healed):
        np.testing.assert_array_equal(a, b)

    # source change (mtime) -> new key -> fresh shard appears
    src = root / "images" / "train" / "s0.png"
    future = time.time() + 10
    os.utime(src, (future, future))
    cached[0]
    assert len(list((cache / "uavid_train").glob("*.npz"))) >= 2


def test_decode_cache_under_worker_loader(tmp_path):
    """The cache must be correct under the thread loader's concurrent
    workers (atomic rename; racing writers both produce the same bytes) and
    across the grain loader (which wraps the same __getitem__)."""
    from cabinet_tpu.data.datasets import UAVid
    from cabinet_tpu.data.loader import DataLoader

    root = _tree(tmp_path / "data", n=4)
    cache = tmp_path / "cache"
    kw = dict(ignore_lb=255, rootpth=str(root), cropsize=[16, 16],
              mode="train", seed=3, geometric="device", photometric="device")
    plain = UAVid(**kw)
    cached = UAVid(decode_cache=str(cache), **kw)

    dl = DataLoader(cached, batch_size=2, num_workers=3, shuffle=False)
    batches = [b for b in dl]
    assert len(list((cache / "uavid_train").glob("*.npz"))) == 4
    # second pass serves from cache; triples bit-equal to the plain path
    batches2 = [b for b in dl]
    for (ci, cl, hw), (ci2, cl2, hw2) in zip(batches, batches2):
        np.testing.assert_array_equal(ci, ci2)
        np.testing.assert_array_equal(cl, cl2)
        np.testing.assert_array_equal(hw, hw2)
    flat_i = np.concatenate([b[0] for b in batches])
    flat_l = np.concatenate([b[1] for b in batches])
    for i in range(4):
        pi, pl, _ = plain[i]
        np.testing.assert_array_equal(flat_i[i], pi)
        np.testing.assert_array_equal(flat_l[i], pl)


def test_decode_cache_keys_on_lut(tmp_path):
    """CityScapes cached canvases bake the id->trainId remap in: a
    different LUT (ignore_lb here) must produce a different cache key."""
    from cabinet_tpu.data.datasets import CityScapes

    rng = np.random.default_rng(11)
    root = tmp_path / "cs"
    (root / "leftImg8bit" / "train" / "cityA").mkdir(parents=True)
    (root / "gtFine" / "train" / "cityA").mkdir(parents=True)
    img = rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    ids = rng.integers(0, 34, (64, 128), dtype=np.uint8)
    Image.fromarray(img).save(
        root / "leftImg8bit" / "train" / "cityA" / "a_leftImg8bit.png")
    Image.fromarray(ids, "L").save(
        root / "gtFine" / "train" / "cityA" / "a_gtFine_labelIds.png")

    cache = tmp_path / "cache"
    kw = dict(rootpth=str(root), cropsize=[16, 16], mode="train",
              geometric="device", photometric="device",
              decode_cache=str(cache))
    a = CityScapes(ignore_lb=255, **kw)
    b = CityScapes(ignore_lb=250, **kw)
    assert a._cache_file(0).name != b._cache_file(0).name
    ca = a[0]
    cb = b[0]
    assert len(list((cache / "cityscapes_train").glob("*.npz"))) == 2
    # and each cached label actually used its own remap fill
    assert (ca[1] == 255).any() and (cb[1] == 250).any()
