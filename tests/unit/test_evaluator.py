"""Sliding-window evaluator invariants (reference
test_training_pipeline.py:256-338 "ConstantModel" pattern + histogram oracle)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.eval.evaluator import MscEval, tile_grid
from cabinet_tpu.eval.metrics import confusion_matrix, metrics_from_hist

N_CLASSES = 4


def constant_apply(variables, images, train=False):
    """Fake backend: fixed logits favouring class 2 everywhere."""
    B, H, W, _ = images.shape
    logits = jnp.zeros((B, H, W, N_CLASSES))
    logits = logits.at[..., 2].set(5.0)
    return logits, logits


def checkerboard_apply(variables, images, train=False):
    """Predicts class = parity of (mean intensity > 0)."""
    B, H, W, _ = images.shape
    m = (images.mean(axis=-1) > 0).astype(jnp.float32)
    logits = jnp.stack([1 - m, m] + [jnp.zeros_like(m)] * (N_CLASSES - 2), axis=-1)
    return logits * 5.0, logits


def test_tile_grid_matches_reference_formula():
    crop, H, W = 64, 200, 150
    stride = int(crop * 5 / 6.0)
    n_y = math.ceil((H - crop) / stride) + 1
    n_x = math.ceil((W - crop) / stride) + 1
    grid = tile_grid(H, W, crop)
    assert grid.shape == (n_y * n_x, 2)
    # edge tiles snapped so every tile is exactly crop-sized
    ys = sorted(set(grid[:, 0].tolist()))
    assert ys[0] == 0 and ys[-1] == H - crop
    want = []
    for iy in range(n_y):
        y_end = min(H, stride * iy + crop)
        want.append(y_end - crop)
    assert ys == sorted(set(want))


def test_constant_model_uniform_prediction_no_edge_bias():
    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=32)
    images = np.random.default_rng(0).normal(size=(1, 80, 56, 3)).astype(np.float32)
    labels = np.full((1, 80, 56), 2, np.int64)
    preds, hist = ev.evaluate_batch({}, images, labels)
    assert (preds == 2).all()  # overlap normalization leaves argmax intact
    assert hist[2, 2] == 80 * 56


def test_image_smaller_than_crop_padded_and_unpadded():
    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=64)
    images = np.zeros((2, 20, 30, 3), np.float32)
    labels = np.full((2, 20, 30), 2, np.int64)
    preds, hist = ev.evaluate_batch({}, images, labels)
    assert preds.shape == (2, 20, 30)
    assert (preds == 2).all()
    assert hist.sum() == 2 * 20 * 30


def test_multi_scale_and_flip_consistent():
    ev = MscEval(constant_apply, N_CLASSES, scales=(0.5, 1.0, 1.5), flip=True,
                 cropsize=32)
    images = np.zeros((1, 48, 48, 3), np.float32)
    labels = np.full((1, 48, 48), 2, np.int64)
    preds, _ = ev.evaluate_batch({}, images, labels)
    assert (preds == 2).all()


def test_content_dependent_model_preserved_through_tiling():
    # Model output depends on input content; tiling+normalization must not
    # corrupt interior predictions.
    ev = MscEval(checkerboard_apply, N_CLASSES, scales=(1.0,), cropsize=32)
    rng = np.random.default_rng(1)
    images = np.where(rng.random((1, 64, 40, 3)) > 0.5, 1.0, -1.0).astype(np.float32)
    labels = np.zeros((1, 64, 40), np.int64)
    preds, _ = ev.evaluate_batch({}, images, labels)
    want = (images.mean(axis=-1) > 0).astype(np.int32)
    np.testing.assert_array_equal(preds, want)


def test_confusion_matrix_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    pred = rng.integers(0, N_CLASSES, (33, 17))
    label = rng.integers(0, N_CLASSES, (33, 17))
    label[0, :5] = 255
    pred[1, :3] = 99  # out of range -> clipped

    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label),
                                      N_CLASSES, 255))

    valid = label != 255
    p = np.clip(pred[valid], 0, N_CLASSES - 1)
    lb = np.clip(label[valid], 0, N_CLASSES - 1)
    want = np.bincount(p * N_CLASSES + lb,
                       minlength=N_CLASSES ** 2).reshape(N_CLASSES, N_CLASSES)
    np.testing.assert_array_equal(got, want)


def test_metrics_from_hist():
    hist = np.array([[10, 2], [3, 20]], np.float64)
    m = metrics_from_hist(hist)
    iou0 = 10 / (13 + 12 - 10)
    iou1 = 20 / (22 + 23 - 20)
    np.testing.assert_allclose(m["mIoU"], (iou0 + iou1) / 2, rtol=1e-6)
    np.testing.assert_allclose(m["accuracy"], 30 / 35, rtol=1e-6)
    assert set(m["iou_per_class"]) == {"class_0", "class_1"}


def test_full_evaluate_over_loader():
    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=32)

    def loader():
        for _ in range(3):
            yield (np.zeros((1, 40, 40, 3), np.float32),
                   np.full((1, 40, 40), 2, np.int64))

    res = ev.evaluate({}, loader())
    # absent classes get IoU 0/(0+1e-8)=0 (not NaN) per the reference formula,
    # so mIoU over 4 classes with one perfect class is 0.25.
    assert res["mIoU"] == pytest.approx(0.25)
    assert res["accuracy"] == pytest.approx(1.0)
    assert res["iou_per_class"]["class_2"] == pytest.approx(1.0)


def test_evaluate_propagates_loader_exceptions():
    """The one-ahead staging worker must surface loader exceptions to the
    caller, not swallow them into a truncated (wrong) metric."""
    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=32)

    def broken_loader():
        yield (np.zeros((1, 40, 40, 3), np.float32),
               np.full((1, 40, 40), 2, np.int64))
        raise RuntimeError("disk went away")

    with pytest.raises(RuntimeError, match="disk went away"):
        ev.evaluate({}, broken_loader())


def test_evaluate_mixed_resolutions_over_loader():
    """The staged pipeline keys programs off each staged batch's own shape
    (variable-resolution loaders compile one program per bucket)."""
    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=32)

    def loader():
        yield (np.zeros((1, 40, 40, 3), np.float32),
               np.full((1, 40, 40), 2, np.int64))
        yield (np.zeros((1, 56, 48, 3), np.float32),
               np.full((1, 56, 48), 2, np.int64))

    res = ev.evaluate({}, loader())
    assert res["accuracy"] == pytest.approx(1.0)


def test_pad_to_bucket_one_program_and_clean_hist():
    """Resolution bucketing (SURVEY §7.3): two native resolutions share ONE
    compiled program; padded pixels never reach the histogram; returned
    predictions are cropped back to native."""
    ev = MscEval(checkerboard_apply, N_CLASSES, scales=(1.0,), cropsize=32,
                 pad_to=(48, 64))
    rng = np.random.default_rng(0)
    for (h, w) in ((48, 64), (40, 56)):
        images = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        labels = (images.mean(axis=-1) > 0).astype(np.int64)
        preds, hist = ev.evaluate_batch({}, images, labels)
        assert preds.shape == (1, h, w)
        assert hist.sum() == h * w  # ignore-filled padding excluded
        np.testing.assert_array_equal(preds, labels)  # content unaffected
    assert len(ev._progs) == 1  # both resolutions hit one shape bucket


def test_pad_to_bucket_rejects_oversize():
    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=16,
                 pad_to=(32, 32))
    with pytest.raises(ValueError, match="exceeds"):
        ev.hist_batch({}, np.zeros((1, 40, 32, 3), np.float32),
                      np.zeros((1, 40, 32), np.int64))


def test_pad_to_bucket_skips_far_smaller_images():
    """Images below half the bucket evaluate natively (the bucket targets
    near-bucket resolutions like UAVid's 3840-vs-4096; padding a tiny test
    crop into a 4K canvas would waste >4x compute)."""
    ev = MscEval(checkerboard_apply, N_CLASSES, scales=(1.0,), cropsize=8,
                 pad_to=(2160, 4096))
    images = np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32)
    labels = (images.mean(axis=-1) > 0).astype(np.int64)
    preds, hist = ev.evaluate_batch({}, images, labels)
    assert preds.shape == (1, 16, 16)
    assert (1, 16, 16) in ev._progs  # compiled at native size, not the bucket


def _rand_apply_model():
    """Tiny real-ish apply: logits depend linearly on a fixed random proj."""
    rng = np.random.default_rng(3)
    Wm = jnp.asarray(rng.normal(size=(3, N_CLASSES)).astype(np.float32))

    def apply(variables, images, train=False):
        logits = images @ Wm * 3.0
        return logits, logits

    return apply


def test_tile_batch_is_bit_identical():
    """Folding more tiles per forward changes batching, not math."""
    apply = _rand_apply_model()
    rng = np.random.default_rng(5)
    img = rng.normal(size=(1, 80, 96, 3)).astype(np.float32)
    lbl = rng.integers(0, N_CLASSES, (1, 80, 96)).astype(np.int64)
    outs = []
    for tb in (1, 16, 64):
        ev = MscEval(apply, N_CLASSES, scales=(0.5, 1.0), flip=True,
                     cropsize=32, tile_batch=tb)
        preds, hist = ev.evaluate_batch({}, img, lbl)
        outs.append((preds, hist))
    for preds, hist in outs[1:]:
        np.testing.assert_array_equal(preds, outs[0][0])
        np.testing.assert_array_equal(hist, outs[0][1])


def test_cross_scale_fold_matches_per_scale_composition():
    """The folded multi-scale path (_summed_probs_folded — one global chip
    list spanning all scales, uniform forward batches) must reproduce the
    per-scale _scale_probs sum bit-for-bit in f32: same chips, same
    per-scale accumulation order, only forward batch composition differs."""
    import jax

    from cabinet_tpu.eval.evaluator import _scale_probs

    apply = _rand_apply_model()
    rng = np.random.default_rng(7)
    img = rng.normal(size=(1, 70, 90, 3)).astype(np.float32)
    scales = (0.5, 0.75, 1.0, 1.5)

    ev = MscEval(apply, N_CLASSES, scales=scales, flip=True, cropsize=32,
                 tile_batch=16)
    folded = ev.prob_batch({}, img)

    @jax.jit
    def per_scale(image):
        total = jnp.zeros((1, 70, 90, N_CLASSES), jnp.float32)
        for s in scales:
            total = total + _scale_probs(apply, N_CLASSES, 32, True, s, {},
                                         image, None, 16)
        return total

    np.testing.assert_array_equal(folded, np.asarray(per_scale(jnp.asarray(img))))


def test_bf16_accumulation_tracks_f32():
    """acc_dtype=bf16 (the TPU serving default under bf16 compute) predicts
    within tolerance of the exact f32 chain."""
    apply = _rand_apply_model()
    rng = np.random.default_rng(6)
    img = rng.normal(size=(1, 80, 96, 3)).astype(np.float32)
    lbl = rng.integers(0, N_CLASSES, (1, 80, 96)).astype(np.int64)
    ev32 = MscEval(apply, N_CLASSES, scales=(0.5, 1.0), flip=True, cropsize=32)
    ev16 = MscEval(apply, N_CLASSES, scales=(0.5, 1.0), flip=True, cropsize=32,
                   acc_dtype=jnp.bfloat16)
    assert ev32.acc_dtype == jnp.float32  # f32 compute keeps the exact chain
    p32, _ = ev32.evaluate_batch({}, img, lbl)
    p16, _ = ev16.evaluate_batch({}, img, lbl)
    agree = float(np.mean(p32 == p16))
    assert agree > 0.99, f"bf16 accumulation agreement {agree}"


def test_acc_dtype_auto_follows_compute_dtype():
    ev = MscEval(constant_apply, N_CLASSES, compute_dtype=jnp.bfloat16)
    assert ev.acc_dtype == jnp.bfloat16
    ev = MscEval(constant_apply, N_CLASSES, compute_dtype=jnp.bfloat16,
                 acc_dtype=jnp.float32)
    assert ev.acc_dtype == jnp.float32


def test_assemble_scale_matches_scatter_oracle():
    """`_assemble_scale` (write-once concat dataflow) must reproduce the
    reference's scatter-accumulate-then-divide (evaluate.py:216-221)
    BIT-EXACTLY, including spans covered by 3 tiles per axis (a snapped
    last tile can overlap the previous two: crop 32, stride 26, full 60
    gives starts [0, 26, 28])."""
    from cabinet_tpu.eval.evaluator import (_assemble_scale, _tile_starts)

    crop, stride = 32, 26
    for full_h, full_w in [(60, 59), (32, 90), (44, 44)]:
        ys = [int(v) for v in _tile_starts(full_h, crop, stride)]
        xs = [int(v) for v in _tile_starts(full_w, crop, stride)]
        rng = np.random.default_rng(3)
        tiles = [rng.normal(size=(2, crop, crop, 3)).astype(np.float32)
                 for _ in range(len(ys) * len(xs))]

        prob = np.zeros((2, full_h, full_w, 3), np.float32)
        count = np.zeros((full_h, full_w), np.float32)
        k = 0
        for y in ys:
            for x in xs:
                prob[:, y:y + crop, x:x + crop, :] += tiles[k]
                count[y:y + crop, x:x + crop] += 1.0
                k += 1
        oracle = prob / np.maximum(count, 1.0)[None, :, :, None]

        got = np.asarray(_assemble_scale(
            [jnp.asarray(t) for t in tiles], ys, xs, crop, full_h, full_w))
        assert got.shape == oracle.shape
        assert np.array_equal(got, oracle), (full_h, full_w,
                                             np.abs(got - oracle).max())


def test_evaluate_consumer_failure_releases_staging_worker():
    """If the consumer side of evaluate() raises (e.g. a compile failure on
    a new resolution), the one-ahead staging worker must not stay blocked
    forever on the full queue holding staged device batches."""
    import threading
    import time as _time

    ev = MscEval(constant_apply, N_CLASSES, scales=(1.0,), cropsize=16)

    def boom(B, H, W):
        raise RuntimeError("synthetic compile failure")

    ev._program = boom  # consumer-side failure on the first batch
    batches = [(np.zeros((1, 16, 16, 3), np.float32),
                np.zeros((1, 16, 16), np.int64)) for _ in range(6)]

    before = set(threading.enumerate())
    with pytest.raises(RuntimeError, match="synthetic compile failure"):
        ev.evaluate({}, iter(batches))
    deadline = _time.monotonic() + 5.0
    while _time.monotonic() < deadline:
        extra = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not extra:
            break
        _time.sleep(0.05)
    assert not extra, f"staging worker leaked: {extra}"
