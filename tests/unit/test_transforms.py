"""Transform invariants (reference test_transforms.py analog): output sizes,
label ignore-fill, nearest-for-labels, photometric formulas."""

import numpy as np
from PIL import Image

from cabinet_tpu.data import transforms as T


def make_sample(w=32, h=24, n_classes=5):
    rng = np.random.default_rng(0)
    im = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    lb = Image.fromarray(rng.integers(0, n_classes, (h, w), dtype=np.uint8))
    return {"image": im, "label": lb}


RNG = lambda s=0: np.random.default_rng(s)


def test_resize_if_larger_caps_long_side():
    s = make_sample(w=100, h=50)
    out = T.ResizeIfLarger(40)(s, RNG())
    assert max(out["image"].size) == 40
    assert out["image"].size == out["label"].size
    # no-op when already small
    s2 = make_sample(w=30, h=20)
    out2 = T.ResizeIfLarger(40)(s2, RNG())
    assert out2["image"].size == (30, 20)


def test_random_scale_discrete_and_continuous():
    s = make_sample(w=40, h=20)
    out = T.RandomScale((2.0,))(s, RNG())
    assert out["image"].size == (80, 40)
    out2 = T.RandomScale((0.5, 1.5), continuous=True)(s, RNG(1))
    w, h = out2["image"].size
    assert 20 <= w <= 60 and 10 <= h <= 30
    assert out2["label"].size == out2["image"].size


def test_flips_move_pixels_consistently():
    s = make_sample()
    out = T.RandomHorizontalFlip(p=1.1)(s, RNG())
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.asarray(s["image"])[:, ::-1])
    np.testing.assert_array_equal(np.asarray(out["label"]),
                                  np.asarray(s["label"])[:, ::-1])
    out = T.RandomVerticalFlip(p=1.1)(s, RNG())
    np.testing.assert_array_equal(np.asarray(out["label"]),
                                  np.asarray(s["label"])[::-1])


def test_translate_fills_label_with_ignore():
    s = make_sample(w=20, h=20)
    out = T.RandomTranslate(translate=0.5, ignore_label=255)(s, RNG(3))
    lb = np.asarray(out["label"])
    assert out["image"].size == (20, 20)
    assert (lb == 255).any()


def test_rotate_expands_and_fills_ignore():
    s = make_sample(w=20, h=20)
    out = T.RandomRotate(degrees=(30, 30), ignore_label=255)(s, RNG())
    assert out["image"].size[0] > 20  # expand=True
    assert (np.asarray(out["label"]) == 255).any()
    # labels stay in the original value set + ignore (nearest interp)
    vals = set(np.unique(np.asarray(out["label"])))
    assert vals <= set(range(5)) | {255}


def test_random_crop_exact_size_and_pad_semantics():
    s = make_sample(w=10, h=8)
    out = T.RandomCrop((16, 16), ignore_label=255)(s, RNG())
    assert out["image"].size == (16, 16)
    lb = np.asarray(out["label"])
    assert (lb == 255).any()  # padded region got ignore
    # larger input: crop window inside
    s2 = make_sample(w=64, h=64)
    out2 = T.RandomCrop((16, 16))(s2, RNG(5))
    assert out2["image"].size == (16, 16)
    assert not (np.asarray(out2["label"]) == 255).any()


def test_cutout_zeroes_square():
    s = make_sample(w=32, h=32)
    out = T.RandomCutout(p=1.1, size=8)(s, RNG(2))
    im = np.asarray(out["image"])
    assert (im.reshape(-1, 3).sum(1) == 0).sum() >= 64
    np.testing.assert_array_equal(np.asarray(out["label"]),
                                  np.asarray(s["label"]))


def test_gamma_formula():
    s = make_sample()
    out = T.RandomGamma(gamma_range=(2.0, 2.0), p=1.1)(s, RNG())
    want = (np.clip((np.asarray(s["image"]) / 255.0) ** 2.0, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(out["image"]), want)


def test_grayscale_equal_channels():
    s = make_sample()
    out = T.RandomGrayscale(p=1.1)(s, RNG())
    arr = np.asarray(out["image"])
    assert (arr[..., 0] == arr[..., 1]).all() and (arr[..., 1] == arr[..., 2]).all()


def test_hsv_label_untouched_and_in_range():
    s = make_sample()
    out = T.RandomHSV(0.5, 0.5, 0.5)(s, RNG(7))
    assert out["label"] is s["label"]
    assert np.asarray(out["image"]).dtype == np.uint8


def test_noise_changes_image_only():
    s = make_sample()
    out = T.RandomNoise(sigma=0.1, p=1.1)(s, RNG(4))
    assert not np.array_equal(np.asarray(out["image"]), np.asarray(s["image"]))
    np.testing.assert_array_equal(np.asarray(out["label"]), np.asarray(s["label"]))


def test_compose_runs_all():
    s = make_sample(w=40, h=40)
    pipe = T.Compose([T.RandomHorizontalFlip(1.1), T.RandomCrop((16, 16))])
    out = pipe(s, RNG())
    assert out["image"].size == (16, 16)


def test_determinism_same_rng_seed():
    pipe = T.Compose([T.RandomRotate((-10, 10)), T.RandomCrop((16, 16)),
                      T.RandomNoise(p=0.5)])
    a = pipe(make_sample(w=40, h=40), RNG(11))
    b = pipe(make_sample(w=40, h=40), RNG(11))
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    np.testing.assert_array_equal(np.asarray(a["label"]), np.asarray(b["label"]))
