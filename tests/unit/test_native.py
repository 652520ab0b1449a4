"""Native host-pipeline kernels: bit-equality with the numpy fallbacks
(the parity contract that makes the C path safe to enable by default)."""

import numpy as np
import pytest

from cabinet_tpu import native

MEAN = (0.480, 0.499, 0.457)
STD = (0.225, 0.208, 0.228)


@pytest.fixture
def img():
    return np.random.default_rng(0).integers(0, 256, (37, 53, 3), np.uint8)


def test_native_compiled():
    """The image ships a C toolchain; the native path must actually build
    (delete this expectation if the target image drops cc)."""
    assert native.HAVE_NATIVE


def test_normalize_u8_f32_matches_numpy(img):
    want = (img.astype(np.float32) / 255.0
            - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)
    got = native.normalize_u8_f32(img, MEAN, STD)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)  # bit-equal, not approx


def test_f32_to_bf16_matches_ml_dtypes():
    import ml_dtypes

    rng = np.random.default_rng(1)
    # cover rounding ties, subnormals, negatives, inf, nan
    arr = np.concatenate([
        rng.normal(0, 1, 4096).astype(np.float32),
        np.asarray([0.0, -0.0, np.inf, -np.inf, np.nan,
                    1.0039062, 1.0039063, 3.0e-39], np.float32),
    ])
    got = native.f32_to_bf16(arr)
    want = arr.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16) & 0x7fbf,
                                  want.view(np.uint16) & 0x7fbf)
    np.testing.assert_array_equal(np.isnan(got.astype(np.float32)),
                                  np.isnan(want.astype(np.float32)))
    finite = np.isfinite(arr)
    np.testing.assert_array_equal(got[finite].view(np.uint16),
                                  want[finite].view(np.uint16))


def test_normalize_u8_bf16_is_fused_equivalent(img):
    import ml_dtypes

    want = ((img.astype(np.float32) / 255.0
             - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)
            ).astype(ml_dtypes.bfloat16)
    got = native.normalize_u8_bf16(img, MEAN, STD)
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))


def test_lut_remap_matches_fancy_indexing(img):
    rng = np.random.default_rng(2)
    lut = rng.integers(0, 9, (256, 256, 256), np.uint8)
    want = lut[img[..., 0], img[..., 1], img[..., 2]]
    got = native.lut_remap_rgb(img, lut)
    np.testing.assert_array_equal(got, want)


def test_numpy_fallback_paths(img, monkeypatch):
    """With the library disabled, every function returns the same bits."""
    ref = {
        "norm": native.normalize_u8_f32(img, MEAN, STD),
        "bf16": native.normalize_u8_bf16(img, MEAN, STD),
        "lut": native.lut_remap_rgb(
            img, np.zeros((256, 256, 256), np.uint8)),
    }
    monkeypatch.setattr(native, "_lib", None)
    np.testing.assert_array_equal(
        native.normalize_u8_f32(img, MEAN, STD), ref["norm"])
    np.testing.assert_array_equal(
        native.normalize_u8_bf16(img, MEAN, STD).view(np.uint16),
        ref["bf16"].view(np.uint16))
    np.testing.assert_array_equal(
        native.lut_remap_rgb(img, np.zeros((256, 256, 256), np.uint8)),
        ref["lut"])
