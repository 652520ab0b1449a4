"""Native host-pipeline kernels (C, ctypes) with bit-equal numpy fallbacks.

Usage:
    from cabinet_tpu import native
    out = native.normalize_u8_f32(img_u8, mean, std)   # (H,W,3) f32
    out = native.normalize_u8_bf16(img_u8, mean, std)  # (H,W,3) bf16
    out = native.f32_to_bf16(arr_f32)                  # any shape, bf16
    ids = native.lut_remap_rgb(rgb_u8, lut_u8)         # (...,3) -> (...)

The shared object is compiled on first import (cc -O3 -fopenmp, cached next
to this file or under /tmp when the tree is read-only); set
CABINET_NO_NATIVE=1 to force the numpy paths. `native.HAVE_NATIVE` reports
which implementation is live. All functions produce BIT-IDENTICAL results in
either implementation (tests/unit/test_native.py), so correctness never
depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "fastops.c"

HAVE_NATIVE = False
_lib: Optional[ctypes.CDLL] = None


def _compile() -> Optional[Path]:
    candidates = [_HERE / "_fastops.so",
                  Path(tempfile.gettempdir()) / "cabinet_tpu_fastops.so"]
    for so in candidates:
        if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
            return so
    for cc in ("cc", "gcc", "clang"):
        for extra in (["-fopenmp"], []):
            for so in candidates:
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", *extra,
                         str(_SRC), "-o", str(so)],
                        check=True, capture_output=True, timeout=120)
                    return so
                except (OSError, subprocess.SubprocessError):
                    continue
    return None


def _load() -> None:
    global _lib, HAVE_NATIVE
    if os.environ.get("CABINET_NO_NATIVE") == "1":
        return
    so = _compile()
    if so is None:
        return
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:  # pragma: no cover - loader quirk
        return
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.normalize_u8_f32.argtypes = [u8p, f32p, ctypes.c_long, f32p, f32p]
    lib.f32_to_bf16.argtypes = [f32p, u16p, ctypes.c_long]
    lib.normalize_u8_bf16.argtypes = [u8p, u16p, ctypes.c_long, f32p, f32p]
    lib.lut_remap_rgb.argtypes = [u8p, u8p, u8p, ctypes.c_long]
    _lib = lib
    HAVE_NATIVE = True


_load()


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def _stats(mean, std):
    return (np.ascontiguousarray(mean, np.float32),
            np.ascontiguousarray(std, np.float32))


def normalize_u8_f32(img: np.ndarray, mean, std) -> np.ndarray:
    """uint8 (...,3) -> ((x/255) - mean) / std in float32, one fused pass."""
    m, s = _stats(mean, std)
    img = np.ascontiguousarray(img, np.uint8)
    if _lib is not None:
        out = np.empty(img.shape, np.float32)
        _lib.normalize_u8_f32(_u8p(img), _f32p(out), img.size // 3,
                              _f32p(m), _f32p(s))
        return out
    return (img.astype(np.float32) / 255.0 - m) / s


def f32_to_bf16(arr: np.ndarray) -> np.ndarray:
    """float32 -> bfloat16 (round-to-nearest-even), matching ml_dtypes."""
    import ml_dtypes

    arr = np.ascontiguousarray(arr, np.float32)
    if _lib is not None:
        out = np.empty(arr.shape, np.uint16)
        _lib.f32_to_bf16(_f32p(arr), _u16p(out), arr.size)
        return out.view(ml_dtypes.bfloat16)
    return arr.astype(ml_dtypes.bfloat16)


def normalize_u8_bf16(img: np.ndarray, mean, std) -> np.ndarray:
    """Fused uint8 -> normalized bfloat16 (the eval H2D transfer fast path)."""
    import ml_dtypes

    m, s = _stats(mean, std)
    img = np.ascontiguousarray(img, np.uint8)
    if _lib is not None:
        out = np.empty(img.shape, np.uint16)
        _lib.normalize_u8_bf16(_u8p(img), _u16p(out), img.size // 3,
                               _f32p(m), _f32p(s))
        return out.view(ml_dtypes.bfloat16)
    return ((img.astype(np.float32) / 255.0 - m) / s).astype(ml_dtypes.bfloat16)


def lut_remap_rgb(rgb: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """RGB uint8 (...,3) -> class IDs via a (256,256,256) uint8 LUT."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    assert lut.shape == (256, 256, 256)
    if _lib is not None:
        out = np.empty(rgb.shape[:-1], np.uint8)
        _lib.lut_remap_rgb(_u8p(rgb), _u8p(lut), _u8p(out), rgb.size // 3)
        return out
    return lut[rgb[..., 0], rgb[..., 1], rgb[..., 2]]
