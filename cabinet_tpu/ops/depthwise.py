"""Shift-based depthwise convolution (TPU-optimized).

XLA's native lowering of `conv_general_dilated(feature_group_count=C)` is
~2.5x slower on TPU than expressing the same depthwise conv as k*k shifted
multiply-accumulates over the padded input (measured on v5e: 0.357 ms vs
0.141 ms for 3x3/16ch/512^2/bf16/batch16). The shifted form is a chain of
elementwise FMAs the compiler fuses into one VPU loop over NHWC tiles, with
no im2col-style data movement.

Used by models/layers.py for every depthwise conv (MobileNetV3 dw stages,
CAB DWConv, DepthwiseSeparableConv). Fully differentiable (autodiff through
pad/slice/add), and the parameter layout is identical to nn.Conv's depthwise
kernel (kH, kW, 1, C), so checkpoints are unaffected.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

PadLike = Union[int, Tuple[int, int]]


def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     stride: int = 1, padding: int = None) -> jnp.ndarray:
    """Depthwise conv over NHWC input.

    x: (B, H, W, C); kernel: (kH, kW, 1, C) — nn.Conv depthwise layout.
    padding defaults to (k-1)//2 ('same' for odd kernels).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if padding is None:
        padding = (kh - 1) // 2
    B, H, W, C = x.shape

    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    out_h = (H + 2 * padding - kh) // stride + 1
    out_w = (W + 2 * padding - kw) // stride + 1

    out = None
    for i in range(kh):
        for j in range(kw):
            window = xp[:, i:i + (out_h - 1) * stride + 1:stride,
                        j:j + (out_w - 1) * stride + 1:stride, :]
            term = window * kernel[i, j, 0]
            out = term if out is None else out + term
    return out
