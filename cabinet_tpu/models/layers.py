"""Shared NN building blocks (Flax / NHWC).

Capability parity with the reference's block zoo (src/models/layers/common.py:7-105,
src/models/mobilenetv3.py:38-99, src/models/cabinet.py:19-51), designed TPU-first:
NHWC layouts so convs tile directly onto the MXU, compute-dtype threading for
bfloat16, and BatchNorm statistics kept in a `batch_stats` collection.

BatchNorm numerics match torch defaults (eps=1e-5; torch momentum 0.1 ==
flax momentum 0.9) so converted checkpoints reproduce reference activations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# Kaiming-normal a=1, fan_in (reference cabinet.py:47-51): std = 1/sqrt(fan_in).
kaiming_a1 = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
# MobileNet conv init (reference mobilenetv3.py:224-228): std = sqrt(2/(k*k*c_out)).
mobilenet_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def make_divisible(v: float, divisor: int, min_value: Optional[int] = None) -> int:
    """Channel rounding used by every MobileNet width computation
    (reference mobilenetv3.py:18-35)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """relu6(x + 3) / 6 (reference mobilenetv3.py:38-50)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * hard_sigmoid(x) (reference mobilenetv3.py:53-65)."""
    return x * hard_sigmoid(x)


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def batch_norm(dtype: Dtype, name: Optional[str] = "bn") -> nn.BatchNorm:
    """BatchNorm with torch-compatible numerics, stats in `batch_stats`.

    `name=None` (for setup()-style callers) lets Flax derive the name from
    the attribute it is assigned to."""
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class DepthwiseConv2D(nn.Module):
    """Depthwise conv module — single seam for swapping implementations.

    Parameter layout matches nn.Conv's depthwise kernel (kH, kW, 1, C), so
    converted checkpoints are unaffected by the implementation choice.

    Implementation notes (measured on v5e, bf16): an isolated shift-FMA
    form (9 shifted adds instead of a conv; since removed from the tree)
    beats XLA's feature_group_count lowering 2.5x
    in a microbenchmark, but IN CONTEXT it regressed the full model 2x —
    XLA fuses the 9 shifted reads into downstream consumers and re-reads
    the padded input from HBM 9 times. The native conv lowering keeps one
    read. A Pallas kernel that holds the input tile in VMEM is the real
    fix; until then this uses the native lowering.
    """

    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dtype: Dtype = jnp.float32
    kernel_init: Callable = kaiming_a1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        channels = x.shape[-1]
        k = self.kernel_size
        pad = self.padding if self.padding is not None else (k - 1) // 2
        kernel = self.param("kernel", self.kernel_init, (k, k, 1, channels),
                            jnp.float32)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.stride, self.stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels)


class ConvBNReLU(nn.Module):
    """Conv(no bias) + BN + ReLU (reference cabinet.py:19-51)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Union[int, str] = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features,
            _pair(self.kernel_size),
            strides=_pair(self.stride),
            padding=pad,
            kernel_dilation=_pair(self.dilation),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=kaiming_a1,
            name="conv",
        )(x)
        x = batch_norm(self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class DWConv(nn.Module):
    """3x3 depthwise conv + BN + ReLU (reference cab.py:18-38)."""

    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DepthwiseConv2D(kernel_size=3, stride=self.stride,
                            dtype=self.dtype, name="conv")(x)
        x = batch_norm(self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class DepthwiseConv(nn.Module):
    """Depthwise conv block (reference layers/common.py:7-52)."""

    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DepthwiseConv2D(kernel_size=self.kernel_size, stride=self.stride,
                            padding=self.padding, dtype=self.dtype,
                            name="conv")(x)
        x = batch_norm(self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise + pointwise conv, both BN+ReLU (reference layers/common.py:55-105)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DepthwiseConv(
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dtype=self.dtype,
            name="depthwise",
        )(x, train)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=kaiming_a1,
            name="pointwise",
        )(x)
        x = batch_norm(self.dtype)(x, use_running_average=not train)
        return nn.relu(x)


class SELayer(nn.Module):
    """Squeeze-and-excite: GAP -> FC(c/4) -> ReLU -> FC(c) -> hard_sigmoid -> scale
    (reference mobilenetv3.py:68-83)."""

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(
            make_divisible(channels // self.reduction, 8),
            dtype=self.dtype,
            name="fc1",
        )(y)
        y = nn.relu(y)
        y = nn.Dense(channels, dtype=self.dtype, name="fc2")(y)
        y = hard_sigmoid(y)
        return x * y[:, None, None, :]


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d semantics on NHWC input, as two matmuls.

    Bin i covers [floor(i*H/s), ceil((i+1)*H/s)). Pooling matrices are built at
    trace time (static shapes), so the whole op is two MXU matmuls instead of a
    gather loop.
    """
    import numpy as np

    B, H, W, C = x.shape
    sh, sw = output_size

    def pool_matrix(n: int, s: int) -> jnp.ndarray:
        m = np.zeros((s, n), dtype=np.float32)
        for i in range(s):
            start = (i * n) // s
            end = -(-((i + 1) * n) // s)  # ceil
            m[i, start:end] = 1.0 / (end - start)
        return jnp.asarray(m, dtype=x.dtype)

    left = pool_matrix(H, sh)  # (sh, H)
    right = pool_matrix(W, sw).T  # (W, sw)
    # (B,H,W,C) -> (B,C,H,W) contraction-friendly order via einsum.
    return jnp.einsum("bhwc,ph,wq->bpqc", x, left, right)
