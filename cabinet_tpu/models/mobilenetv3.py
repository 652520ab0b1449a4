"""MobileNetV3 backbone (Flax / NHWC), cfg-table driven.

Capability parity with the reference backbone (src/models/mobilenetv3.py:102-278):
same cfg rows [k, t, c, SE, HS, s], same channel rounding, same block structure
(InvertedResidual with/without expansion, SE placement differs between the two
variants exactly as in the reference), and `__call__` returns the pre-pool
feature map after the final 1x1 conv (960ch large / 576ch small) — NOT logits
(reference mobilenetv3.py:202-205; the classifier head is unused there and is
simply not constructed here).

Pretrained torch weights are loaded via cabinet_tpu.utils.torch_convert.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cabinet_tpu.models.layers import (
    SELayer,
    batch_norm,
    hard_swish,
    make_divisible,
    mobilenet_conv_init,
)

Dtype = Any

# Canonical cfg tables (reference mobilenetv3.py:240-257, 263-276):
# rows are [kernel, expand_ratio, channels, use_se, use_hs, stride].
MOBILENETV3_LARGE_CFGS: List[List[float]] = [
    [3, 1, 16, 0, 0, 1],
    [3, 4, 24, 0, 0, 2],
    [3, 3, 24, 0, 0, 1],
    [5, 3, 40, 1, 0, 2],
    [5, 3, 40, 1, 0, 1],
    [5, 3, 40, 1, 0, 1],
    [3, 6, 80, 0, 1, 2],
    [3, 2.5, 80, 0, 1, 1],
    [3, 2.3, 80, 0, 1, 1],
    [3, 2.3, 80, 0, 1, 1],
    [3, 6, 112, 1, 1, 1],
    [3, 6, 112, 1, 1, 1],
    [5, 6, 160, 1, 1, 2],
    [5, 6, 160, 1, 1, 1],
    [5, 6, 160, 1, 1, 1],
]

MOBILENETV3_SMALL_CFGS: List[List[float]] = [
    [3, 1, 16, 1, 0, 2],
    [3, 4.5, 24, 0, 0, 2],
    [3, 3.67, 24, 0, 0, 1],
    [5, 4, 40, 1, 1, 2],
    [5, 6, 40, 1, 1, 1],
    [5, 6, 40, 1, 1, 1],
    [5, 3, 48, 1, 1, 1],
    [5, 3, 48, 1, 1, 1],
    [5, 6, 96, 1, 1, 2],
    [5, 6, 96, 1, 1, 1],
    [5, 6, 96, 1, 1, 1],
]


def default_cfgs(mode: str) -> List[List[float]]:
    if mode == "large":
        return MOBILENETV3_LARGE_CFGS
    if mode == "small":
        return MOBILENETV3_SMALL_CFGS
    raise ValueError(f"mode must be 'large' or 'small', got '{mode}'")


def _conv(features: int, kernel: int, stride: int, dtype: Dtype,
          name: str = None) -> nn.Conv:
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[((kernel - 1) // 2,) * 2] * 2,
        use_bias=False,
        dtype=dtype,
        kernel_init=mobilenet_conv_init,
        name=name,
    )


def _dwconv(channels: int, kernel: int, stride: int, dtype: Dtype, name: str):
    from cabinet_tpu.models.layers import DepthwiseConv2D

    return DepthwiseConv2D(kernel_size=kernel, stride=stride, dtype=dtype,
                           kernel_init=mobilenet_conv_init, name=name)


class InvertedResidual(nn.Module):
    """MobileNetV3 inverted-residual block (reference mobilenetv3.py:102-159).

    Two structural variants, matching the reference exactly:
    - no-expand (inp == hidden): dw -> act -> [SE] -> pw-linear
    - expand: pw -> act -> dw -> [SE after BN] -> act -> pw-linear
    Residual connection iff stride == 1 and inp == oup.
    """

    hidden_dim: int
    out_features: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x.shape[-1]
        identity = self.stride == 1 and inp == self.out_features
        act = hard_swish if self.use_hs else nn.relu
        y = x

        if inp == self.hidden_dim:
            y = _dwconv(self.hidden_dim, self.kernel, self.stride, self.dtype, "dw")(y)
            y = batch_norm(self.dtype, "dw_bn")(y, use_running_average=not train)
            y = act(y)
            if self.use_se:
                y = SELayer(dtype=self.dtype, name="se")(y)
            y = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=mobilenet_conv_init, name="project")(y)
            y = batch_norm(self.dtype, "project_bn")(y, use_running_average=not train)
        else:
            y = nn.Conv(self.hidden_dim, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=mobilenet_conv_init, name="expand")(y)
            y = batch_norm(self.dtype, "expand_bn")(y, use_running_average=not train)
            y = act(y)
            y = _dwconv(self.hidden_dim, self.kernel, self.stride, self.dtype, "dw")(y)
            y = batch_norm(self.dtype, "dw_bn")(y, use_running_average=not train)
            if self.use_se:
                y = SELayer(dtype=self.dtype, name="se")(y)
            y = act(y)
            y = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=mobilenet_conv_init, name="project")(y)
            y = batch_norm(self.dtype, "project_bn")(y, use_running_average=not train)

        return x + y if identity else y


class MobileNetV3(nn.Module):
    """MobileNetV3 trunk. Input NHWC (B,H,W,3); output (B,h,w,960|576).

    setup()-style so the trunk exposes two entry points over the SAME
    parameters: `__call__` (full forward) and `tail` (from block_1 onward,
    consumed by the fused Pallas stem+block_0 inference path,
    cabinet_tpu/ops/early_stage.py). Attribute names keep the historical
    param tree (stem, stem_bn, block_0.., head, head_bn) so converted
    checkpoints are unaffected.
    """

    cfgs: Sequence[Sequence[float]]
    mode: str = "large"
    width_mult: float = 1.0
    dtype: Dtype = jnp.float32
    # Rematerialize inverted-residual blocks in backward (jax.checkpoint):
    # trades recompute for activation memory, raising the max train batch.
    # True = every block; an int N = only the first N blocks (the early
    # high-resolution blocks hold most of the activation bytes but the
    # fewest FLOPs, so partial remat buys most of the memory for a fraction
    # of the recompute).
    remat: Any = False

    def setup(self) -> None:
        if self.mode not in ("large", "small"):
            raise ValueError(f"mode must be 'large' or 'small', got '{self.mode}'")

        input_channel = make_divisible(16 * self.width_mult, 8)
        self.stem = _conv(input_channel, 3, 2, self.dtype)
        self.stem_bn = batch_norm(self.dtype, name=None)

        remat_cls = nn.remat(InvertedResidual, static_argnums=(2,))

        def block_cls_for(i: int):
            if self.remat is True:
                return remat_cls
            if self.remat and i < int(self.remat):
                return remat_cls
            return InvertedResidual

        exp_size = input_channel
        blocks = []
        for i, (k, t, c, use_se, use_hs, s) in enumerate(self.cfgs):
            block_cls = block_cls_for(i)
            output_channel = make_divisible(c * self.width_mult, 8)
            exp_size = make_divisible(input_channel * t, 8)
            blocks.append(block_cls(
                hidden_dim=exp_size,
                out_features=output_channel,
                kernel=int(k),
                stride=int(s),
                use_se=bool(use_se),
                use_hs=bool(use_hs),
                dtype=self.dtype,
            ))
            input_channel = output_channel
        self.block = blocks  # named block_0, block_1, ... by Flax

        self.head = nn.Conv(exp_size, (1, 1), use_bias=False, dtype=self.dtype,
                            kernel_init=mobilenet_conv_init)
        self.head_bn = batch_norm(self.dtype, name=None)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.stem(x)
        x = self.stem_bn(x, use_running_average=not train)
        x = hard_swish(x)
        x = self.block[0](x, train)
        return self.tail(x, train)

    def tail(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Forward from block_1 on, given block_0's output (B,H/2,W/2,16).

        Entry point for the fused stem+block_0 Pallas kernel: the kernel
        computes the first subgraph, this method runs the rest with the
        same parameters as the standard path.
        """
        for blk in self.block[1:]:
            x = blk(x, train)
        x = self.head(x)
        x = self.head_bn(x, use_running_average=not train)
        return hard_swish(x)
