"""CABiNet dual-branch segmentation network (Flax / NHWC).

Capability parity with the reference network (src/models/cabinet.py:54-247):
  - SpatialBranch: 7x7 s2 -> 3x3 s2 -> 3x3 s2 -> 1x1, 128ch @ H/8 (:108-129),
  - AttentionBranch: conva 3x3 -> CAB -> convb 1x1 (low-res features) plus the
    fusion path b1..b4 emitting aux class logits (:54-105),
  - FeatureFusionModule: concat -> 1x1 ConvBNReLU -> SE-style channel attention,
    feat*atten + feat (:132-153),
  - CABiNetOutput: 3x3 ConvBNReLU -> 1x1 classifier (bias-free) (:156-172),
  - CABiNet.forward: two outputs (final logit, aux logit), both bilinearly
    upsampled to input resolution (:207-247).

Input is NHWC (B,H,W,3). `decoder_path_prefixes` mirrors the reference's
get_params decoder split (cabinet.py:249-300) for the x10-LR optimizer groups.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cabinet_tpu.core.constants import MODEL_CONFIG
from cabinet_tpu.models.cab import ContextAggregationBlock, resize_bilinear
from cabinet_tpu.models.layers import ConvBNReLU, kaiming_a1
from cabinet_tpu.models.mobilenetv3 import MobileNetV3, default_cfgs

Dtype = Any

# Top-level submodules whose params get x10 LR (reference cabinet.py:263).
DECODER_MODULES = ("ffm", "conv_out", "ab")


class SpatialBranch(nn.Module):
    """High-resolution detail branch: (B,H,W,3) -> (B,H/8,W/8,128)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNReLU(64, kernel_size=7, stride=2, padding=3, dtype=self.dtype,
                       name="conv1")(x, train)
        x = ConvBNReLU(64, kernel_size=3, stride=2, padding=1, dtype=self.dtype,
                       name="conv2")(x, train)
        x = ConvBNReLU(64, kernel_size=3, stride=2, padding=1, dtype=self.dtype,
                       name="conv3")(x, train)
        x = ConvBNReLU(128, kernel_size=1, stride=1, padding=0, dtype=self.dtype,
                       name="conv_out")(x, train)
        return x


class AttentionBranch(nn.Module):
    """Context branch head over backbone features.

    Returns (low_res_out, aux_out): 256-ch features for fusion and
    num_classes aux logits for deep supervision.
    """

    interplanes: int
    outplanes: int
    num_classes: int
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = nn.Conv(self.interplanes, (3, 3), padding=[(1, 1)] * 2,
                       use_bias=False, dtype=self.dtype, kernel_init=kaiming_a1,
                       name="conva")(x)
        feat = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            name="conva_bn")(feat, use_running_average=not train)
        feat = nn.relu(feat)

        feat = ContextAggregationBlock(
            value_channels=self.interplanes // 2,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="a2block",
        )(feat, train)

        low_res_out = nn.Conv(self.outplanes, (1, 1), use_bias=True,
                              dtype=self.dtype, kernel_init=kaiming_a1,
                              name="convb")(feat)

        fused = jnp.concatenate([x, feat], axis=-1)
        fused = nn.Conv(self.outplanes, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, kernel_init=kaiming_a1,
                        name="b1")(fused)
        fused = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name="b2")(fused, use_running_average=not train)
        fused = nn.relu(fused)
        aux_out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                          dtype=self.dtype, kernel_init=kaiming_a1,
                          name="b4")(fused)
        return low_res_out, aux_out


class FeatureFusionModule(nn.Module):
    """Concat + 1x1 ConvBNReLU + SE-style channel attention (feat*atten + feat)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp: jnp.ndarray, fcp: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_features, kernel_size=1, stride=1, padding=0,
                          dtype=self.dtype, name="convblk")(fcat, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        atten = nn.Conv(self.out_features // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, kernel_init=kaiming_a1,
                        name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_features, (1, 1), use_bias=False,
                        dtype=self.dtype, kernel_init=kaiming_a1,
                        name="conv2")(atten)
        atten = nn.sigmoid(atten)
        return feat * atten + feat


class CABiNetOutput(nn.Module):
    """3x3 ConvBNReLU + bias-free 1x1 classifier."""

    mid_features: int
    n_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNReLU(self.mid_features, kernel_size=3, padding=1,
                       dtype=self.dtype, name="conv")(x, train)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, dtype=self.dtype,
                       kernel_init=kaiming_a1, name="conv_out")(x)


class CABiNet(nn.Module):
    """Dual-branch real-time segmentation network.

    __call__(x: (B,H,W,3)) -> (final_logits, aux_logits), both (B,H,W,n_classes).
    """

    n_classes: int
    mode: str = "large"
    cfgs: Optional[Sequence[Sequence[float]]] = None
    use_pallas: bool = False
    remat: Any = False  # backbone remat: True=all blocks, int N=first N
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        config = MODEL_CONFIG.get(self.mode)
        if config is None:
            raise ValueError(f"Invalid mode: {self.mode}. Must be 'large' or 'small'")

        cfgs = self.cfgs if self.cfgs is not None else default_cfgs(self.mode)
        self.sb = SpatialBranch(dtype=self.dtype)
        self.mobile = MobileNetV3(cfgs=tuple(map(tuple, cfgs)), mode=self.mode,
                                  dtype=self.dtype, remat=self.remat)
        self.ab = AttentionBranch(
            interplanes=256, outplanes=256, num_classes=self.n_classes,
            use_pallas=self.use_pallas, dtype=self.dtype,
        )
        self.ffm = FeatureFusionModule(256, dtype=self.dtype)
        self.conv_out = CABiNetOutput(256, self.n_classes, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mobile_feat = self.mobile(x, train)
        return self._decode(x, mobile_feat, train)

    def forward_from_early(self, x: jnp.ndarray, early: jnp.ndarray,
                           train: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward with a precomputed stem+block_0 output `early`
        (B,H/2,W/2,16) — the seam for the fused Pallas early-stage kernel
        (ops/early_stage.py). Same parameters as `__call__`."""
        mobile_feat = self.mobile.tail(early, train)
        return self._decode(x, mobile_feat, train)

    def _decode(self, x: jnp.ndarray, mobile_feat: jnp.ndarray, train: bool
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H, W = x.shape[1:3]
        feat_sb = self.sb(x, train)
        low_res, aux = self.ab(mobile_feat, train)

        sb_hw = feat_sb.shape[1:3]
        low_res_up = resize_bilinear(low_res, sb_hw)
        aux_up = resize_bilinear(aux, sb_hw)

        feat_fuse = self.ffm(feat_sb, low_res_up, train)
        final = self.conv_out(feat_fuse, train)

        final = resize_bilinear(final, (H, W))
        aux_full = resize_bilinear(aux_up, (H, W))
        return final, aux_full


def build_cabinet(n_classes: int, mode: str = "large",
                  cfgs: Optional[Sequence[Sequence[float]]] = None,
                  use_pallas: bool = False, remat: Any = False,
                  dtype: Dtype = jnp.float32) -> CABiNet:
    """Factory mirroring the reference constructor surface (cabinet.py:175-205)."""
    return CABiNet(n_classes=n_classes, mode=mode, cfgs=cfgs,
                   use_pallas=use_pallas, remat=remat, dtype=dtype)
