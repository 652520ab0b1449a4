"""YOLO-sem: CSP backbone + PAN-FPN neck + dense semantic head (Flax/NHWC).

The reference's second model family is `yolo26{n,s,m,l,x}-sem`, trained via
thin CLI wrappers around the EXTERNAL ultralytics package (reference
train_yolo.py:191-295 — no model code in-repo). This module provides an
in-repo TPU-native equivalent with the same contract (reference
configs/train_yolo.yaml): five width/depth-scaled variants, semantic
segmentation output at input resolution, mIoU/pixel-accuracy eval, and the
nbs/cosine-LR/mosaic-mixup-copypaste training recipe (cli/train_yolo.py).

Architecture (YOLOv8-style, segmentation-adapted):
  backbone: stem s2 -> 4 stages of ConvBNSiLU s2 + C2f (P2..P5)
  neck: PAN-FPN top-down (P5->P4->P3) with C2f fusion
  head: upsample-and-concat P3/P4/P5 to /8, 2x ConvBNSiLU, 1x1 classifier,
        bilinear upsample to input resolution; aux head off P4 for deep
        supervision (mirrors CABiNet's dual-output training contract).

Returns (logits, aux_logits) like CABiNet so every trainer/eval path is
shared between the two families.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cabinet_tpu.models.cab import resize_bilinear

Dtype = Any

# (depth_multiple, width_multiple, max_channels, extra /32 C2f repeats) —
# calibrated so BOTH published columns match: params within 2.1% of
# 1.63/6.50/14.32/17.87/40.16 M AND FLOPs within 2.1% of
# 11.4/44.4/152.3/192.4/430.9 GFLOPs @1024^2 (BASELINE.md UAVid rows;
# params guarded by tests/unit/test_param_counts.py). The `deep` knob adds
# param-heavy flop-cheap capacity at /32, mirroring how the published
# family concentrates parameters in late stages.
YOLOSEM_VARIANTS: Dict[str, Tuple[float, float, int, int]] = {
    "n": (0.25, 0.2375, 896, 2),   # 1.66 M / 11.6 G
    "s": (0.50, 0.375, 896, 4),    # 6.55 M / 44.6 G
    "m": (0.50, 0.75, 640, 1),     # 14.29 M / 152.0 G
    "l": (0.60, 0.8125, 640, 1),   # 17.85 M / 191.9 G
    "x": (0.70, 1.225, 640, 1),    # 39.96 M / 428.2 G
}


def _ch(width: float, c: int, max_channels: int) -> int:
    return int(min(c, max_channels) * width // 8) * 8 or 8


def _depth(depth: float, n: int) -> int:
    return max(1, round(n * depth))


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(momentum=0.97, epsilon=1e-3, dtype=self.dtype,
                         name="bn")(x, use_running_average=not train)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8 C2f)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.features // 2
        y = ConvBNSiLU(self.features, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :half], y[..., half:]
        outs = [a, b]
        for i in range(self.n):
            b = Bottleneck(half, self.shortcut, dtype=self.dtype,
                           name=f"m{i}")(b, train)
            outs.append(b)
        y = jnp.concatenate(outs, axis=-1)
        return ConvBNSiLU(self.features, 1, dtype=self.dtype, name="cv2")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (3 chained 5x5 max pools)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = max(self.features // 2, 8)
        x = ConvBNSiLU(half, 1, dtype=self.dtype, name="cv1")(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        y = jnp.concatenate([x, p1, p2, p3], axis=-1)
        return ConvBNSiLU(self.features, 1, dtype=self.dtype, name="cv2")(y, train)


class YOLOSem(nn.Module):
    """Semantic segmentation YOLO. Input (B,H,W,3) -> (logits, aux) at (H,W).

    setup-style with an explicit backbone | decode split (attribute names
    keep the original parameter tree bit-identical) so the pipeline-parallel
    trainer (train/pipeline.py) can place the CSP trunk and the FPN+heads on
    device-disjoint stages — the deep variants are PP's motivating case.
    """

    n_classes: int
    variant: str = "n"
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        if self.variant not in YOLOSEM_VARIANTS:
            raise ValueError(f"Unknown YOLO-sem variant: {self.variant}")
        d, w, mc, deep = YOLOSEM_VARIANTS[self.variant]
        C = lambda c: _ch(w, c, mc)  # noqa: E731
        N = lambda n: _depth(d, n)  # noqa: E731

        # Backbone ------------------------------------------------------
        self.stem = ConvBNSiLU(C(64), 3, 2, dtype=self.dtype)
        self.down2 = ConvBNSiLU(C(128), 3, 2, dtype=self.dtype)
        self.c2f_2 = C2f(C(128), N(3), dtype=self.dtype)              # /4
        self.down3 = ConvBNSiLU(C(256), 3, 2, dtype=self.dtype)
        self.c2f_3 = C2f(C(256), N(6), dtype=self.dtype)              # /8  P3
        self.down4 = ConvBNSiLU(C(512), 3, 2, dtype=self.dtype)
        self.c2f_4 = C2f(C(512), N(6), dtype=self.dtype)              # /16 P4
        self.down5 = ConvBNSiLU(C(1024), 3, 2, dtype=self.dtype)
        # `deep` extra repeats at /32: params are cheap in FLOPs here
        self.c2f_5 = C2f(C(1024), N(3) + deep, dtype=self.dtype)      # /32
        self.sppf = SPPF(C(1024), dtype=self.dtype)                   # P5

        # PAN-FPN top-down + heads ---------------------------------------
        self.fpn_4 = C2f(C(512), N(3), shortcut=False, dtype=self.dtype)
        self.fpn_3 = C2f(C(256), N(3), shortcut=False, dtype=self.dtype)
        self.head0 = ConvBNSiLU(C(256), 1, dtype=self.dtype)
        self.head1 = ConvBNSiLU(C(256), 3, dtype=self.dtype)
        self.head2 = ConvBNSiLU(C(256), 3, dtype=self.dtype)
        self.classifier = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype)
        self.aux1 = ConvBNSiLU(C(256), 3, dtype=self.dtype)
        self.aux_classifier = nn.Conv(self.n_classes, (1, 1),
                                      dtype=self.dtype)

    def backbone(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """CSP trunk: image -> (P3 /8, P4 /16, P5 /32) feature pyramid."""
        x1 = self.stem(x, train)
        x2 = self.c2f_2(self.down2(x1, train), train)
        x3 = self.c2f_3(self.down3(x2, train), train)
        x4 = self.c2f_4(self.down4(x3, train), train)
        x5 = self.sppf(self.c2f_5(self.down5(x4, train), train), train)
        return x3, x4, x5

    def backbone_front(self, x: jnp.ndarray, train: bool = False
                       ) -> jnp.ndarray:
        """First half of the trunk (image -> P3) — the 3-stage pipeline cut
        (train/pipeline.py): backbone == backbone_back(backbone_front(x)),
        same submodules in the same order, so splitting cannot change
        numerics or BN-stat updates."""
        x1 = self.stem(x, train)
        x2 = self.c2f_2(self.down2(x1, train), train)
        return self.c2f_3(self.down3(x2, train), train)

    def backbone_back(self, x3: jnp.ndarray, train: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Second half of the trunk (P3 -> full pyramid); P3 passes through
        so the inter-stage activation IS the decode contract."""
        x4 = self.c2f_4(self.down4(x3, train), train)
        x5 = self.sppf(self.c2f_5(self.down5(x4, train), train), train)
        return x3, x4, x5

    def decode(self, x: jnp.ndarray, feats: Tuple[jnp.ndarray, ...],
               train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """PAN-FPN neck + dense heads; `x` supplies only the output (H, W)."""
        x3, x4, x5 = feats
        H, W = x.shape[1:3]

        p5_up = resize_bilinear(x5, x4.shape[1:3])
        p4 = self.fpn_4(jnp.concatenate([p5_up, x4], -1), train)
        p4_up = resize_bilinear(p4, x3.shape[1:3])
        p3 = self.fpn_3(jnp.concatenate([p4_up, x3], -1), train)

        # Semantic head: fuse P3 + up(P4) + up(P5) at /8, 1x1-reduce the
        # wide concat BEFORE the 3x3s (a 3x3 straight off the concat costs
        # ~4x the FLOPs of reduce-then-3x3 for the same receptive field)
        fused = jnp.concatenate([
            p3,
            resize_bilinear(p4, p3.shape[1:3]),
            resize_bilinear(x5, p3.shape[1:3]),
        ], axis=-1)
        h = self.head2(self.head1(self.head0(fused, train), train), train)
        logits = self.classifier(h)

        aux = self.aux_classifier(self.aux1(p4, train))

        logits = resize_bilinear(logits, (H, W))
        aux = resize_bilinear(aux, (H, W))
        return logits, aux

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.decode(x, self.backbone(x, train), train)


def build_yolosem(n_classes: int, model_name: str = "yolo26n-sem",
                  dtype: Dtype = jnp.float32) -> YOLOSem:
    """Factory accepting reference-style model names (yolo26{n,s,m,l,x}-sem,
    reference train_yolo.py:22-28 allowlist)."""
    name = model_name.lower()
    for v in ("n", "s", "m", "l", "x"):
        if f"26{v}" in name or name.endswith(f"{v}-sem") or name == v:
            return YOLOSem(n_classes=n_classes, variant=v, dtype=dtype)
    raise ValueError(f"Unrecognized YOLO-sem model name: {model_name}")
