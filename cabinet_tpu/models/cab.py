"""Context Aggregation Block (Flax / NHWC).

Capability parity with the reference CAB (src/models/cab.py:18-216):
  - PSPModule: pyramid adaptive-avg pooling (1,3,6,8) + bilinear upsample +
    identity concat + 1x1 projection (cab.py:46-76),
  - GlobalContextAttention: 1x1 q/k/v projections, PSP-enhanced key/value,
    scaled-dot-product attention over all H*W tokens, zero-init output
    projection (cab.py:84-162),
  - LocalAttention: 3 stacked depthwise convs -> sigmoid gate -> x + x*mask
    (cab.py:170-184),
  - ContextAggregationBlock: gamma * global + local, gamma zero-init
    (cab.py:192-216).

TPU-first design notes: the adaptive pools are expressed as static matmuls
(MXU), attention is a pair of batched matmuls over <=1024 tokens (the CAB only
ever runs on the /32 backbone grid), and the whole block fuses under XLA. An
optional Pallas fused-attention path (ops/attention.py) is selected with
`use_pallas=True` for inference at fixed shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cabinet_tpu.models.layers import DWConv, adaptive_avg_pool2d, batch_norm, kaiming_a1

Dtype = Any


def _interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, half-pixel centers with
    edge clamping — torch ``align_corners=False`` sampling in BOTH
    directions (2-tap even when n_out < n_in; jax.image.resize matches on
    upsample only, its downsample anti-aliases).

    Built ON DEVICE from iota + one_hot, NOT as a numpy constant: a dense
    f32 constant at eval sizes (e.g. 4096x2048 = 33 MB) would embed into
    the HLO of every program that uses it (6 scales => hundreds of MB of
    program payload); the on-device construction is three cheap passes and
    leaves the program tiny."""
    src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    src = jnp.clip(src, 0.0, float(n_in - 1))  # edge clamp BEFORE the taps
    lo = jnp.floor(src)
    frac = (src - lo)[:, None]
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, n_in - 1)
    return (jax.nn.one_hot(lo_i, n_in, dtype=jnp.float32) * (1.0 - frac)
            + jax.nn.one_hot(hi_i, n_in, dtype=jnp.float32) * frac)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear NHWC resize, half-pixel centers (== torch align_corners=False).

    Both directions run as two separable MXU matmuls (measured 127 -> ~25
    us/img for the 128^2->1024^2 8-channel logits upsample at batch 128:
    jax.image.resize lowers to gathers, which the TPU serializes; an
    interpolation-matrix einsum is dense MXU work — same trick as
    `adaptive_avg_pool2d`).

    Downscaling MUST use the same 2-tap matrix, not jax.image.resize: the
    reference protocol resizes with torch ``F.interpolate(mode="bilinear")``
    (evaluate.py:152-159), which never anti-aliases, while jax.image.resize
    defaults to ``antialias=True`` on downscale — a ~2.0 max deviation on
    unit-normal data, i.e. a silent eval-protocol divergence on the exact
    path the north-star mIoU is measured on (scales<1 scale the input down;
    scales>1 resize the probability map back down to native). The 2-tap
    matrix matches torch to <5e-7 in both directions (test_layers.py).
    """
    B, H, W, C = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (out_h, out_w) == (H, W):
        return x
    left = _interp_matrix(H, out_h)
    right = _interp_matrix(W, out_w)
    y = jnp.einsum("bhwc,ph,qw->bpqc", x, left.astype(x.dtype),
                   right.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


class PSPModule(nn.Module):
    """Pyramid pooling with residual feature preservation; (B,H,W,C)->(B,H,W,C)."""

    sizes: Tuple[int, ...] = (1, 3, 6, 8)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = x.shape[1:3]
        channels = x.shape[-1]
        priors = [x]
        for s in self.sizes:
            pooled = adaptive_avg_pool2d(x, (s, s))
            priors.append(resize_bilinear(pooled, (h, w)))
        out = jnp.concatenate(priors, axis=-1)
        return nn.Conv(channels, (1, 1), use_bias=False, dtype=self.dtype,
                       kernel_init=kaiming_a1, name="project")(out)


class GlobalContextAttention(nn.Module):
    """Reduced non-local attention with PSP-enhanced key/value encoding."""

    key_channels: int
    value_channels: int
    out_channels: Optional[int] = None
    scale: int = 1
    psp_sizes: Tuple[int, ...] = (1, 3, 6, 8)
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        out_channels = self.out_channels or C

        x_down = x
        if self.scale > 1:
            x_down = nn.max_pool(x, (self.scale, self.scale),
                                 strides=(self.scale, self.scale))
        Hd, Wd = x_down.shape[1:3]

        # Query projection: 1x1 conv (no bias) + BN + ReLU.
        q = nn.Conv(self.key_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_a1, name="to_query")(x_down)
        q = batch_norm(self.dtype, "query_bn")(q, use_running_average=not train)
        q = nn.relu(q)

        k = nn.Conv(self.key_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_a1, name="to_key")(x_down)
        k = batch_norm(self.dtype, "key_bn")(k, use_running_average=not train)
        k = nn.relu(k)
        k = PSPModule(self.psp_sizes, dtype=self.dtype, name="psp_key")(k)

        v = nn.Conv(self.value_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_a1, name="to_value")(x_down)
        v = PSPModule(self.psp_sizes, dtype=self.dtype, name="psp_value")(v)

        q = q.reshape(B, Hd * Wd, self.key_channels)
        k = k.reshape(B, Hd * Wd, self.key_channels)
        v = v.reshape(B, Hd * Wd, self.value_channels)

        if self.use_pallas:
            from cabinet_tpu.ops.attention import fused_global_attention

            context = fused_global_attention(q, k, v)
        else:
            # softmax(q k^T * K^-0.5) v over all tokens (reference cab.py:149-153).
            attn = jnp.einsum("bnk,bmk->bnm", q, k,
                              preferred_element_type=jnp.float32)
            attn = attn * (self.key_channels ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            context = jnp.einsum("bnm,bmv->bnv", attn, v,
                                 preferred_element_type=jnp.float32).astype(v.dtype)

        context = context.reshape(B, Hd, Wd, self.value_channels)
        context = nn.Conv(out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="project_out")(context)

        if self.scale > 1:
            context = resize_bilinear(context, (H, W))
        return context


class LocalAttention(nn.Module):
    """Local spatial-channel refinement: x + x * sigmoid(DWConv^3(x))."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        m = DWConv(dtype=self.dtype, name="refine_0")(x, train)
        m = DWConv(dtype=self.dtype, name="refine_1")(m, train)
        m = DWConv(dtype=self.dtype, name="refine_2")(m, train)
        mask = nn.sigmoid(m)
        return x + x * mask


class ContextAggregationBlock(nn.Module):
    """gamma * global_attn(x) + local_attn(x); gamma zero-init scalar."""

    value_channels: int
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        global_feat = GlobalContextAttention(
            key_channels=in_channels // 2,
            value_channels=self.value_channels,
            out_channels=in_channels,
            scale=1,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="global_attn",
        )(x, train)
        local_feat = LocalAttention(dtype=self.dtype, name="local_attn")(x, train)
        return gamma.astype(x.dtype) * global_feat + local_feat
