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
import numpy as np

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


_BAND_CHUNK = 128   # output rows per banded-resize chunk (MXU M dim)
_BAND_MIN_IN = 1024  # band an axis only when its input length reaches this


def _band_layout(n_in: int, n_out: int,
                 chunk: int) -> Tuple[np.ndarray, int]:
    """Static banded-resize layout: per-chunk input band starts and the
    uniform band length L (multiple of 8 sublanes, <= n_in).

    Tap indices are computed with the SAME f32 arithmetic `_banded_weights`
    uses on device — an f64 layout can disagree with the f32 floor() at
    ~1e-4 of output rows, and a disagreement landing on a chunk's extreme
    tap would silently drop that tap's weight (one_hot out of range returns
    a zero row, no error). Containment is asserted below so any future
    divergence fails loudly at trace time instead."""
    o = np.arange(n_out, dtype=np.float32)
    src = np.clip((o + np.float32(0.5)) * np.float32(n_in / n_out)
                  - np.float32(0.5), np.float32(0.0), np.float32(n_in - 1))
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    n_chunks = -(-n_out // chunk)
    i0, need = [], 1
    for j in range(n_chunks):
        a, b = j * chunk, min((j + 1) * chunk, n_out)
        i0.append(int(lo[a:b].min()))
        need = max(need, int(hi[a:b].max()) - i0[-1] + 1)
    L = min(-(-need // 8) * 8, n_in)
    starts = np.minimum(np.asarray(i0, np.int64), n_in - L)
    for j in range(n_chunks):
        a, b = j * chunk, min((j + 1) * chunk, n_out)
        assert int(lo[a:b].min()) >= starts[j], (n_in, n_out, chunk, j)
        assert int(hi[a:b].max()) < starts[j] + L, (n_in, n_out, chunk, j)
    return starts, L


def _banded_weights(n_in: int, n_out: int, chunk: int, i0_np: np.ndarray,
                    L: int) -> jnp.ndarray:
    """(n_chunks, chunk, L) banded rows of `_interp_matrix(n_in, n_out)` —
    same taps, shifted into each chunk's band. Built on device (see
    _interp_matrix). Pad rows past n_out clamp to the last real row and are
    sliced off by the caller."""
    n_chunks = len(i0_np)
    o = jnp.minimum(jnp.arange(n_chunks * chunk, dtype=jnp.float32),
                    float(n_out - 1))
    src = jnp.clip((o + 0.5) * (n_in / n_out) - 0.5, 0.0, float(n_in - 1))
    lo = jnp.floor(src)
    frac = (src - lo)[:, None]
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, n_in - 1)
    i0 = jnp.repeat(jnp.asarray(i0_np, jnp.int32), chunk)
    w = (jax.nn.one_hot(lo_i - i0, L, dtype=jnp.float32) * (1.0 - frac)
         + jax.nn.one_hot(hi_i - i0, L, dtype=jnp.float32) * frac)
    return w.reshape(n_chunks, chunk, L)


def _resize_axis_banded(x: jnp.ndarray, n_out: int, axis: int) -> jnp.ndarray:
    """Resize one spatial axis of NHWC `x` with the banded 2-tap matmul.

    The dense (n_out, n_in) interp matmul does n_in MACs per output element
    when only 2 are nonzero — at 4K-protocol sizes that is ~95% wasted MXU
    work per resize. Banding splits the output axis into chunks of
    _BAND_CHUNK rows whose taps all fall in one length-L input band
    (L ~= chunk*ratio + 2), cutting FLOPs by n_in/L (~16x at scale 1.75).
    The dropped columns are exact 0.0 weights, so the result matches the
    dense matmul to reduction-order ULPs (<=2e-7 observed; the two nonzero
    taps may associate differently inside a shorter dot) — and both are
    ~300x closer to the f64 ground truth than torch's own f32
    F.interpolate (1.4e-4), measured in test_ops.py."""
    n_in = x.shape[axis]
    i0_np, L = _band_layout(n_in, n_out, _BAND_CHUNK)
    wb = _banded_weights(n_in, n_out, _BAND_CHUNK, i0_np, L).astype(x.dtype)
    bands = jnp.stack([jax.lax.slice_in_dim(x, int(s), int(s) + L, axis=axis)
                       for s in i0_np])
    if axis == 1:  # bands (J, B, L, W, C)
        y = jnp.einsum("jpl,jblwc->bjpwc", wb, bands,
                       preferred_element_type=jnp.float32)
        y = y.reshape(x.shape[0], -1, x.shape[2], x.shape[3])
        return y[:, :n_out].astype(x.dtype)
    # axis == 2: bands (J, B, H, L, C)
    y = jnp.einsum("jql,jbhlc->bhjqc", wb, bands,
                   preferred_element_type=jnp.float32)
    y = y.reshape(x.shape[0], x.shape[1], -1, x.shape[3])
    return y[:, :, :n_out].astype(x.dtype)


def _resize_axis_dense(x: jnp.ndarray, n_out: int, axis: int) -> jnp.ndarray:
    w = _interp_matrix(x.shape[axis], n_out).astype(x.dtype)
    eq = "ph,bhwc->bpwc" if axis == 1 else "qw,bhwc->bhqc"
    return jnp.einsum(eq, w, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear NHWC resize, half-pixel centers (== torch align_corners=False).

    Both directions run as separable MXU matmuls (measured 127 -> ~25
    us/img for the 128^2->1024^2 8-channel logits upsample at batch 128:
    jax.image.resize lowers to gathers, which the TPU serializes; an
    interpolation-matrix einsum is dense MXU work — same trick as
    `adaptive_avg_pool2d`). Axes at eval-protocol lengths (>= _BAND_MIN_IN
    input rows) switch to the banded matmul (`_resize_axis_banded`) — same
    bits, ~16x fewer FLOPs; model-internal resizes keep the single dense
    einsum below.

    Downscaling MUST use the same 2-tap matrix, not jax.image.resize: the
    reference protocol resizes with torch ``F.interpolate(mode="bilinear")``
    (evaluate.py:152-159), which never anti-aliases, while jax.image.resize
    defaults to ``antialias=True`` on downscale — a ~2.0 max deviation on
    unit-normal data, i.e. a silent eval-protocol divergence on the exact
    path the north-star mIoU is measured on (scales<1 scale the input down;
    scales>1 resize the probability map back down to native). The 2-tap
    matrix matches torch to <5e-7 in both directions (test_ops.py).
    """
    B, H, W, C = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (out_h, out_w) == (H, W):
        return x
    band_h = H >= _BAND_MIN_IN and out_h >= _BAND_CHUNK
    band_w = W >= _BAND_MIN_IN and out_w >= _BAND_CHUNK
    if not (band_h or band_w):
        left = _interp_matrix(H, out_h)
        right = _interp_matrix(W, out_w)
        y = jnp.einsum("bhwc,ph,qw->bpqc", x, left.astype(x.dtype),
                       right.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    # Sequential per-axis passes; shrink before growing so the second pass
    # (and the intermediate) runs at the smaller size.
    axes = [(1, out_h, band_h), (2, out_w, band_w)]
    if out_h > H and out_w <= W:
        axes.reverse()
    y = x
    for axis, n_out, banded in axes:
        if y.shape[axis] == n_out:
            continue
        y = (_resize_axis_banded(y, n_out, axis) if banded
             else _resize_axis_dense(y, n_out, axis))
    return y


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
