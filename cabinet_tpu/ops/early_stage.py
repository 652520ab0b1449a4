"""Fused early-stage kernel: MobileNetV3 stem + block_0 (Pallas / TPU).

Why: at 1024^2 input the backbone's first layers dominate wall time (stage
profile on v5e, batch 16: stem 0.57 ms/img, block_0 0.87 ms/img — together
44% of the whole network). The root cause is layout: NHWC tensors with
C in {3, 16} pad the 128-lane minor dimension ~8x in HBM and keep both the
VPU and MXU mostly idle.

This kernel runs the whole sub-graph

    stem conv 3x3 s2 (3->16) -> BN -> hardswish
    -> dw 3x3 (16) -> BN -> relu -> pw 1x1 (16->16) -> BN -> +residual

band-by-band in VMEM with W in the LANE dimension (W/2 = 512 lanes at the
1024^2 design point, zero padding waste):

  - input is pre-packed into H- and W-parity planes (B, 3, 2, 2, Hp/2, W/2),
    so every stride-2 read of the stem becomes a unit-stride slice
    (Mosaic has no strided sublane slices),
  - each grid step takes one overlapping row band (pl.Element indexing),
    builds a 27-row im2col in VMEM, and computes the stem as ONE MXU matmul
    (16 x 27) @ (27, rows*W2),
  - the depthwise stage is 9 shifted FMAs per channel on (rows, W2) VPU
    tiles (lane shifts via roll+mask, sublane shifts via slicing),
  - the pointwise stage is another MXU matmul (16 x 16),
  - BN is folded into conv weights/biases by the caller (inference path),
  - output is written as planes (B, 16, H/2, W/2) — lane-perfect — and the
    next layer (block_1's 1x1 expand) consumes planes directly via einsum.

Inference-only (BN folded); training uses the standard XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_BAND = 32  # output rows (at H/2 resolution) per grid step

PAD_TOP = 3  # aligns band b's tile with h-plane offset b*F (see pack docs)


def pack_input_planes(x: jnp.ndarray, pad_bottom: int) -> jnp.ndarray:
    """(B, H, W, 3) NHWC -> (B, 3, 2, 2, Hp/2, W/2) parity planes.

    Rows are zero-padded (PAD_TOP, pad_bottom) first; then both H and W are
    deinterleaved: planes[b, c, wp, hp, hh, w] = padded[b, 2*hh+hp, 2*w+wp, c].

    PAD_TOP=3 makes the stem's input rows for global output row h_g =
    band*F - 1 + h equal padded rows 2*(band*F + h) + i, i in 0..2 — i.e.
    H-parity-plane entries He[band*F + h], Ho[band*F + h], He[band*F + h + 1],
    all unit-stride in the plane index.
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (PAD_TOP, pad_bottom), (0, 0), (0, 0)))
    Hp = H + PAD_TOP + pad_bottom
    xt = xp.transpose(0, 3, 1, 2)                       # (B, 3, Hp, W)
    xt = xt.reshape(B, C, Hp // 2, 2, W // 2, 2)        # hh, hp, w, wp
    return xt.transpose(0, 1, 5, 3, 2, 4)               # (B,3,wp,hp,hh,w)


def _shift_w(x: jnp.ndarray, delta: int) -> jnp.ndarray:
    """Shift along the lane (W) axis with zero fill. delta=+1 means
    out[w] = x[w-1] (data moves right)."""
    if delta == 0:
        return x
    w = x.shape[-1]
    axis = len(x.shape) - 1
    rolled = pltpu.roll(x, delta % w, axis=axis)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if delta > 0:
        return jnp.where(lane >= delta, rolled, 0.0)
    return jnp.where(lane < w + delta, rolled, 0.0)


def _stem_block0_kernel(x_ref, wstem_ref, bstem_ref, wdw_ref, bdw_ref,
                        wpw_ref, bpw_ref, out_ref, im2col_ref, *, f: int):
    """One band. x block: (1, 3, 2, 2, L, W2); out block: (1, 16, f, W2)."""
    W2 = x_ref.shape[-1]
    rows = f + 2  # stem rows incl. +-1 dw halo

    x = x_ref[0]  # (3, 2wp, 2hp, L, W2)

    # ---- stem as im2col + one MXU matmul ------------------------------
    # output local h: padded rows 2h+i -> i=0: He[h], i=1: Ho[h], i=2: He[h+1]
    # original column 2w+dj: dj=-1 -> O[w-1] (shift right), 0 -> E[w], +1 -> O[w]
    slot = 0
    for ci in range(3):
        row_views = (
            x[ci, :, 0, 0:rows],          # (2wp, rows, W2) i=0
            x[ci, :, 1, 0:rows],          # i=1
            x[ci, :, 0, 1:rows + 1],      # i=2
        )
        for i in range(3):
            e = row_views[i][0]
            o = row_views[i][1]
            im2col_ref[slot + 0] = _shift_w(o, 1).reshape(-1)   # dj=-1
            im2col_ref[slot + 1] = e.reshape(-1)                # dj= 0
            im2col_ref[slot + 2] = o.reshape(-1)                # dj=+1
            slot += 3

    patches = im2col_ref[:27]  # (27, rows*W2)
    stem = jax.lax.dot_general(
        wstem_ref[:], patches,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, rows*W2)
    stem = stem + bstem_ref[:].reshape(16, 1)
    stem = stem * jnp.clip(stem + 3.0, 0.0, 6.0) * (1.0 / 6.0)  # hardswish
    stem = stem.reshape(16, rows, W2)

    # Halo rows outside the global image must be ZERO for the depthwise
    # stage (its conv zero-pads at the image boundary).
    band = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, W2), 0)
    top_bad = jnp.logical_and(band == 0, row_ids == 0)
    bot_bad = jnp.logical_and(band == pl.num_programs(1) - 1,
                              row_ids == rows - 1)
    halo_mask = jnp.logical_or(top_bad, bot_bad)
    stem_dw = jnp.where(halo_mask[None], 0.0, stem)

    # ---- block0 depthwise (9 shifted FMAs per channel) ----------------
    dw_rows = []
    for c in range(16):
        plane = stem_dw[c]  # (rows, W2)
        acc = None
        for i in range(3):
            row_sl = jax.lax.slice_in_dim(plane, i, i + f, axis=0)  # (f, W2)
            for dj in (-1, 0, 1):
                term = _shift_w(row_sl, -dj) * wdw_ref[i, dj + 1, c]
                acc = term if acc is None else acc + term
        acc = jnp.maximum(acc + bdw_ref[c], 0.0)  # BN folded + relu
        dw_rows.append(acc.reshape(1, f * W2))
    dw = jnp.concatenate(dw_rows, axis=0)  # (16, f*W2)

    # ---- block0 pointwise + BN + residual ------------------------------
    pw = jax.lax.dot_general(
        wpw_ref[:], dw,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bpw_ref[:].reshape(16, 1)
    res = stem[:, 1:1 + f, :].reshape(16, f * W2)
    out_ref[0] = (pw + res).reshape(16, f, W2).astype(out_ref.dtype)


def fused_stem_block0(
    x: jnp.ndarray,
    wstem: jnp.ndarray, bstem: jnp.ndarray,
    wdw: jnp.ndarray, bdw: jnp.ndarray,
    wpw: jnp.ndarray, bpw: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stem+block0 forward.

    x: (B, H, W, 3) NHWC. Weights are BN-FOLDED:
      wstem (16, 27) [co, ci*9+i*3+j], bstem (16,),
      wdw (3, 3, 16), bdw (16,), wpw (16, 16) [co, ci], bpw (16,).
    Returns planes (B, 16, H/2, W/2) float32.
    """
    B, H, W, _ = x.shape
    assert H % 2 == 0 and W % 2 == 0
    H2, W2 = H // 2, W // 2
    f = min(F_BAND, H2)
    assert H2 % f == 0, (H2, f)

    # Tile length on the h-plane axis: rows+1 slices needed, rounded up so
    # the second-minor block dim is divisible by 8 (Mosaic constraint).
    L = -(-(f + 3) // 8) * 8
    # h-plane index range used: band*f .. band*f + L - 1; last band needs
    # Hp/2 >= (H2 - f) + L  ->  pad_bottom = 2*(H2 - f + L) - H - PAD_TOP.
    pad_bottom = max(2 * (H2 - f + L) - H - PAD_TOP, 1)

    planes = pack_input_planes(x.astype(jnp.float32), pad_bottom)

    grid = (B, H2 // f)
    kernel = functools.partial(_stem_block0_kernel, f=f)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Overlapping row bands: Element-indexed dim takes an element
            # start offset (band i starts at h-plane row i*f).
            pl.BlockSpec((pl.Element(1), pl.Element(3), pl.Element(2),
                          pl.Element(2), pl.Element(L), pl.Element(W2)),
                         lambda b, i: (b, 0, 0, 0, i * f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, f, W2), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 16, H2, W2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((32, (f + 2) * W2), jnp.float32),
        ],
        interpret=interpret,
    )(planes, wstem, bstem, wdw, bdw, wpw, bpw)


# ---------------------------------------------------------------------------
# Weight folding + XLA reference (for tests and the fallback path)
# ---------------------------------------------------------------------------


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Returns (mult, add): y = x*mult + add == BN(x)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def fold_stem_block0_params(mobile_params, mobile_stats):
    """Fold BN into the stem/block_0 weights of a MobileNetV3 param tree."""
    p, st = mobile_params, mobile_stats

    s1, b1 = fold_bn(p["stem_bn"]["scale"], p["stem_bn"]["bias"],
                     st["stem_bn"]["mean"], st["stem_bn"]["var"])
    wstem = p["stem"]["kernel"]  # (3, 3, 3, 16) HWIO
    # -> (16, 27) ordered [ci*9 + i*3 + j]
    wstem_f = (wstem * s1).transpose(3, 2, 0, 1).reshape(16, 27)

    blk = p["block_0"]
    bst = st["block_0"]
    s2, b2 = fold_bn(blk["dw_bn"]["scale"], blk["dw_bn"]["bias"],
                     bst["dw_bn"]["mean"], bst["dw_bn"]["var"])
    wdw = blk["dw"]["kernel"][:, :, 0, :] * s2  # (3, 3, 16)

    s3, b3 = fold_bn(blk["project_bn"]["scale"], blk["project_bn"]["bias"],
                     bst["project_bn"]["mean"], bst["project_bn"]["var"])
    wpw = (blk["project"]["kernel"][0, 0] * s3).T  # (16out, 16in)
    return (jnp.asarray(wstem_f, jnp.float32), jnp.asarray(b1, jnp.float32),
            jnp.asarray(wdw, jnp.float32), jnp.asarray(b2, jnp.float32),
            jnp.asarray(wpw, jnp.float32), jnp.asarray(b3, jnp.float32))


def stem_block0_reference(x, wstem_f, bstem, wdw, bdw, wpw, bpw):
    """Pure-XLA reference of the fused sub-graph (folded weights), NHWC out."""
    w = wstem_f.reshape(16, 3, 3, 3).transpose(2, 3, 1, 0)  # (kh,kw,ci,co)
    stem = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bstem
    stem = stem * jnp.clip(stem + 3.0, 0.0, 6.0) / 6.0

    dw = jax.lax.conv_general_dilated(
        stem, wdw[:, :, None, :], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=16)
    dw = jnp.maximum(dw + bdw, 0.0)
    pw = jnp.einsum("bhwc,oc->bhwo", dw, wpw) + bpw
    return pw + stem
