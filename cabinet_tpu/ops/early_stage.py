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

STATUS (v5e, 1024^2, bf16, measured END-TO-END via models/fused.py
make_fused_apply — round 2): batch 16: 2.133 vs 3.000 ms/img for the XLA
path (1.41x win); batch 128: 1.266 vs 0.978 (XLA wins — at large batch XLA
tiles the small-C convs efficiently while this kernel stays VPU-issue-bound
at ~0.19 ms/img regardless of batch; glue costs: pack 0.038, out-transpose
0.059 ms/img). Use for serving at batch <=32; the batch-128 headline bench
keeps the XLA path. Next levers for the large-batch regime: pack channels
into sublanes (MXU instead of scalar FMAs), emit bf16 planes, feed
block_1's expand from planes via einsum (kills the out-transpose).
Compute-bound at ~65us/band on the VPU's instruction issue rate; measured
NOT bound by DMA (double-buffering and bf16 packing changed nothing) or
scalar loads (SMEM weights changed nothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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


def _stem_block0_kernel(x_hbm, wstem_ref, bstem_ref, wdw_ref, bdw_ref,
                        wpw_ref, bpw_ref, out_ref, x_buf, sems,
                        *, f: int, L: int):
    """One band. x_hbm: full planes array in HBM (B, 3, 2, 2, Hp2, W2);
    out block: (1, 16, f, W2).

    Input bands overlap (halo rows), so the pipeline DMAs them manually with
    two VMEM slots: wait for this band's copy (started by the previous grid
    step), kick off the next band's copy, then compute — DMA rides under the
    compute of the previous band.

    Compute is scalar-weight plane FMAs on (rows, W2) VPU tiles: the 27 stem
    patches are materialized ONCE as values (no flattened im2col —
    flattening (rows, W2) tiles forces cross-lane relayouts), then each
    output channel is a sum of scalar*plane terms.
    """
    W2 = x_hbm.shape[-1]
    rows = f + 2  # stem rows incl. +-1 dw halo
    n_bands = pl.num_programs(1)
    b, i = pl.program_id(0), pl.program_id(1)
    step = b * n_bands + i
    total = pl.num_programs(0) * n_bands
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    def band_dma(dst_slot, band_step):
        bb = jax.lax.div(band_step, n_bands)
        ii = jax.lax.rem(band_step, n_bands)
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, :, :, pl.ds(ii * f, L), :],
            x_buf.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(step == 0)
    def _():
        band_dma(slot, step).start()

    @pl.when(step + 1 < total)
    def _():
        band_dma(nxt, step + 1).start()

    band_dma(slot, step).wait()
    x = x_buf[slot].astype(jnp.float32)  # (3, 2wp, 2hp, L, W2)

    # ---- 27 stem patches, each (rows, W2) -----------------------------
    # output local h: padded rows 2h+i -> i=0: He[h], i=1: Ho[h], i=2: He[h+1]
    # original column 2w+dj: dj=-1 -> O[w-1] (shift right), 0 -> E[w], +1 -> O[w]
    patches = []
    for ci in range(3):
        row_views = (
            x[ci, :, 0, 0:rows],          # (2wp, rows, W2) i=0
            x[ci, :, 1, 0:rows],          # i=1
            x[ci, :, 0, 1:rows + 1],      # i=2
        )
        for i in range(3):
            e = row_views[i][0]
            o = row_views[i][1]
            patches.append(_shift_w(o, 1))   # dj=-1
            patches.append(e)                # dj= 0
            patches.append(o)                # dj=+1

    # ---- stem: 16 outputs x 27 scalar FMAs + hardswish ------------------
    band = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, W2), 0)
    top_bad = jnp.logical_and(band == 0, row_ids == 0)
    bot_bad = jnp.logical_and(band == pl.num_programs(1) - 1,
                              row_ids == rows - 1)
    # Halo rows outside the global image must be ZERO for the depthwise
    # stage (its conv zero-pads at the image boundary).
    halo_mask = jnp.logical_or(top_bad, bot_bad)

    stem = []     # residual source (true stem values)
    stem_dw = []  # dw input (halo-masked)
    for co in range(16):
        acc = patches[0] * wstem_ref[co, 0]
        for t in range(1, 27):
            acc = acc + patches[t] * wstem_ref[co, t]
        acc = acc + bstem_ref[co]
        acc = acc * jnp.clip(acc + 3.0, 0.0, 6.0) * (1.0 / 6.0)  # hardswish
        stem.append(acc)
        stem_dw.append(jnp.where(halo_mask, 0.0, acc))

    # ---- block0 depthwise: 9 shifted FMAs per channel + relu -----------
    dw = []
    for c in range(16):
        plane = stem_dw[c]  # (rows, W2)
        acc = None
        for i in range(3):
            row_sl = jax.lax.slice_in_dim(plane, i, i + f, axis=0)  # (f, W2)
            for dj in (-1, 0, 1):
                term = _shift_w(row_sl, -dj) * wdw_ref[i * 3 + dj + 1, c]
                acc = term if acc is None else acc + term
        dw.append(jnp.maximum(acc + bdw_ref[c], 0.0))

    # ---- block0 pointwise (16x16 scalar FMAs) + BN + residual ----------
    for co in range(16):
        acc = dw[0] * wpw_ref[co, 0]
        for ci in range(1, 16):
            acc = acc + dw[ci] * wpw_ref[co, ci]
        acc = acc + bpw_ref[co]
        res = jax.lax.slice_in_dim(stem[co], 1, 1 + f, axis=0)
        out_ref[0, co] = (acc + res).astype(out_ref.dtype)


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

    planes = pack_input_planes(x.astype(jnp.bfloat16), pad_bottom)

    grid = (B, H2 // f)
    kernel = functools.partial(_stem_block0_kernel, f=f, L=L)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Full array stays in HBM; the kernel double-buffers its own
            # overlapping band DMAs (see kernel docstring).
            pl.BlockSpec(memory_space=pltpu.ANY),
            # weights in SMEM: the kernel is dominated by scalar weight
            # loads (832 per band) — SMEM is the fast path for those.
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, f, W2), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 16, H2, W2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 2, 2, L, W2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(planes, wstem, bstem, wdw.reshape(9, 16), bdw, wpw, bpw)


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
