"""Fused FFM + output-head Pallas kernels (decoder tail, inference).

The decoder tail — FFM (concat -> 1x1 ConvBNReLU -> SE-style channel
attention -> feat*atten+feat) followed by the output head (3x3 ConvBNReLU ->
1x1 classifier), reference cabinet.py:132-172 — is 25% of CABiNet inference
time at 1024^2 (NOTES.md module breakdown) and is HBM-bandwidth-bound: XLA
materializes ~5 full (S,S,256) intermediates (~100 MB/img of traffic at
S=128 against ~13 MB of obligatory input/output).

Two kernels bound the traffic to the obligatory reads/writes:

  K1 (grid B x S/16 row tiles): feat = relu(BN(conv1x1(concat(fsp, fcp))))
     with the concat REMOVED algebraically (two matmuls against the split
     weight), plus per-tile channel sums for the SE global mean. Writes feat
     once.
  glue (XLA, tiny): mean -> SE bottleneck -> scale = sigmoid(..)+1 (folding
     feat*atten+feat into one per-channel scale).
  K2 (grid B): the whole (S,S,256) feat plane resident in VMEM (8.4 MB at
     S=128); per row tile: scale, zero-pad halo, 3x3 conv as 9 shifted
     MXU matmuls with f32 accumulation, bias+relu, classifier matmul
     (output channels zero-padded to 128 lanes). Reads feat once, writes
     only the logits.

BN is folded into the conv weights on the host (`fold_tail_params`), like
ops/early_stage.py. Inference-only; training uses the XLA path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 16
LANES = 128


def _row_tile(s: int) -> int:
    """Largest divisor of S in [4, ROW_TILE] (0 if none): S=128 -> 16,
    S=90 (720^2 inputs, AeroScapes serving) -> 15, S=40 -> 10."""
    for rt in range(min(ROW_TILE, s // 2), 3, -1):
        if s % rt == 0:
            return rt
    return 0


def _fold_bn(kernel: jnp.ndarray, bn_params: Any, bn_stats: Any,
             eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BatchNorm into a bias-free conv: returns (W_folded, bias)."""
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return kernel * scale, bias


def fold_tail_params(variables: Any, dtype: Any = jnp.bfloat16
                     ) -> Dict[str, jnp.ndarray]:
    """Fold FFM + head params/batch_stats into kernel operands (host, once)."""
    p, s = variables["params"], variables["batch_stats"]

    w1, b1 = _fold_bn(p["ffm"]["convblk"]["conv"]["kernel"],
                      p["ffm"]["convblk"]["bn"], s["ffm"]["convblk"]["bn"])
    w1 = w1.reshape(w1.shape[2], w1.shape[3])  # (384, 256)
    c_sp = 384 - 256  # fsp channels (concat order [fsp, fcp], cabinet.py)

    w3, b3 = _fold_bn(p["conv_out"]["conv"]["conv"]["kernel"],
                      p["conv_out"]["conv"]["bn"], s["conv_out"]["conv"]["bn"])
    wc = p["conv_out"]["conv_out"]["kernel"]  # (1,1,256,n_classes)
    n_classes = wc.shape[-1]
    if n_classes > LANES:
        raise ValueError(
            f"fused decoder tail supports at most {LANES} classes "
            f"(classifier is padded into one {LANES}-lane block); got "
            f"{n_classes} — use the XLA path")
    wc_pad = jnp.zeros((wc.shape[2], LANES), wc.dtype)
    wc_pad = wc_pad.at[:, :n_classes].set(wc.reshape(wc.shape[2], n_classes))

    return {
        "w1_sp": w1[:c_sp].astype(dtype),          # (128, 256)
        "w1_cp": w1[c_sp:].astype(dtype),          # (256, 256)
        "b1": b1.astype(jnp.float32),              # (256,)
        "w_se1": p["ffm"]["conv1"]["kernel"].reshape(256, -1).astype(jnp.float32),
        "w_se2": p["ffm"]["conv2"]["kernel"].reshape(-1, 256).astype(jnp.float32),
        "w3": w3.reshape(9, w3.shape[2], w3.shape[3]).astype(dtype),  # (9,256,256)
        "b3": b3.astype(jnp.float32),              # (256,)
        "wc": wc_pad.astype(dtype),                # (256, 128)
        "n_classes": n_classes,
    }


def _k1_kernel(fsp_ref, fcp_ref, w1sp_ref, w1cp_ref, b1_ref,
               feat_ref, sums_ref):
    rows, S = fsp_ref.shape[1], fsp_ref.shape[2]
    x_sp = fsp_ref[0].reshape(rows * S, -1)
    x_cp = fcp_ref[0].reshape(rows * S, -1)
    y = jax.lax.dot_general(x_sp, w1sp_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(x_cp, w1cp_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b1_ref[0], 0.0)
    feat_ref[0] = y.reshape(rows, S, -1).astype(feat_ref.dtype)
    # the sums block (1, n_rt, 256) is revisited across the r grid steps
    # (Mosaic requires the last two block dims be full or 8/128-aligned)
    sums_ref[0, pl.program_id(1)] = jnp.sum(y, axis=0)


def _k2_kernel(prev_ref, cur_ref, next_ref, scale_ref, w3_ref, b3_ref,
               wc_ref, out_ref):
    """One row tile per grid step. The 3x3 halo comes from three views of
    feat (prev/cur/next row tiles via clamped index maps — whole-plane
    blocks double-buffer to 24 MB and overflow the 16 MB VMEM); the edge
    steps replace the out-of-image halo rows with zeros."""
    r = pl.program_id(1)
    n_rt = pl.num_programs(1)
    rt = cur_ref.shape[1]  # row-tile height (16, or a divisor of S like 15)
    S = cur_ref.shape[2]
    C = cur_ref.shape[3]
    s = scale_ref[0, 0].astype(cur_ref.dtype)  # (256,) channel scale
    b3 = b3_ref[0]

    top = prev_ref[0, rt - 1:rt]                      # last row of prev tile
    bot = next_ref[0, 0:1]                            # first row of next tile
    top = jnp.where(r == 0, jnp.zeros_like(top), top)
    bot = jnp.where(r == n_rt - 1, jnp.zeros_like(bot), bot)
    rows = jnp.concatenate([top, cur_ref[0], bot], axis=0)  # (rt+2, S, C)
    rows = rows * s  # feat*atten + feat == feat * (sigmoid(..)+1)
    padded = jnp.pad(rows, ((0, 0), (1, 1), (0, 0)))  # (rt+2, S+2, C)

    acc = jnp.zeros((rt * S, C), jnp.float32)
    for di in range(3):
        for dj in range(3):
            window = padded[di:di + rt, dj:dj + S, :]
            acc = acc + jax.lax.dot_general(
                window.reshape(rt * S, C), w3_ref[di * 3 + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b3, 0.0).astype(cur_ref.dtype)
    logits = jax.lax.dot_general(y, wc_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    out_ref[0] = logits.reshape(rt, S, LANES).astype(out_ref.dtype)


def fused_tail_supported(s_h: int, s_w: int, n_classes: int = None) -> bool:
    """Square /8 grid with a workable row tile (a divisor of S in [4,16] —
    1024^2 -> S=128/rt 16, 720^2 -> S=90/rt 15), a plane inside the VMEM
    budget, and (when given) n_classes within the 128-lane classifier pad
    (`fold_tail_params` writes wc into a (256, LANES) block — more classes
    would shape-error instead of falling back, ADVICE r2)."""
    rt = _row_tile(s_h)
    return (s_h == s_w and rt > 0 and s_h >= 2 * rt
            and s_h * s_w * 256 * 2 <= 12 * 2 ** 20
            and (n_classes is None or n_classes <= LANES))


def fused_ffm_head(fsp: jnp.ndarray, fcp: jnp.ndarray,
                   folded: Dict[str, jnp.ndarray],
                   interpret: bool = False) -> jnp.ndarray:
    """(B,S,S,128) + (B,S,S,256) -> (B,S,S,n_classes) logits, fused."""
    B, S, _, _ = fsp.shape
    if not fused_tail_supported(S, fcp.shape[2], folded["n_classes"]):
        raise ValueError(f"fused tail unsupported for S={S}")
    rt = _row_tile(S)
    n_rt = S // rt
    dtype = fcp.dtype

    feat, sums = pl.pallas_call(
        _k1_kernel,
        grid=(B, n_rt),
        in_specs=[
            pl.BlockSpec((1, rt, S, 128), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt, S, 256), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 256), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rt, S, 256), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rt, 256), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, S, 256), dtype),
            jax.ShapeDtypeStruct((B, n_rt, 256), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * S * 384 * 256,
            bytes_accessed=B * S * S * (128 + 256 + 256) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fsp, fcp, folded["w1_sp"], folded["w1_cp"], folded["b1"][None])

    # SE glue (tiny): mean over H*W -> bottleneck -> sigmoid(+1) scale.
    mean = jnp.sum(sums, axis=1) / float(S * S)           # (B, 256)
    a = jnp.maximum(mean @ folded["w_se1"], 0.0)          # (B, 64)
    scale = jax.nn.sigmoid(a @ folded["w_se2"]) + 1.0     # (B, 256)

    feat_tile = lambda fn: pl.BlockSpec(
        (1, rt, S, 256), lambda b, r: (b, fn(r), 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _k2_kernel,
        grid=(B, n_rt),
        in_specs=[
            feat_tile(lambda r: jnp.maximum(r - 1, 0)),
            feat_tile(lambda r: r),
            feat_tile(lambda r: jnp.minimum(r + 1, n_rt - 1)),
            pl.BlockSpec((1, 1, 256), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 256, 256), lambda b, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, LANES), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, S, LANES),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, S, LANES), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * S * 256 * (9 * 256 + LANES),
            bytes_accessed=B * S * S * (3 * 256 + LANES) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(feat, feat, feat, scale[:, None].astype(jnp.float32), folded["w3"],
      folded["b3"][None], folded["wc"])

    return out[..., :folded["n_classes"]]
