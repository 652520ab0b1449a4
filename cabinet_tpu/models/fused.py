"""Fused-early-stage inference wrapper for CABiNet.

Wires the Pallas stem+block_0 kernel (ops/early_stage.py) into CABiNet's
inference forward: BN is folded into the kernel weights once on the host,
the kernel computes the first subgraph (44% of XLA network time at 1024^2,
measured 1.4x faster), and the model's `forward_from_early` method runs the
rest over the same parameter tree. Matches the reference subgraph at
src/models/mobilenetv3.py:176-182 reached from src/models/cabinet.py:218-220.

Training and non-aligned shapes use the standard XLA path (the kernel is
inference-only: BN folded, no batch-stat updates).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp

from cabinet_tpu.models.cabinet import CABiNet
from cabinet_tpu.ops.early_stage import (
    F_BAND,
    fold_stem_block0_params,
    fused_stem_block0,
)


def fused_early_supported(shape: Tuple[int, ...],
                          interpret: bool = False) -> bool:
    """The kernel requires even H/W and a whole number of row bands; the
    COMPILED (TPU) path additionally needs the lane dimension W/2 to be a
    multiple of 128 (Mosaic slices must be lane-tile aligned — a 1024x1024
    input gives W/2 = 512 lanes). Interpret mode (tests/CPU) has no lane
    constraint."""
    H, W = shape[1], shape[2]
    if H % 2 or W % 2:
        return False
    if not interpret and (W // 2) % 128 != 0:
        return False
    h2 = H // 2
    return h2 % min(F_BAND, h2) == 0


def make_fused_apply(
    model: CABiNet, variables: Any, interpret: bool = None
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Return `forward(images) -> (final_logits, aux_logits)` using the fused
    Pallas early stage. `variables` must contain trained/converted
    batch_stats (they are folded into the kernel weights here, once).
    interpret=None auto-selects Pallas interpret mode off-TPU (the kernel
    only compiles for TPU; other backends run it interpreted)."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from cabinet_tpu.models.mobilenetv3 import default_cfgs

    cfgs = model.cfgs if model.cfgs is not None else default_cfgs(model.mode)
    k, t, c, use_se, _, s = cfgs[0]
    if not (int(k) == 3 and float(t) == 1 and int(c) == 16
            and not use_se and int(s) == 1):
        # The kernel hardcodes the large-table block_0 (3x3 dw, no expand,
        # no SE, stride 1, 16ch). Small-mode block_0 (SE, stride 2) falls
        # back to the XLA path.
        raise ValueError(
            "fused early stage supports the MobileNetV3-Large block_0 only, "
            f"got cfg row {cfgs[0]}"
        )
    folded = fold_stem_block0_params(
        variables["params"]["mobile"], variables["batch_stats"]["mobile"]
    )

    def forward(images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if not fused_early_supported(images.shape, interpret=interpret):
            raise ValueError(
                f"fused early stage unsupported for input {images.shape}; "
                "use the standard apply path"
            )
        planes = fused_stem_block0(images, *folded, interpret=interpret)
        early = planes.transpose(0, 2, 3, 1).astype(model.dtype)
        return model.apply(variables, images, early, train=False,
                           method=CABiNet.forward_from_early)

    return forward


def make_fused_tail_apply(
    model: CABiNet, variables: Any, interpret: bool = None,
    apply_fn: Callable = None, use_early: bool = False
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Return `forward(images) -> (final_logits, aux_logits)` with the
    decoder tail (FFM + output head, 25% of inference time) fused into two
    Pallas kernels (ops/decoder_tail.py). BN folds once on the host.
    Inference-only; requires the /8 grid to satisfy fused_tail_supported.
    `apply_fn` overrides model.apply for the branch computation (e.g. the
    int8-quantized apply from cabinet_tpu.quant — the tail convs never run
    in this path, so only backbone/branch sites matter). `use_early=True`
    additionally routes the stem+block_0 through the fused early-stage
    kernel (the batch>=8 serving regime, 1.41x on that subgraph)."""
    import jax

    from cabinet_tpu.models.cab import resize_bilinear
    from cabinet_tpu.ops.decoder_tail import (
        fold_tail_params,
        fused_ffm_head,
        fused_tail_supported,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if apply_fn is None:
        apply_fn = model.apply
    folded = fold_tail_params(variables, dtype=model.dtype)
    early_folded = None
    if use_early:
        early_folded = fold_stem_block0_params(
            variables["params"]["mobile"], variables["batch_stats"]["mobile"])

    def branches(m, x, train):
        mob = m.mobile(x, train)
        feat_sb = m.sb(x, train)
        low_res, aux = m.ab(mob, train)
        return feat_sb, low_res, aux

    def branches_from_early(m, x, early, train):
        mob = m.mobile.tail(early, train)
        feat_sb = m.sb(x, train)
        low_res, aux = m.ab(mob, train)
        return feat_sb, low_res, aux

    def forward(images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H, W = images.shape[1:3]
        if early_folded is not None and fused_early_supported(
                images.shape, interpret=interpret):
            planes = fused_stem_block0(images, *early_folded,
                                       interpret=interpret)
            early = planes.transpose(0, 2, 3, 1).astype(model.dtype)
            feat_sb, low_res, aux = apply_fn(variables, images, early,
                                             train=False,
                                             method=branches_from_early)
        else:
            feat_sb, low_res, aux = apply_fn(variables, images, train=False,
                                             method=branches)
        sb_hw = feat_sb.shape[1:3]
        if not fused_tail_supported(*sb_hw, folded["n_classes"]):
            raise ValueError(
                f"fused decoder tail unsupported for /8 grid {sb_hw}; "
                "use the standard apply path")
        fcp = resize_bilinear(low_res, sb_hw)
        final_small = fused_ffm_head(feat_sb, fcp, folded,
                                     interpret=interpret)
        final = resize_bilinear(final_small, (H, W))
        aux_full = resize_bilinear(resize_bilinear(aux, sb_hw), (H, W))
        return final, aux_full

    return forward
