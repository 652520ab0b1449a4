"""Post-training int8 quantization for MXU-bound convolutions (serving path).

The v5e MXU runs int8 matmuls at 2x the bf16 rate (measured on this chip:
the conv_out-shaped 3x3 256->256 @128^2 runs 65 us/img int8 vs 129 us/img
bf16, a 1.99x kernel-level win — NOTES.md). This module converts CABiNet
(or any Flax CNN) inference to int8 WITHOUT duplicating model code: a Flax
method interceptor (`nn.intercept_methods`) swaps every selected
`nn.Conv.__call__` for the int8 path while the surrounding model — BatchNorm,
activations, depthwise convs (VPU-bound, no int8 benefit), SE blocks,
attention — runs unchanged in bf16. The reference has no quantization
support at all; this subsystem is new capability (serving-oriented,
SURVEY §6 "production deployment" goal).

Scheme (standard symmetric PTQ):
- weights: per-output-channel symmetric scales, sw_c = max|W_c| / 127,
  quantized in-graph from the live `variables` (no converted-checkpoint
  format to manage; the quantize pass is ~0.05 ms for 9M params),
- activations: per-tensor static scales from calibration, sx = absmax / 127
  over the calibration batches (`collect_act_scales`),
- accumulation in int32 on the MXU, rescale to float as (int32 * sw_c * sx),
  bias added after rescale; everything downstream unchanged.

Usage::

    scales = collect_act_scales(model, variables, calib_batches)
    q_apply = make_quantized_apply(model, scales)   # same signature as
    logits, aux = q_apply(variables, images, train=False)  # model.apply

`q_apply` plugs directly into MscEval / the CLIs as an `apply_fn`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from cabinet_tpu.models.layers import DepthwiseConv2D

_DN = ("NHWC", "HWIO", "NHWC")


# nn.Conv module names of the class-logit projections (quality-critical,
# negligible FLOPs): CABiNet's main head `conv_out/conv_out` and aux head
# `ab/b4` (models/cabinet.py), YOLO-sem's `classifier`/`aux_classifier`
# (models/yolosem.py). Matched by the conv's own name — the inner convs of
# ConvBNReLU blocks that happen to live under a module *named* conv_out are
# called `conv` and pass.
_HEAD_CONV_NAMES = frozenset({"conv_out", "b4", "classifier", "aux_classifier"})


def default_site_predicate(path: Tuple[str, ...], kernel_shape) -> bool:
    """Quantize convs that actually ride the MXU: both channel dims >= 16.

    Skips the 3-channel stems (input range is data-dependent and the convs
    are tiny), the n_classes classifier heads (quality-critical, negligible
    FLOPs — excluded BY NAME, not by width, so they stay float even on
    >=16-class datasets like Cityscapes), and — because only `nn.Conv` is
    intercepted — all depthwise convs (`DepthwiseConv2D` is a separate
    module; VPU-bound, int8 gains nothing there).
    """
    if path and path[-1] in _HEAD_CONV_NAMES:
        return False
    kh, kw, cin, cout = kernel_shape
    return cin >= 16 and cout >= 16


def _norm_pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(int(e) for e in v)


def _norm_padding(p):
    if isinstance(p, str):
        return p
    if isinstance(p, int):
        return [(p, p), (p, p)]
    out = []
    for e in p:
        out.append((e, e) if isinstance(e, int) else tuple(int(x) for x in e))
    return out


def _conv_geometry(mod: nn.Conv):
    return dict(
        window_strides=_norm_pair(mod.strides or 1),
        padding=_norm_padding(mod.padding),
        rhs_dilation=_norm_pair(mod.kernel_dilation or 1),
        feature_group_count=int(mod.feature_group_count),
    )


def _is_conv_call(mod, context) -> bool:
    return isinstance(mod, nn.Conv) and context.method_name == "__call__"


def _is_dw_call(mod, context) -> bool:
    return (isinstance(mod, DepthwiseConv2D)
            and context.method_name == "__call__")


def dw_site_predicate(path: Tuple[str, ...], kernel_shape) -> bool:
    """Quantize depthwise convs wide enough to be bandwidth-bound.

    Depthwise convs never ride the MXU (per-channel spatial filters), so
    there is no compute win — the point of quantizing them is BANDWIDTH:
    between the backbone's quantized 1x1 expand and project convs sits a
    depthwise 3x3, and if it consumes/produces bf16 the inverted-residual
    activations are materialized at 2 bytes across the hop. With the dw
    hop also int8, XLA's epilogue fusions write int8 activations across
    the whole expand->dw->project chain (the "int8 activation chain"
    lever, NOTES r4 int8 section).
    """
    return kernel_shape[3] >= 16


def collect_act_scales(
    model: nn.Module,
    variables: Any,
    batches: Iterable[jnp.ndarray],
    site_predicate: Callable = default_site_predicate,
    quantize_depthwise: bool = False,
    **apply_kwargs,
) -> Dict[str, float]:
    """Run calibration forwards, returning {conv_path: act_scale}.

    The observer records max|input| per quantizable conv inside the SAME
    jitted trace as the forward (no eager re-execution), reduced with `max`
    across batches; scales are absmax / 127. With `quantize_depthwise`,
    `DepthwiseConv2D` sites passing `dw_site_predicate` are calibrated too
    (the int8-activation-chain mode — see dw_site_predicate).
    """

    def observed(variables, x):
        stash: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            quantizable = False
            if _is_conv_call(mod, context):
                kshape = tuple(mod.variables["params"]["kernel"].shape)
                quantizable = site_predicate(mod.path, kshape)
            elif quantize_depthwise and _is_dw_call(mod, context):
                kshape = tuple(mod.variables["params"]["kernel"].shape)
                quantizable = dw_site_predicate(mod.path, kshape)
            if quantizable:
                key = "/".join(mod.path)
                absmax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                stash[key] = jnp.maximum(stash.get(key, 0.0), absmax)
            return next_fn(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, train=False, **apply_kwargs)
        return stash

    observed_jit = jax.jit(observed)
    maxima: Dict[str, float] = {}
    for x in batches:
        batch_maxima = jax.device_get(observed_jit(variables, x))
        for key, val in batch_maxima.items():
            maxima[key] = max(maxima.get(key, 0.0), float(val))
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in maxima.items()}


def _quantized_conv(mod: nn.Conv, x: jnp.ndarray, act_scale: float) -> jnp.ndarray:
    w = mod.variables["params"]["kernel"].astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)  # (out,)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)),
                  -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, wq,
        dimension_numbers=lax.conv_dimension_numbers(x.shape, wq.shape, _DN),
        preferred_element_type=jnp.int32,
        **_conv_geometry(mod))
    y = y.astype(jnp.float32) * (sw * act_scale)
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def _quantized_dw(mod: DepthwiseConv2D, x: jnp.ndarray,
                  act_scale: float) -> jnp.ndarray:
    """int8 depthwise conv: per-channel weight scales, int32 accumulation.

    Kernel layout (kH, kW, 1, C) — max over (0,1,2) IS per-channel here.
    No bias (DepthwiseConv2D has none). Geometry mirrors the module's own
    lowering (models/layers.py:85-98) exactly.
    """
    w = mod.variables["params"]["kernel"].astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / act_scale)),
                  -127, 127).astype(jnp.int8)
    channels = x.shape[-1]
    k = mod.kernel_size
    pad = mod.padding if mod.padding is not None else (k - 1) // 2
    y = lax.conv_general_dilated(
        xq, wq, (mod.stride, mod.stride), [(pad, pad), (pad, pad)],
        dimension_numbers=lax.conv_dimension_numbers(x.shape, wq.shape, _DN),
        feature_group_count=channels,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sw * act_scale)
    return y.astype(mod.dtype)


def make_quantized_apply(
    model: nn.Module,
    act_scales: Dict[str, float],
) -> Callable:
    """`apply(variables, x, **kw)` with int8 convs at every calibrated site.

    Drop-in for `model.apply` in inference contexts (MscEval, cli.infer,
    bench). Sites absent from `act_scales` run the normal bf16 path, so
    partial quantization (e.g. decoder-only) is just a filtered dict.
    Depthwise sites appear in `act_scales` only when calibration ran with
    `quantize_depthwise=True`.
    """

    def apply(variables, x, **apply_kwargs):
        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            if _is_conv_call(mod, context):
                key = "/".join(mod.path)
                scale = act_scales.get(key)
                if scale is not None:
                    return _quantized_conv(mod, args[0], scale)
            elif _is_dw_call(mod, context):
                key = "/".join(mod.path)
                scale = act_scales.get(key)
                if scale is not None:
                    return _quantized_dw(mod, args[0], scale)
            return next_fn(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, **apply_kwargs)

    return apply


def quantization_report(
    model: nn.Module,
    variables: Any,
    act_scales: Dict[str, float],
    x: jnp.ndarray,
    **apply_kwargs,
) -> Dict[str, float]:
    """Quality summary of int8 vs the float path on a probe batch:
    argmax agreement (fraction of pixels with identical prediction) and
    mean |delta| on the final logits."""
    ref, _ = jax.jit(lambda v, x: model.apply(v, x, **apply_kwargs)
                     )(variables, x)
    q_apply = make_quantized_apply(model, act_scales)
    quant, _ = jax.jit(lambda v, x: q_apply(v, x, **apply_kwargs)
                       )(variables, x)
    ref = ref.astype(jnp.float32)
    quant = quant.astype(jnp.float32)
    agree = jnp.mean((jnp.argmax(ref, -1) == jnp.argmax(quant, -1))
                     .astype(jnp.float32))
    return {
        "argmax_agreement": float(agree),
        "mean_abs_logit_delta": float(jnp.mean(jnp.abs(ref - quant))),
        "max_abs_logit_delta": float(jnp.max(jnp.abs(ref - quant))),
        "n_quantized_convs": len(act_scales),
    }
