"""PyTorch <-> Flax checkpoint conversion for CABiNet.

The reference publishes checkpoints as torch state dicts (full-model EMA dicts,
`checkpoint_last.pth` training dicts, and pretrained MobileNetV3 backbone .pth
files — reference train.py:54-123, mobilenetv3.py:207-235). This module builds
an explicit key mapping between those state dicts and this framework's Flax
variables, handling:

- conv kernels: torch OIHW -> flax HWIO (transpose 2,3,1,0) — the same
  transpose maps torch depthwise (C,1,kH,kW) onto flax
  feature_group_count kernels (kH,kW,1,C),
- linear layers (SE fc): torch (out,in) -> flax (in,out),
- batchnorm: weight/bias -> scale/bias params; running_mean/var ->
  batch_stats mean/var,
- the classifier head of the backbone .pth files is skipped (the reference
  never uses it either, mobilenetv3.py:214-216).

The mapping is generated structurally from the cfg table, so both directions
(torch->flax for loading HF checkpoints, flax->torch for emitting
reference-compatible checkpoints) share one table.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Sequence, Tuple, Union

import numpy as np

from cabinet_tpu.core.exceptions import ModelLoadError
from cabinet_tpu.models.layers import make_divisible

# Entry kinds describe the tensor transform between frameworks.
CONV = "conv"        # OIHW <-> HWIO
LINEAR = "linear"    # (out,in) <-> (in,out)
BN = "bn"            # 4 tensors: weight,bias,running_mean,running_var
PARAM = "param"      # copied as-is (e.g. CAB gamma, biases)

MapEntry = Tuple[str, Tuple[str, ...], str]
# (torch_prefix, flax_path (under params/ or batch_stats/), kind)


def _bn(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[MapEntry]:
    return [(torch_prefix, flax_path, BN)]


def _conv(torch_key: str, flax_path: Tuple[str, ...]) -> List[MapEntry]:
    return [(torch_key, flax_path, CONV)]


def mobilenetv3_mapping(cfgs: Sequence[Sequence[float]],
                        prefix: str = "mobile.",
                        flax_prefix: Tuple[str, ...] = ("mobile",)) -> List[MapEntry]:
    """Mapping for the MobileNetV3 trunk (torch Sequential indices -> names)."""
    entries: List[MapEntry] = []
    p, fp = prefix, flax_prefix

    # Stem: features.0 = Sequential(conv, bn, act)
    entries += _conv(f"{p}features.0.0.weight", fp + ("stem", "kernel"))
    entries += _bn(f"{p}features.0.1", fp + ("stem_bn",))

    input_channel = make_divisible(16, 8)
    for i, (k, t, c, use_se, use_hs, s) in enumerate(cfgs):
        tp = f"{p}features.{i + 1}.conv"
        bp = fp + (f"block_{i}",)
        hidden = make_divisible(input_channel * t, 8)
        out_ch = make_divisible(c, 8)
        if input_channel == hidden:
            # [0]=dw,[1]=bn,[2]=act,[3]=SE|Id,[4]=pw,[5]=bn
            entries += _conv(f"{tp}.0.weight", bp + ("dw", "kernel"))
            entries += _bn(f"{tp}.1", bp + ("dw_bn",))
            if use_se:
                entries += _se(f"{tp}.3", bp + ("se",))
            entries += _conv(f"{tp}.4.weight", bp + ("project", "kernel"))
            entries += _bn(f"{tp}.5", bp + ("project_bn",))
        else:
            # [0]=pw,[1]=bn,[2]=act,[3]=dw,[4]=bn,[5]=SE|Id,[6]=act,[7]=pw,[8]=bn
            entries += _conv(f"{tp}.0.weight", bp + ("expand", "kernel"))
            entries += _bn(f"{tp}.1", bp + ("expand_bn",))
            entries += _conv(f"{tp}.3.weight", bp + ("dw", "kernel"))
            entries += _bn(f"{tp}.4", bp + ("dw_bn",))
            if use_se:
                entries += _se(f"{tp}.5", bp + ("se",))
            entries += _conv(f"{tp}.7.weight", bp + ("project", "kernel"))
            entries += _bn(f"{tp}.8", bp + ("project_bn",))
        input_channel = out_ch

    # Final 1x1: conv = Sequential(conv, bn, act)
    entries += _conv(f"{p}conv.0.weight", fp + ("head", "kernel"))
    entries += _bn(f"{p}conv.1", fp + ("head_bn",))
    return entries


def _se(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[MapEntry]:
    """SELayer: fc = Sequential(Linear, ReLU, Linear, HardSigmoid)."""
    return [
        (f"{torch_prefix}.fc.0.weight", flax_path + ("fc1", "kernel"), LINEAR),
        (f"{torch_prefix}.fc.0.bias", flax_path + ("fc1", "bias"), PARAM),
        (f"{torch_prefix}.fc.2.weight", flax_path + ("fc2", "kernel"), LINEAR),
        (f"{torch_prefix}.fc.2.bias", flax_path + ("fc2", "bias"), PARAM),
    ]


def _conv_bn_relu(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[MapEntry]:
    """Reference ConvBNReLU: .conv + .bn children."""
    return (_conv(f"{torch_prefix}.conv.weight", flax_path + ("conv", "kernel"))
            + _bn(f"{torch_prefix}.bn", flax_path + ("bn",)))


def _dwconv_block(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[MapEntry]:
    """Reference cab.DWConv: .block.0 conv, .block.1 bn."""
    return (_conv(f"{torch_prefix}.block.0.weight", flax_path + ("conv", "kernel"))
            + _bn(f"{torch_prefix}.block.1", flax_path + ("bn",)))


def cab_mapping(torch_prefix: str, flax_path: Tuple[str, ...]) -> List[MapEntry]:
    """ContextAggregationBlock mapping."""
    e: List[MapEntry] = []
    ga_t, ga_f = f"{torch_prefix}.global_attn", flax_path + ("global_attn",)
    e += _conv(f"{ga_t}.to_query.0.weight", ga_f + ("to_query", "kernel"))
    e += _bn(f"{ga_t}.to_query.1", ga_f + ("query_bn",))
    e += _conv(f"{ga_t}.to_key.0.weight", ga_f + ("to_key", "kernel"))
    e += _bn(f"{ga_t}.to_key.1", ga_f + ("key_bn",))
    e += _conv(f"{ga_t}.to_value.weight", ga_f + ("to_value", "kernel"))
    e += _conv(f"{ga_t}.psp_key.project.weight", ga_f + ("psp_key", "project", "kernel"))
    e += _conv(f"{ga_t}.psp_value.project.weight", ga_f + ("psp_value", "project", "kernel"))
    e += _conv(f"{ga_t}.project_out.weight", ga_f + ("project_out", "kernel"))
    la_t, la_f = f"{torch_prefix}.local_attn", flax_path + ("local_attn",)
    for i in range(3):
        e += _dwconv_block(f"{la_t}.refine.{i}", la_f + (f"refine_{i}",))
    e.append((f"{torch_prefix}.gamma", flax_path + ("gamma",), PARAM))
    return e


def cabinet_mapping(cfgs: Sequence[Sequence[float]]) -> List[MapEntry]:
    """Full CABiNet state-dict mapping (reference cabinet.py module tree)."""
    e: List[MapEntry] = []
    e += mobilenetv3_mapping(cfgs)

    # Spatial branch.
    for name in ("conv1", "conv2", "conv3", "conv_out"):
        e += _conv_bn_relu(f"sb.{name}", ("sb", name))

    # Attention branch.
    e += _conv("ab.conva.0.weight", ("ab", "conva", "kernel"))
    e += _bn("ab.conva.1", ("ab", "conva_bn"))
    e += cab_mapping("ab.a2block", ("ab", "a2block"))
    e += _conv("ab.convb.weight", ("ab", "convb", "kernel"))
    e.append(("ab.convb.bias", ("ab", "convb", "bias"), PARAM))
    e += _conv("ab.b1.weight", ("ab", "b1", "kernel"))
    e += _bn("ab.b2", ("ab", "b2"))
    e += _conv("ab.b4.weight", ("ab", "b4", "kernel"))
    e.append(("ab.b4.bias", ("ab", "b4", "bias"), PARAM))

    # FFM.
    e += _conv_bn_relu("ffm.convblk", ("ffm", "convblk"))
    e += _conv("ffm.conv1.weight", ("ffm", "conv1", "kernel"))
    e += _conv("ffm.conv2.weight", ("ffm", "conv2", "kernel"))

    # Output head.
    e += _conv_bn_relu("conv_out.conv", ("conv_out", "conv"))
    e += _conv("conv_out.conv_out.weight", ("conv_out", "conv_out", "kernel"))
    return e


# ---------------------------------------------------------------------------
# Tree helpers
# ---------------------------------------------------------------------------


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _get_path(tree: Dict[str, Any], path: Tuple[str, ...]) -> np.ndarray:
    node = tree
    for part in path:
        node = node[part]
    return node


def _np(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def torch_to_flax(
    state_dict: Dict[str, Any],
    cfgs: Sequence[Sequence[float]],
    strict: bool = True,
) -> Dict[str, Any]:
    """Convert a reference CABiNet torch state dict to Flax variables.

    Returns {"params": ..., "batch_stats": ...}. With strict=False, missing
    torch keys are skipped (warm-start / partial loads, reference
    train.py:148-176) and extra keys ignored.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    consumed = set()

    for torch_key, flax_path, kind in cabinet_mapping(cfgs):
        if kind == BN:
            tensors = {
                "scale": f"{torch_key}.weight",
                "bias": f"{torch_key}.bias",
                "mean": f"{torch_key}.running_mean",
                "var": f"{torch_key}.running_var",
            }
            missing = [k for k in tensors.values() if k not in sd]
            if missing:
                if strict:
                    raise ModelLoadError(f"Missing BN tensors: {missing}")
                continue
            _set_path(params, flax_path + ("scale",), sd[tensors["scale"]])
            _set_path(params, flax_path + ("bias",), sd[tensors["bias"]])
            _set_path(stats, flax_path + ("mean",), sd[tensors["mean"]])
            _set_path(stats, flax_path + ("var",), sd[tensors["var"]])
            consumed.update(tensors.values())
            continue

        if torch_key not in sd:
            if strict:
                raise ModelLoadError(f"Missing torch key: {torch_key}")
            continue
        tensor = sd[torch_key]
        consumed.add(torch_key)
        if kind == CONV:
            tensor = tensor.transpose(2, 3, 1, 0)
        elif kind == LINEAR:
            tensor = tensor.transpose(1, 0)
        _set_path(params, flax_path, tensor)

    if strict:
        leftovers = [
            k for k in sd
            if k not in consumed
            and not k.startswith("mobile.classifier")
            and "num_batches_tracked" not in k
        ]
        if leftovers:
            raise ModelLoadError(f"Unconsumed torch keys: {leftovers[:8]}"
                                 f"{'...' if len(leftovers) > 8 else ''}")
    return {"params": params, "batch_stats": stats}


def flax_to_torch(
    variables: Dict[str, Any],
    cfgs: Sequence[Sequence[float]],
) -> Dict[str, np.ndarray]:
    """Convert Flax CABiNet variables to a reference-compatible torch state dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    for torch_key, flax_path, kind in cabinet_mapping(cfgs):
        if kind == BN:
            out[f"{torch_key}.weight"] = _np(_get_path(params, flax_path + ("scale",)))
            out[f"{torch_key}.bias"] = _np(_get_path(params, flax_path + ("bias",)))
            out[f"{torch_key}.running_mean"] = _np(_get_path(stats, flax_path + ("mean",)))
            out[f"{torch_key}.running_var"] = _np(_get_path(stats, flax_path + ("var",)))
            continue
        tensor = _np(_get_path(params, flax_path))
        if kind == CONV:
            tensor = tensor.transpose(3, 2, 0, 1)
        elif kind == LINEAR:
            tensor = tensor.transpose(1, 0)
        out[torch_key] = tensor
    return out


def backbone_torch_to_flax(
    state_dict: Dict[str, Any],
    cfgs: Sequence[Sequence[float]],
) -> Dict[str, Any]:
    """Convert a pretrained MobileNetV3 backbone .pth (keys like `features.*`)
    into variables for the `mobile` submodule (classifier keys skipped,
    mirroring reference mobilenetv3.py:214-216)."""
    prefixed = {f"mobile.{k}": v for k, v in state_dict.items()
                if not k.startswith("classifier")}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for torch_key, flax_path, kind in mobilenetv3_mapping(cfgs):
        sub_path = flax_path[1:]  # strip leading "mobile"
        if kind == BN:
            params_scale = _np(prefixed[f"{torch_key}.weight"])
            _set_path(params, sub_path + ("scale",), params_scale)
            _set_path(params, sub_path + ("bias",), _np(prefixed[f"{torch_key}.bias"]))
            _set_path(stats, sub_path + ("mean",), _np(prefixed[f"{torch_key}.running_mean"]))
            _set_path(stats, sub_path + ("var",), _np(prefixed[f"{torch_key}.running_var"]))
            continue
        tensor = _np(prefixed[torch_key])
        if kind == CONV:
            tensor = tensor.transpose(2, 3, 1, 0)
        elif kind == LINEAR:
            tensor = tensor.transpose(1, 0)
        _set_path(params, sub_path, tensor)
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    """Load a torch .pth; accepts raw state dicts and full training checkpoints
    (reference evaluate.py:259-267 accepts both kinds)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ModelLoadError("torch is required to read .pth checkpoints") from e
    try:
        blob = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        blob = torch.load(str(path), map_location="cpu", weights_only=False)  # nosec
    if isinstance(blob, dict) and "model_state" in blob:
        blob = blob.get("ema_state") or blob["model_state"]
    if not isinstance(blob, dict):
        raise ModelLoadError(f"Unrecognized checkpoint format: {path}")
    return blob


def merge_variables(base: Dict[str, Any], loaded: Dict[str, Any],
                    match_shapes: bool = True) -> Dict[str, Any]:
    """Overlay `loaded` onto `base` variables, keeping base entries where the
    loaded tree lacks them or shapes mismatch (cross-dataset warm start,
    reference train.py:148-176: name+shape-matched tensors only)."""
    import jax

    def merge(b: Any, l: Any) -> Any:
        if isinstance(b, dict):
            return {k: merge(b[k], l[k]) if isinstance(l, dict) and k in l else b[k]
                    for k in b}
        if l is None:
            return b
        if match_shapes and tuple(np.shape(l)) != tuple(np.shape(b)):
            return b
        return np.asarray(l, dtype=np.asarray(b).dtype) if not hasattr(b, "dtype") \
            else jax.numpy.asarray(l, dtype=b.dtype)

    return merge(base, loaded)
