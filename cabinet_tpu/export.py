"""AOT serving export: self-contained StableHLO artifacts via jax.export.

The reference deploys by shipping a torch checkpoint plus the Python model
code (README "Inference" section); every serving host must reproduce the
exact package environment. A TPU-native framework can do better: `jax.export`
serializes the *compiled program* — weights baked in as constants,
preprocessing (uint8 -> normalized dtype) fused into the graph — to a
versioned StableHLO artifact that any JAX runtime (same or newer jaxlib,
CPU or TPU) executes without the model code, the checkpoint format, or even
this package installed.

Artifact layout (a directory)::

    <out>/serving.jaxexport   -- serialized jax.export.Exported bytes
    <out>/metadata.json       -- dataset, classes, palette, resolution,
                                 dtype, platforms, calling-convention version

The serving function is ``uint8 (B,H,W,3) RGB -> int32 (B,H,W) class IDs``:
normalization (dataset mean/std), dtype cast, forward, and argmax all live
inside the one exported program, so the host-side contract is "feed pixels,
read masks".

Batch handling: a concrete ``batch`` exports a fixed-shape program (fastest;
matches how the serving CLIs jit); ``batch="b"`` exports a symbolic batch
dimension so one artifact serves any batch size (XLA re-specializes per
concrete shape at run time).

Fused Pallas kernels are intentionally NOT exported: Mosaic custom calls
carry no cross-version stability guarantee, and the artifact's value is
portability. The plain-XLA path is parity-exact (tests/parity) and XLA
re-fuses it aggressively at AOT-compile time on the target.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Sequence, Union

import numpy as np

ARTIFACT_NAME = "serving.jaxexport"
METADATA_NAME = "metadata.json"


def make_serving_fn(model: Any, variables: Any,
                    mean: Sequence[float], std: Sequence[float],
                    apply_fn: Any = None):
    """uint8 RGB batch -> int32 class-ID masks, all-in-graph.

    Mirrors the host-side chain of cli.infer.Segmenter (_preprocess ->
    forward -> argmax) so an exported artifact and the live CLI agree
    bit-for-bit at the same dtype. `apply_fn` overrides `model.apply`
    (e.g. the int8 PTQ interception from cabinet_tpu/quant.py — the
    quantize/dequantize arithmetic serializes like any other ops).
    """
    import jax.numpy as jnp

    dtype = model.dtype
    mean_arr = jnp.asarray(np.asarray(mean, np.float32))
    std_arr = jnp.asarray(np.asarray(std, np.float32))
    apply_fn = apply_fn or model.apply

    def serve(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = ((x - mean_arr) / std_arr).astype(dtype)
        logits, _ = apply_fn(variables, x, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return serve


def export_serving(model: Any, variables: Any, *,
                   mean: Sequence[float], std: Sequence[float],
                   imgsz: int = 1024,
                   batch: Union[int, str] = 1,
                   platforms: Optional[Sequence[str]] = None,
                   apply_fn: Any = None):
    """Build and export the serving function; returns jax.export.Exported."""
    import jax
    from jax import export as jexport

    serve = jax.jit(make_serving_fn(model, variables, mean, std,
                                    apply_fn=apply_fn))
    if isinstance(batch, str):
        (b,) = jexport.symbolic_shape(batch)
        shape = (b, imgsz, imgsz, 3)
    else:
        shape = (int(batch), imgsz, imgsz, 3)
    spec = jax.ShapeDtypeStruct(shape, np.uint8)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(serve, **kwargs)(spec)


def save_artifact(exported: Any, out_dir: Union[str, Path],
                  metadata: dict) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / ARTIFACT_NAME).write_bytes(exported.serialize())
    meta = dict(metadata)
    meta.setdefault("calling_convention_version",
                    exported.calling_convention_version)
    meta.setdefault("platforms", list(exported.platforms))
    (out / METADATA_NAME).write_text(json.dumps(meta, indent=2) + "\n")
    return out


def load_artifact(path: Union[str, Path]):
    """(callable, metadata): deserialize and wrap in jax.jit for execution.

    The callable takes a uint8 (B,H,W,3) array and returns int32 (B,H,W)
    masks; only jax + jaxlib are required on the serving host.
    """
    import jax
    from jax import export as jexport

    p = Path(path)
    if p.is_dir():
        blob = (p / ARTIFACT_NAME).read_bytes()
        meta_file = p / METADATA_NAME
        metadata = (json.loads(meta_file.read_text())
                    if meta_file.exists() else {})
    else:
        blob = p.read_bytes()
        # a bare artifact file usually still sits next to its metadata.json
        # (the cli.export layout) — losing the metadata silently would make
        # consumers fall back to unrelated defaults (imgsz, batch, palette)
        sibling = p.parent / METADATA_NAME
        metadata = (json.loads(sibling.read_text())
                    if sibling.exists() else {})
    exported = jexport.deserialize(blob)
    return jax.jit(exported.call), metadata
