"""Export a trained CABiNet checkpoint as a standalone serving artifact.

The reference's deployment story is "ship the checkpoint + the code"
(README "Inference"); this CLI instead emits a versioned StableHLO program
(jax.export) with weights and preprocessing baked in — see
cabinet_tpu/export.py for the artifact contract.

Usage:
    python -m cabinet_tpu.cli.export --checkpoint ck --dataset uavid \
        --out artifacts/uavid_large [--imgsz 1024] [--batch 1|b] \
        [--mode large] [--dtype bfloat16] [--platforms tpu,cpu] [--check]

``--batch b`` exports a symbolic batch dimension (one artifact, any batch).
``--check`` round-trips the artifact on this host and verifies it matches
the live model bit-for-bit (requires the current platform to be exported).
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import numpy as np


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True,
                   help="orbax dir or torch .pth")
    p.add_argument("--dataset", required=True,
                   help="dataset name (class count + normalization stats)")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--batch", default="1",
                   help="int for a fixed batch, or a dim name (e.g. 'b') "
                        "for a symbolic batch")
    p.add_argument("--family", default="cabinet",
                   choices=("cabinet", "yolosem"))
    p.add_argument("--mode", default="large", choices=("large", "small"),
                   help="CABiNet size (family=cabinet)")
    p.add_argument("--variant", default="n",
                   help="YOLO-sem variant (family=yolosem): n/s/m/l/x")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms (e.g. tpu,cpu); "
                        "default: this host's platform")
    p.add_argument("--quantize", default=None, choices=("int8", "int8dw"),
                   help="bake the int8 PTQ serving path into the artifact "
                        "(cabinet_tpu/quant.py); requires --calib")
    p.add_argument("--calib", default=None, metavar="GLOB",
                   help="calibration images for --quantize (glob of "
                        "PNG/JPG files, e.g. 'val/*.png'; activation "
                        "scales are computed through the same "
                        "normalization the artifact bakes in)")
    p.add_argument("--check", action="store_true",
                   help="deserialize and verify against the live model")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cabinet_tpu.core.logging import RichConsoleManager
    from cabinet_tpu.data.datasets import DATASET_REGISTRY
    from cabinet_tpu.data.palettes import PALETTES, trainid_palette
    from cabinet_tpu.export import (
        export_serving,
        load_artifact,
        make_serving_fn,
        save_artifact,
    )
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.checkpoint import load_any_checkpoint

    console = RichConsoleManager.get_console()
    ds_cls = DATASET_REGISTRY[args.dataset]
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    if args.family == "yolosem":
        from cabinet_tpu.models.yolosem import YOLOSem

        if args.checkpoint.endswith((".pth", ".pt")):
            # load_any_checkpoint's .pth branch converts through the
            # CABiNet layout only (train/checkpoint.py)
            raise SystemExit("--family yolosem requires an orbax checkpoint "
                             "(.pth conversion is CABiNet-only)")
        model = YOLOSem(n_classes=ds_cls.NUM_CLASSES, variant=args.variant,
                        dtype=dtype)
    else:
        model = CABiNet(n_classes=ds_cls.NUM_CLASSES, mode=args.mode,
                        dtype=dtype)
    init_x = jnp.zeros((1, args.imgsz, args.imgsz, 3), dtype)
    template = jax.jit(lambda: model.init(jax.random.PRNGKey(0), init_x,
                                          train=False))()
    loaded = load_any_checkpoint(args.checkpoint, template)
    variables = {"params": loaded["params"],
                 "batch_stats": loaded.get("batch_stats", {})}

    apply_fn = None
    if args.quantize in ("int8", "int8dw"):
        import glob as globmod

        from PIL import Image

        from cabinet_tpu.quant import collect_act_scales, make_quantized_apply

        if not args.calib:
            raise SystemExit(f"--quantize {args.quantize} requires --calib <glob>")
        paths = sorted(globmod.glob(args.calib))
        if not paths:
            raise SystemExit(f"--calib matched no files: {args.calib}")
        mean = np.asarray(ds_cls.MEAN, np.float32)
        std = np.asarray(ds_cls.STD, np.float32)
        frames = []
        for pth in paths[:16]:  # a handful of frames saturates the absmax
            im = Image.open(pth).convert("RGB").resize(
                (args.imgsz, args.imgsz), Image.BILINEAR)
            frames.append((np.asarray(im, np.float32) / 255.0 - mean) / std)
        calib = jnp.asarray(np.stack(frames), dtype)
        scales = collect_act_scales(
            model, variables, [calib],
            quantize_depthwise=(args.quantize == "int8dw"))
        apply_fn = make_quantized_apply(model, scales)
        console.print(f"[info]int8 PTQ: calibrated {len(scales)} conv sites "
                      f"on {len(frames)} frames[/info]")

    try:
        batch = int(args.batch)
    except ValueError:
        batch = args.batch  # symbolic dim name
    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_serving(model, variables,
                              mean=ds_cls.MEAN, std=ds_cls.STD,
                              imgsz=args.imgsz, batch=batch,
                              platforms=platforms, apply_fn=apply_fn)
    palette = (trainid_palette(PALETTES[args.dataset])
               if args.dataset in PALETTES else None)
    out = save_artifact(exported, args.out, {
        "family": args.family,
        "variant": args.variant if args.family == "yolosem" else None,
        "quantize": args.quantize,
        "dataset": args.dataset,
        "n_classes": ds_cls.NUM_CLASSES,
        "imgsz": args.imgsz,
        "batch": args.batch,
        "mode": args.mode,
        "dtype": args.dtype,
        "mean": list(ds_cls.MEAN),
        "std": list(ds_cls.STD),
        "palette": None if palette is None else np.asarray(palette).tolist(),
        "input": "uint8 RGB (B,H,W,3)",
        "output": "int32 class IDs (B,H,W)",
    })
    console.print(f"[info]exported serving artifact -> {out} "
                  f"(platforms={list(exported.platforms)}, "
                  f"batch={args.batch}, {args.imgsz}^2)[/info]")

    if args.check:
        serve, _meta = load_artifact(out)
        b = batch if isinstance(batch, int) else 2
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, (b, args.imgsz, args.imgsz, 3), np.uint8)
        got = np.asarray(serve(jnp.asarray(x)))
        ref_fn = jax.jit(make_serving_fn(model, variables,
                                         ds_cls.MEAN, ds_cls.STD,
                                         apply_fn=apply_fn))
        want = np.asarray(ref_fn(jnp.asarray(x)))
        if not np.array_equal(got, want):
            raise SystemExit(
                "round-trip check FAILED: artifact disagrees with the live "
                f"model on {np.sum(got != want)} / {got.size} pixels")
        console.print("[info]round-trip check passed (bit-exact vs live "
                      "model)[/info]")


if __name__ == "__main__":
    main()
