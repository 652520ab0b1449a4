"""Standalone checkpoint evaluation (reference src/scripts/evaluate.py:270-368).

Usage:
    python -m cabinet_tpu.cli.evaluate checkpoint_path=... dataset=uavid \
        validation_config.batch_size=1
    python -m cabinet_tpu.cli.evaluate checkpoint_path=... split=test \
        validation_config.eval_scales=[1.0] validation_config.flip=false
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from cabinet_tpu.cli import common
from cabinet_tpu.core.exceptions import ConfigurationError
from cabinet_tpu.core.logging import RichConsoleManager


def evaluate_checkpoint(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.eval.evaluator import MscEval

    split = cfg.get("split", "val")
    if split == "train":
        # Train mode applies augmentation — metrics would be corrupted
        # (reference evaluate.py:280-286).
        raise ConfigurationError(
            "split=train is not supported for evaluation; use val or test.")

    vc = cfg.validation_config
    (dataset,) = common.build_datasets(cfg, [split])
    common.guard_val_batch(cfg, dataset, vc.batch_size)
    dl = common.make_loader(cfg, dataset, vc.batch_size,
                            num_workers=vc.num_workers)

    n_classes = cfg.dataset.num_classes
    model = common.build_model(cfg, n_classes)
    crop = max(cfg.dataset.cropsize)
    init_x = jnp.zeros((1, crop, crop, 3), common.compute_dtype_of(cfg))
    template = jax.jit(lambda: model.init(jax.random.PRNGKey(0), init_x,
                                          train=False))()
    variables = common.load_model_variables(cfg.checkpoint_path, template)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    # int8 PTQ serving path (opt-in): calibrate activation scales on the
    # first val batches, then run MXU convs in int8 (cabinet_tpu/quant.py).
    # `+runtime.quantize=int8` on the CLI; `int8dw` additionally quantizes
    # the depthwise hops (int8 activation chain, quant.dw_site_predicate).
    base_apply = model.apply
    quantize = str(cfg.select("runtime.quantize", ""))
    if quantize in ("int8", "int8dw"):
        from cabinet_tpu.quant import collect_act_scales, make_quantized_apply

        n_calib = int(cfg.select("runtime.calib_batches", 2))
        calib = []
        for i, (images, _) in enumerate(dl):
            if i >= n_calib:
                break
            # crop to the training cropsize: calibration needs activation
            # RANGES, not full frames, and one fixed shape = one compile
            img = jnp.asarray(images, common.compute_dtype_of(cfg))
            calib.append(img[:, :crop, :crop, :])
        scales = collect_act_scales(model, variables, calib,
                                    quantize_depthwise=(quantize == "int8dw"))
        base_apply = make_quantized_apply(model, scales)
        RichConsoleManager.get_console().print(
            f"[info]int8 PTQ: {len(scales)} convs quantized, "
            f"calibrated on {len(calib)} batches[/info]")

    # Fused Pallas decoder tail (+7.3% measured, exact bf16 architecture
    # math): auto = on for TPU when the crop's /8 grid is supported.
    # Composes with int8 (the tail convs never run under the fused path,
    # so quantization applies to the branch/backbone sites only).
    apply_fn = base_apply
    fused_tail = str(cfg.select("runtime.fused_tail", "auto")).lower()
    if fused_tail in ("auto", "true"):
        from cabinet_tpu.ops.decoder_tail import fused_tail_supported

        s8 = crop // 8
        # bf16 only: the kernels' VMEM budget assumes 2-byte feat tiles
        # (f32 triples the halo blocks past the 16 MB limit).
        why = None
        if not fused_tail_supported(s8, s8, n_classes):
            why = (f"crop/8 grid {s8}x{s8} with {n_classes} classes is "
                   "outside kernel support")
        elif common.compute_dtype_of(cfg) != jnp.bfloat16:
            why = "requires runtime.compute_dtype=bfloat16"
        elif fused_tail != "true" and jax.default_backend() != "tpu":
            why = "auto mode enables only on TPU"
        if why is None:
            from cabinet_tpu.models import make_fused_tail_apply

            fwd = make_fused_tail_apply(model, variables,
                                        apply_fn=base_apply)
            apply_fn = lambda v, x, train=False: fwd(x)  # noqa: E731
            RichConsoleManager.get_console().print(
                "[info]fused Pallas decoder tail enabled[/info]")
        elif fused_tail == "true":
            # The user EXPLICITLY asked for the fused path — a silent XLA
            # fallback would mislabel any measurement taken (ADVICE r2).
            raise ConfigurationError(
                "runtime.fused_tail=true but the fused decoder tail cannot "
                f"be enabled: {why}. Drop the setting (or fix the config) to "
                "run the XLA path.")

    evaluator = MscEval(apply_fn, n_classes,
                        ignore_label=cfg.dataset.ignore_idx,
                        scales=tuple(vc.eval_scales), flip=bool(vc.flip),
                        cropsize=crop,
                        compute_dtype=common.compute_dtype_of(cfg),
                        tile_mesh=common.eval_tile_mesh(cfg),
                        # strict native-resolution protocol by default;
                        # opt into bucketing with validation_config.eval_pad_to
                        pad_to=cfg.select("validation_config.eval_pad_to",
                                          None),
                        tile_batch=common.eval_tile_batch(cfg),
                        acc_dtype=common.eval_acc_dtype(cfg))
    return evaluator.evaluate(variables, dl, progress=True)


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg, _ = common.parse_cli(argv, "evaluate", "Evaluate a CABiNet checkpoint")
    console = RichConsoleManager.get_console()
    res = evaluate_checkpoint(cfg)
    console.print(f"[metric]mIoU: {res['mIoU']:.4f}  "
                  f"accuracy: {res['accuracy']:.4f}[/metric]")
    for k, v in res["iou_per_class"].items():
        console.print(f"  {k}: {v:.4f}")
    print(json.dumps({"mIoU": res["mIoU"], "accuracy": res["accuracy"],
                      "iou_per_class": res["iou_per_class"]}))


if __name__ == "__main__":
    main()
