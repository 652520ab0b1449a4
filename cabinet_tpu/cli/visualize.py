"""Prediction visualizer (reference src/scripts/visualize.py:24-248).

Dumps input / colorized prediction / overlay / colorized GT PNGs for up to
VISUALIZATION_SAMPLE_LIMIT samples of a split, using multi-scale + flip
inference. Works for any registered dataset (the reference was
Cityscapes-only; palettes come from data/palettes.py).

Usage:
    python -m cabinet_tpu.cli.visualize checkpoint_path=... dataset=uavid \
        +num_samples=10 +output_dir=viz
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from cabinet_tpu.cli import common
from cabinet_tpu.core.constants import VISUALIZATION_SAMPLE_LIMIT
from cabinet_tpu.core.logging import setup_logger


def visualize(cfg) -> Path:
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.data.loader import DataLoader
    from cabinet_tpu.data.palettes import PALETTES, colorize_mask
    from cabinet_tpu.eval.evaluator import MscEval

    logger = setup_logger("cabinet_tpu.visualize")
    vc = cfg.validation_config
    split = cfg.get("split", "val")
    (dataset,) = common.build_datasets(cfg, [split])

    n_classes = cfg.dataset.num_classes
    model = common.build_model(cfg, n_classes)
    crop = max(cfg.dataset.cropsize)
    init_x = jnp.zeros((1, crop, crop, 3), common.compute_dtype_of(cfg))
    template = jax.jit(lambda: model.init(jax.random.PRNGKey(0), init_x,
                                          train=False))()
    variables = common.load_model_variables(cfg.checkpoint_path, template)

    evaluator = MscEval(model.apply, n_classes,
                        ignore_label=cfg.dataset.ignore_idx,
                        scales=tuple(vc.eval_scales), flip=bool(vc.flip),
                        cropsize=crop,
                        compute_dtype=common.compute_dtype_of(cfg))

    classes = PALETTES[cfg.dataset.name]
    out_dir = Path(cfg.get("output_dir", "visualizations"))
    out_dir.mkdir(parents=True, exist_ok=True)
    limit = min(int(cfg.get("num_samples", VISUALIZATION_SAMPLE_LIMIT)),
                VISUALIZATION_SAMPLE_LIMIT)

    mean = np.asarray(dataset.MEAN, np.float32)
    std = np.asarray(dataset.STD, np.float32)

    dl = DataLoader(dataset, batch_size=1, num_workers=2)
    for i, (img, lb) in enumerate(dl):
        if i >= limit:
            break
        preds, _ = evaluator.evaluate_batch(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}, img, lb)
        pred = preds[0]
        rgb = np.clip((img[0] * std + mean) * 255, 0, 255).astype(np.uint8)
        pred_rgb = colorize_mask(pred, classes)
        gt_rgb = colorize_mask(lb[0], classes)
        overlay = (0.5 * rgb + 0.5 * pred_rgb).astype(np.uint8)

        Image.fromarray(rgb).save(out_dir / f"{i:04d}_input.png")
        Image.fromarray(pred_rgb).save(out_dir / f"{i:04d}_pred.png")
        Image.fromarray(overlay).save(out_dir / f"{i:04d}_overlay.png")
        Image.fromarray(gt_rgb).save(out_dir / f"{i:04d}_gt.png")
        logger.info(f"saved sample {i}")
    return out_dir


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg, _ = common.parse_cli(argv, "evaluate", "Visualize predictions")
    out = visualize(cfg)
    print(f"Visualizations written to {out}")


if __name__ == "__main__":
    main()
