"""YOLO-sem training/eval CLI (reference src/scripts/train_yolo.py:191-295).

The reference wraps the external ultralytics package; here the in-repo Flax
YOLOSem family (models/yolosem.py) trains under the same recipe contract:
nbs gradient accumulation, one-cycle cosine LR with linear warmup, cls_pw
class weighting, mosaic/mixup/copy-paste augmentation with close_mosaic, EMA
best/last checkpoints, patience early stop. Val mode prints mIoU /
pixel-accuracy / per-class IoU plus a paste-ready metrics.json snippet
(reference train_yolo.py:243-285). runtime.pipeline=2|3 trains
pipeline-parallel over device-disjoint stage sub-meshes (train/pipeline.py
N-stage engine; 3 cuts the CSP trunk at P3 — the split the deep yolo26x
variant wants), composed with runtime.device_augs as the stage-0 aug_fn.

Usage:
    python -m cabinet_tpu.cli.train_yolo dataset=uavid
    python -m cabinet_tpu.cli.train_yolo --config-name train_yolo_vdd \
        'yolo/model@model=yolo26s-sem'
    python -m cabinet_tpu.cli.train_yolo mode=val weights=... split=test
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from cabinet_tpu.cli import common
from cabinet_tpu.core.logging import setup_logger

SUPPORTED_MODELS = {f"yolo26{v}-sem" for v in "nsmlx"}


def _build_model(cfg):
    import jax.numpy as jnp

    from cabinet_tpu.models.yolosem import build_yolosem

    name = cfg.model.model_name
    if name not in SUPPORTED_MODELS:
        print(f"[WARN] model '{name}' is not in the supported list "
              f"{sorted(SUPPORTED_MODELS)}; trying anyway.")
    return build_yolosem(cfg.dataset.num_classes, name,
                         dtype=common.compute_dtype_of(cfg))


class YoloEval:
    """Resize-to-imgsz eval (ultralytics semantic protocol): bilinear resize
    to (imgsz, imgsz), forward, argmax, nearest-resize predictions back to
    native, on-device histogram. All steps run inside one jitted program per
    native-resolution bucket."""

    def __init__(self, apply_fn, n_classes, imgsz, ignore_label, dtype):
        self.apply_fn = apply_fn
        self.n_classes = n_classes
        self.ignore_label = ignore_label
        self.imgsz = imgsz
        self.dtype = dtype
        self._progs = {}

    def _program(self, B, H, W):
        key = (B, H, W)
        if key in self._progs:
            return self._progs[key]
        import jax
        import jax.numpy as jnp

        from cabinet_tpu.eval.metrics import confusion_matrix

        apply_fn, dtype = self.apply_fn, self.dtype
        imgsz, n_classes, ignore = self.imgsz, self.n_classes, self.ignore_label

        @jax.jit
        def run(variables, images, labels):
            x = images.astype(dtype)
            if (H, W) != (imgsz, imgsz):
                # separable-matmul resize (MXU; torch-matching 2-tap
                # sampling in both directions — see models/cab.py)
                from cabinet_tpu.models.cab import resize_bilinear

                x = resize_bilinear(x, (imgsz, imgsz))
            logits, _ = apply_fn(variables, x, train=False)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if (H, W) != (imgsz, imgsz):
                preds = jax.image.resize(preds, (B, H, W), "nearest")
            return confusion_matrix(preds, labels, n_classes, ignore)

        self._progs[key] = run
        return run

    def evaluate(self, variables, dataloader):
        import jax.numpy as jnp

        from cabinet_tpu.eval.metrics import metrics_from_hist

        hist = np.zeros((self.n_classes, self.n_classes), np.float64)
        for images, labels in dataloader:
            run = self._program(*images.shape[:3])
            hist += np.asarray(run(variables, jnp.asarray(images),
                                   jnp.asarray(labels)))
        return metrics_from_hist(hist)


def train(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.core.mesh import batch_sharding, make_mesh, replicate
    from cabinet_tpu.data.class_weights import compute_class_weights, get_class_pixel_counts
    from cabinet_tpu.data.loader import DataLoader
    from cabinet_tpu.data.mosaic import MosaicSegDataset
    from cabinet_tpu.train.checkpoint import CheckpointManager
    from cabinet_tpu.train.early_stopping import EarlyStopping
    from cabinet_tpu.train.optimizer import build_sgd, warmup_cosine_schedule
    from cabinet_tpu.train.trainer import (
        create_train_state,
        make_flush_step,
        make_train_step,
    )

    tc, vc = cfg.training_config, cfg.validation_config
    logger = setup_logger("cabinet_tpu.train_yolo", tc.experiments_path)
    common.seed_everything(cfg.runtime.seed)

    imgsz = int(tc.imgsz)
    cfg.dataset.cropsize = [imgsz, imgsz]  # YOLO trains at imgsz crops
    ds_train, ds_val = common.build_datasets(cfg, ["train", "val"])
    common.guard_val_batch(cfg, ds_val, vc.batch_size)

    if bool(cfg.select("runtime.device_geometric", False)):
        from cabinet_tpu.core.exceptions import ConfigurationError

        raise ConfigurationError(
            "runtime.device_geometric is not supported by the YOLO trainer "
            "(mosaic/copy-paste compose decoded crops on the host); use "
            "runtime.device_augs for the photometric chain")
    # runtime.device_augs: the base dataset delivered geometric-only [0,1]
    # crops (photometric='device'); HSV/contrast/gamma/noise/cutout/mixup +
    # normalization run jitted per batch below. The host mosaic keeps its
    # multi-image composition but must NOT also mixup (the device chain
    # owns it — double application would square the mixup rate).
    device_augs = getattr(ds_train, "photometric", "host") == "device"
    base_aug = dict(getattr(ds_train, "aug", {}) or {})
    base_mean, base_std = ds_train.MEAN, ds_train.STD
    aug = cfg.get("augmentation")
    ds_train = MosaicSegDataset(
        ds_train,
        mosaic=float(aug.get("mosaic", 0.8)),
        mixup=0.0 if device_augs else float(aug.get("mixup", 0.1)),
        copy_paste=float(aug.get("copy_paste", 0.15)),
        ignore_label=cfg.dataset.ignore_idx,
        seed=cfg.runtime.seed,
        # device mode composes raw [0,1] crops: pad with the dataset mean
        # (in host mode zeros already ARE the mean in normalized space)
        pad_value=np.asarray(base_mean, np.float32) if device_augs else 0.0,
    )
    close_mosaic = int(aug.get("close_mosaic", 0))

    dl_train = DataLoader(ds_train, tc.batch_size, shuffle=True,
                          drop_last=True, num_workers=tc.num_workers,
                          seed=cfg.runtime.seed)
    dl_val = DataLoader(ds_val, vc.batch_size, num_workers=vc.num_workers)

    model = _build_model(cfg)
    init_x = jnp.zeros((1, imgsz, imgsz, 3), common.compute_dtype_of(cfg))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(cfg.runtime.seed),
                                           init_x, train=False))()

    class_weights = None
    if float(tc.get("cls_pw", 0)) > 0:
        counts = get_class_pixel_counts(ds_train, cfg.dataset.num_classes,
                                        cfg.dataset.ignore_idx)
        class_weights = compute_class_weights(counts, float(tc.cls_pw))

    batches = len(dl_train)
    accum = max(round(int(tc.nbs) / int(tc.batch_size)), 1)
    total_steps = math.ceil(int(tc.epochs) * batches / accum)
    warmup_steps = math.ceil(float(tc.warmup_epochs) * batches / accum)
    schedule = warmup_cosine_schedule(float(tc.lr0), float(tc.lrf),
                                      total_steps, warmup_steps)

    # device photometric chain, shared by the fused and pipeline paths
    apply_device_augs = aug_key = None
    if device_augs:
        from cabinet_tpu.ops.photometric import photometric_pipeline

        base_aug["mixup"] = float(aug.get("mixup", 0.1))

        @jax.jit
        def apply_device_augs(images, labels, key):
            return photometric_pipeline(images, labels, key, base_aug,
                                        mean=base_mean, std=base_std)

        aug_key = jax.random.PRNGKey(cfg.runtime.seed + 11)

    # runtime.pipeline=2|3: pipeline-parallel training over device-disjoint
    # stage sub-meshes (train/pipeline.py N-stage engine). 2 = trunk |
    # neck+heads; 3 additionally cuts the CSP trunk at P3 — the split the
    # deep variants (yolo26x-sem) want, where trunk activations dominate.
    pp_stages = int(cfg.select("runtime.pipeline", 0) or 0)
    pipe_loop = state = mesh = None
    if pp_stages:
        from cabinet_tpu.core.exceptions import ConfigurationError
        from cabinet_tpu.core.mesh import auto_data_axis
        from cabinet_tpu.train.pipeline import (
            YOLOSEM_STAGE_KEYS,
            YOLOSEM_STAGE_KEYS_3,
            YOLOSEM_STAGE_METHODS,
            YOLOSEM_STAGE_METHODS_3,
            CabinetPipeline,
            PipelineTrainLoop,
            make_pipeline_meshes,
        )

        if pp_stages not in (2, 3):
            raise ConfigurationError(
                f"runtime.pipeline={pp_stages}: YOLO-sem ships 2-stage "
                "(trunk | neck+heads) and 3-stage (trunk front | trunk "
                "back | neck+heads) splits")
        if jax.process_count() > 1:
            raise ConfigurationError(
                "runtime.pipeline is single-host (stage sub-meshes "
                "partition the local device list); use DP for multi-host")
        keys, methods = (
            (YOLOSEM_STAGE_KEYS, YOLOSEM_STAGE_METHODS) if pp_stages == 2
            else (YOLOSEM_STAGE_KEYS_3, YOLOSEM_STAGE_METHODS_3))
        pp_dp = int(cfg.select("runtime.pipeline_dp", 0) or 0)
        if pp_dp and int(tc.batch_size) % pp_dp:
            raise ConfigurationError(
                f"runtime.pipeline_dp={pp_dp} must divide the "
                f"per-microbatch batch_size ({tc.batch_size})")
        if not pp_dp:
            pp_dp = auto_data_axis(int(tc.batch_size),
                                   max(1, len(jax.devices()) // pp_stages))
        pipe = CabinetPipeline(
            model,
            tx_factory=lambda p: build_sgd(
                p, schedule, momentum=float(tc.optimizer_momentum),
                wd=float(tc.optimizer_weight_decay), max_grad_norm=None),
            n_min=1, num_microbatches=accum,
            meshes=make_pipeline_meshes(n_stages=pp_stages, dp=pp_dp),
            ignore_label=cfg.dataset.ignore_idx,
            class_weights=class_weights, aux_weight=0.4, loss_type="ce",
            compute_dtype=common.compute_dtype_of(cfg),
            max_grad_norm=float(tc.max_grad_norm),
            ema_decay=float(tc.ema_decay), ema_tau=float(tc.ema_tau),
            stage_keys=keys, stage_methods=methods,
            aug_fn=apply_device_augs)
        pipe_loop = PipelineTrainLoop(
            pipe, pipe.init_state(jax.device_get(variables)),
            aug_key=aug_key)
        # per-epoch eval merges stage variables device-to-device onto a
        # global mesh (train/pipeline.py merged_variables_on — never a
        # host gather; same design as cli.train's pipeline eval path)
        pp_eval_mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
        logger.info(f"Pipeline: {pp_stages} stages x dp{pp_dp}; "
                    f"accum={accum} total_steps={total_steps}")
    else:
        tx = build_sgd(variables["params"], schedule,
                       momentum=float(tc.optimizer_momentum),
                       wd=float(tc.optimizer_weight_decay),
                       max_grad_norm=float(tc.max_grad_norm))
        state = create_train_state(variables, tx,
                                   ema_decay=float(tc.ema_decay),
                                   ema_tau=float(tc.ema_tau))

        step = make_train_step(model.apply, tx, n_min=1, loss_type="ce",
                               aux_weight=0.4,
                               ignore_label=cfg.dataset.ignore_idx,
                               class_weights=class_weights,
                               accum_steps=accum,
                               compute_dtype=common.compute_dtype_of(cfg))
        flush = make_flush_step(tx)

        from cabinet_tpu.core.mesh import auto_data_axis

        mesh = make_mesh(n_data=int(cfg.select("runtime.mesh_data", 0))
                         or auto_data_axis(int(tc.batch_size)))
        state = replicate(state, mesh)
        logger.info(f"Mesh {dict(mesh.shape)}; accum={accum} "
                    f"total_steps={total_steps}")

    evaluator = YoloEval(model.apply, cfg.dataset.num_classes, imgsz,
                         cfg.dataset.ignore_idx, common.compute_dtype_of(cfg))
    ckpt = CheckpointManager(Path(tc.experiments_path))
    stopper = EarlyStopping(int(tc.patience))
    best_miou, start_epoch = 0.0, 0

    if tc.resume:
        if pipe_loop is not None:
            restored = ckpt.restore_pipeline_full("last", pipe_loop.states)
        else:
            restored = ckpt.restore_full("last", state)
        if restored:
            if pipe_loop is not None:
                pipe_loop.states = restored["states"]
            else:
                state = restored["state"]
            start_epoch = restored["epoch"] + 1
            best_miou = restored["best_miou"]
            stopper.load_state_dict({
                "best_fitness": restored["early_stop_best_fitness"],
                "best_epoch": restored["early_stop_best_epoch"]})

    def put(batch):
        imgs, lbs = batch
        return (jax.device_put(imgs, batch_sharding(mesh, 4)),
                jax.device_put(lbs, batch_sharding(mesh, 3)))

    for epoch in range(start_epoch, int(tc.epochs)):
        t0 = time.time()
        if close_mosaic and epoch >= int(tc.epochs) - close_mosaic:
            ds_train.set_mosaic(False)
        dl_train.set_epoch(epoch)
        last_loss = float("nan")
        for it, batch in enumerate(dl_train):
            if pipe_loop is not None:
                # one loader batch = one microbatch; the loop steps every
                # `accum` feeds (and folds per-microbatch aug keys itself)
                wloss = pipe_loop.feed(np.asarray(batch[0]),
                                       np.asarray(batch[1]))
                if wloss is not None:
                    last_loss = wloss
                continue
            imgs, lbs = put(batch)
            if device_augs:
                imgs, lbs = apply_device_augs(
                    imgs, lbs,
                    jax.random.fold_in(aug_key, epoch * len(dl_train) + it))
            state, loss = step(state, imgs, lbs)
            last_loss = float(loss)
        if pipe_loop is not None:
            wloss = pipe_loop.flush()
            if wloss is not None:
                last_loss = wloss
            ema_vars = pipe_loop.pipe.merged_variables_on(
                pipe_loop.states, pp_eval_mesh, ema=True)
        else:
            state = flush(state)
            ema_vars = state.ema_variables

        res = evaluator.evaluate(ema_vars, dl_val)
        fitness = res["mIoU"]
        logger.info(f"epoch {epoch}: loss {last_loss:.4f} mIoU {fitness:.4f} "
                    f"acc {res['accuracy']:.4f} ({time.time() - t0:.1f}s)")
        if fitness > best_miou:
            best_miou = fitness
            ckpt.save_variables("best", ema_vars)
        should_stop = stopper(epoch, fitness)
        if pipe_loop is not None:
            ckpt.save_pipeline_full("last", pipe_loop.states, epoch,
                                    best_miou, 0.0, stopper.state_dict())
        else:
            ckpt.save_full("last", state, epoch, best_miou, 0.0,
                           stopper.state_dict())
        if should_stop:
            logger.info(f"Early stopping at epoch {epoch}")
            break

    ckpt.save_variables("final", pipe_loop.ema_variables
                        if pipe_loop is not None else state.ema_variables)
    return {"best_miou": best_miou}


def validate(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.data.loader import DataLoader

    tc, vc = cfg.training_config, cfg.validation_config
    split = cfg.get("split", "val")
    imgsz = int(tc.imgsz)
    (dataset,) = common.build_datasets(cfg, [split])
    dl = DataLoader(dataset, vc.batch_size, num_workers=vc.num_workers)

    model = _build_model(cfg)
    init_x = jnp.zeros((1, imgsz, imgsz, 3), common.compute_dtype_of(cfg))
    template = jax.jit(lambda: model.init(jax.random.PRNGKey(0), init_x,
                                          train=False))()
    weights = cfg.get("weights") or str(Path(tc.experiments_path) / "best")
    variables = common.load_model_variables(weights, template)

    evaluator = YoloEval(model.apply, cfg.dataset.num_classes, imgsz,
                         cfg.dataset.ignore_idx, common.compute_dtype_of(cfg))
    res = evaluator.evaluate(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}, dl)

    print(f"mIoU: {res['mIoU']:.4f}  pixel-acc: {res['accuracy']:.4f}")
    for k, v in res["iou_per_class"].items():
        print(f"  {k}: {v:.4f}")
    # Paste-ready metrics.json snippet (reference train_yolo.py:275-285).
    snippet = {
        "model": cfg.model.model_name,
        "dataset": cfg.dataset.name,
        "split": split,
        "mIoU": round(res["mIoU"] * 100, 2),
        "pixel_accuracy": round(res["accuracy"] * 100, 2),
        "per_class_iou": {k: round(v * 100, 2)
                          for k, v in res["iou_per_class"].items()},
    }
    print("\nmetrics.json snippet:\n" + json.dumps(snippet, indent=2))
    return res


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg, _ = common.parse_cli(argv, "train_yolo", "Train/eval YOLO-sem on TPU")
    if cfg.get("mode", "train") == "val":
        validate(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
