"""CABiNet training entry point (reference src/scripts/train.py:203-607).

Usage:
    python -m cabinet_tpu.cli.train dataset=uavid validation_config.batch_size=1
    python -m cabinet_tpu.cli.train --config-name train model=mobilenetv3_small

Full loop: data -> sharded jitted train step (OHEM x2, accumulation, EMA) ->
per-epoch val loss + EMA mIoU -> best/last checkpoints -> early stop ->
final multi-scale eval. KeyboardInterrupt saves before exiting
(reference train.py:569-580).
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from cabinet_tpu.cli import common
from cabinet_tpu.core.config import save_config
from cabinet_tpu.core.logging import RichConsoleManager, setup_logger


def train_and_evaluate(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.core.constants import OHEM_DIVISOR
    from cabinet_tpu.core.mesh import batch_sharding, make_mesh
    from cabinet_tpu.data.class_weights import compute_class_weights, get_class_pixel_counts
    from cabinet_tpu.data.loader import DataLoader
    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.train.checkpoint import CheckpointManager
    from cabinet_tpu.train.early_stopping import EarlyStopping
    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.trainer import (
        create_train_state,
        make_eval_loss_step,
        make_flush_step,
        make_train_step,
    )

    logger = setup_logger("cabinet_tpu.train",
                          cfg.training_config.experiments_path)
    tc, vc = cfg.training_config, cfg.validation_config

    common.seed_everything(cfg.runtime.seed)

    # ---- datasets ------------------------------------------------------
    ds_train, ds_val = common.build_datasets(cfg, ["train", "val"])
    common.guard_val_batch(cfg, ds_val, vc.batch_size)

    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)
    dl_train = common.make_loader(cfg, ds_train, tc.batch_size, shuffle=True,
                                  drop_last=True, num_workers=tc.num_workers,
                                  seed=cfg.runtime.seed, shard=shard)
    dl_val = DataLoader(ds_val, vc.batch_size, num_workers=vc.num_workers)

    # ---- model ----------------------------------------------------------
    n_classes = cfg.dataset.num_classes
    model = common.build_model(cfg, n_classes)
    crop_h, crop_w = cfg.dataset.cropsize
    init_x = jnp.zeros((1, crop_h, crop_w, 3), common.compute_dtype_of(cfg))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(cfg.runtime.seed),
                                           init_x, train=False))()

    # Pretrained backbone (ImageNet .pth) if present.
    bb_name = cfg.model.get("pretrained_weights")
    if bb_name:
        bb_path = Path(common.REPO_ROOT, "pretrained_backbones", bb_name)
        if bb_path.is_file():
            from cabinet_tpu.utils.torch_convert import (
                backbone_torch_to_flax,
                load_torch_checkpoint,
            )

            bb = backbone_torch_to_flax(load_torch_checkpoint(bb_path),
                                        [list(r) for r in cfg.model.cfgs])
            variables = {
                "params": {**variables["params"], "mobile": bb["params"]},
                "batch_stats": {**variables["batch_stats"],
                                "mobile": bb["batch_stats"]},
            }
            logger.info(f"Loaded pretrained backbone from {bb_path}")
        else:
            logger.info(f"No pretrained backbone at {bb_path}; random init.")

    # Cross-dataset warm start (name+shape-matched subset).
    if tc.get("pretrained_ckpt_path"):
        variables = common.warm_start(variables, tc.pretrained_ckpt_path,
                                      cfg.model.cfgs)
        logger.info(f"Warm-started from {tc.pretrained_ckpt_path}")

    # ---- class weights ---------------------------------------------------
    class_weights = None
    if float(tc.get("cls_pw", 0)) > 0:
        counts = get_class_pixel_counts(ds_train, n_classes,
                                        cfg.dataset.ignore_idx)
        class_weights = compute_class_weights(counts, float(tc.cls_pw))
        logger.info(f"Class weights: {np.round(class_weights, 3).tolist()}")

    # ---- optimizer / state ----------------------------------------------
    batches_per_epoch = len(dl_train)
    accum = int(tc.accum_steps)
    max_iter = tc.get("max_iterations") or math.ceil(
        tc.epochs * batches_per_epoch / accum)
    opt_kwargs = dict(
        lr0=float(tc.optimizer_lr_start),
        max_iter=int(max_iter),
        momentum=float(tc.optimizer_momentum),
        wd=float(tc.optimizer_weight_decay),
        power=float(tc.optimizer_power),
        warmup_steps=int(tc.warmup_steps),
        warmup_start_lr=float(tc.warmup_start_lr),
    )
    max_gn = float(tc.max_grad_norm) if tc.get("max_grad_norm") else None
    n_min = tc.batch_size * crop_h * crop_w // OHEM_DIVISOR

    # runtime.pipeline=2: pipeline-parallel training (train/pipeline.py) —
    # backbone | decode stages on device-DISJOINT sub-meshes, one loader
    # batch per microbatch, accum_steps microbatches per optimizer step
    # (update-equivalent to the fused trainer, tests/unit/test_pipeline.py).
    pp_stages = int(cfg.select("runtime.pipeline", 0) or 0)
    pipe_loop = None
    state = None
    if pp_stages:
        from cabinet_tpu.core.exceptions import ConfigurationError
        from cabinet_tpu.train.pipeline import (
            CabinetPipeline,
            PipelineTrainLoop,
            make_pipeline_meshes,
        )

        if pp_stages != 2:
            raise ConfigurationError(
                f"runtime.pipeline={pp_stages}: CABiNet pins at 2 stages "
                "(backbone | decode — stage_keys partition top-level "
                "modules and its backbone is the single 'mobile' module). "
                "The engine itself is N-stage: deep trunks use e.g. "
                "YOLOSEM_STAGE_KEYS_3 (train/pipeline.py), "
                "equivalence-tested at 3 stages.")
        if jax.process_count() > 1:
            raise ConfigurationError(
                "runtime.pipeline is single-host: make_pipeline_meshes "
                "partitions the global device list into contiguous stage "
                "sub-meshes and train_step device_puts host-local arrays, "
                "neither of which is multi-process-aware. Use DP/TP/SP for "
                "multi-host training.")
        if int(cfg.select("runtime.model_axis", 1)) > 1 or bool(
                cfg.select("runtime.spatial_axis", False)):
            raise ConfigurationError(
                "runtime.pipeline cannot combine with runtime.model_axis "
                "or runtime.spatial_axis: pipeline stages own disjoint "
                "sub-meshes (use runtime.pipeline_dp for intra-stage DP).")
        from cabinet_tpu.core.mesh import auto_data_axis

        # intra-stage DP must divide the MICROBATCH (= the loader batch);
        # runtime.pipeline_tp > 1 additionally channel-shards each stage
        # over its own model axis (PP x TP x DP; equivalence-tested in
        # tests/unit/test_pipeline.py::test_pipeline_tp_composition...)
        pp_tp = int(cfg.select("runtime.pipeline_tp", 1) or 1)
        pp_dp = int(cfg.select("runtime.pipeline_dp", 0) or 0)
        if pp_dp:
            if int(tc.batch_size) % pp_dp:
                raise ConfigurationError(
                    f"runtime.pipeline_dp={pp_dp} must divide the "
                    f"per-microbatch batch_size ({tc.batch_size})")
        else:
            pp_dp = auto_data_axis(
                int(tc.batch_size),
                max(1, len(jax.devices()) // (pp_stages * pp_tp)))
        pipe = CabinetPipeline(
            model,
            tx_factory=lambda p: build_optimizer(p, max_grad_norm=None,
                                                 **opt_kwargs),
            n_min=n_min, num_microbatches=accum,
            meshes=make_pipeline_meshes(n_stages=pp_stages, dp=pp_dp,
                                        tp=pp_tp),
            thresh=0.7, ignore_label=cfg.dataset.ignore_idx,
            class_weights=class_weights,
            compute_dtype=common.compute_dtype_of(cfg),
            max_grad_norm=max_gn, ema_decay=float(tc.ema_decay),
            ema_tau=float(tc.ema_tau))
        pipe_loop = PipelineTrainLoop(
            pipe, pipe.init_state(
                jax.device_get(variables),
                tp_min_features=int(cfg.select("runtime.tp_min_features",
                                               256))))
    else:
        tx = build_optimizer(variables["params"], max_grad_norm=max_gn,
                             **opt_kwargs)
        state = create_train_state(variables, tx,
                                   ema_decay=float(tc.ema_decay),
                                   ema_tau=float(tc.ema_tau))
        train_step = make_train_step(
            model.apply, tx, n_min=n_min, thresh=0.7,
            ignore_label=cfg.dataset.ignore_idx, class_weights=class_weights,
            accum_steps=accum, compute_dtype=common.compute_dtype_of(cfg))
        flush_step = make_flush_step(tx)
    eval_loss_step = make_eval_loss_step(
        model.apply, n_min=vc.batch_size * crop_h * crop_w // OHEM_DIVISOR,
        thresh=0.7, ignore_label=cfg.dataset.ignore_idx,
        class_weights=class_weights,
        compute_dtype=common.compute_dtype_of(cfg))

    stopper = EarlyStopping(int(tc.patience))
    ckpt = CheckpointManager(Path(tc.experiments_path))
    start_epoch, best_miou, best_loss = 0, 0.0, float("inf")

    if tc.resume:
        if pipe_loop is not None:
            restored = ckpt.restore_pipeline_full("checkpoint_last",
                                                  pipe_loop.states)
        else:
            restored = ckpt.restore_full("checkpoint_last", state)
        if restored:
            if pipe_loop is not None:
                pipe_loop.states = restored["states"]
            else:
                state = restored["state"]
            start_epoch = restored["epoch"] + 1
            best_miou = restored["best_miou"]
            best_loss = restored["best_loss"]
            stopper.load_state_dict({
                "best_fitness": restored["early_stop_best_fitness"],
                "best_epoch": restored["early_stop_best_epoch"]})
            step_now = (pipe_loop.step if pipe_loop is not None
                        else int(state.step))
            logger.info(f"Resumed from epoch {restored['epoch']} "
                        f"(step {step_now})")

    # ---- mesh ------------------------------------------------------------
    spatial_axis = bool(cfg.select("runtime.spatial_axis", False))
    pp_eval_mesh = None
    pp_tp_min = int(cfg.select("runtime.tp_min_features", 256))
    if pipe_loop is not None:
        # Pipeline stages own their sub-meshes; no global SPMD mesh exists
        # for TRAINING. Eval/val-loss run on a global mesh instead: stage
        # variables merge onto it device-to-device (never a host gather —
        # train/pipeline.py merged_variables_on), replicated by default or
        # TP-sharded when runtime.eval_model_axis > 1 (model-sharded eval
        # for models whose merged weights outgrow one device).
        from cabinet_tpu.core.mesh import make_mesh as _make_mesh

        mesh = None
        eval_tp = int(cfg.select("runtime.eval_model_axis", 1))
        pp_eval_mesh = _make_mesh(
            n_data=max(1, len(jax.devices()) // eval_tp), n_model=eval_tp)
        logger.info(f"Pipeline: {pp_stages} stages x dp{pp_dp}"
                    + (f" x tp{pp_tp}" if pp_tp > 1 else "") +
                    f"; max_iter={max_iter}; n_min={n_min}; accum={accum}; "
                    f"eval mesh {dict(pp_eval_mesh.shape)}")
    else:
        from cabinet_tpu.core.mesh import auto_data_axis, shard_model_parallel

        # runtime.model_axis > 1 shards wide layers' channels (tensor
        # parallelism, core/mesh.py trailing-feature rule) in addition to the
        # batch on the data axis; 1 (default) is pure DP — the right call for
        # reference-scale CABiNet, where the model fits in one chip's HBM.
        n_model = int(cfg.select("runtime.model_axis", 1))
        if spatial_axis:
            # spatial partitioning stripes H, not batch: use every device
            # regardless of the (possibly 1) batch size
            default_n_data = len(jax.devices()) // n_model
        else:
            default_n_data = auto_data_axis(int(tc.batch_size),
                                            len(jax.devices()) // n_model)
        n_data = int(cfg.select("runtime.mesh_data", 0)) or default_n_data
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        state = shard_model_parallel(
            state, mesh,
            min_features=int(cfg.select("runtime.tp_min_features", 256)))
        logger.info(f"Mesh: {dict(mesh.shape)}; max_iter={max_iter}; "
                    f"n_min={n_min}; accum={accum}")

    evaluator = MscEval(model.apply, n_classes,
                        ignore_label=cfg.dataset.ignore_idx,
                        scales=(1.0,), flip=False, cropsize=max(crop_h, crop_w),
                        compute_dtype=common.compute_dtype_of(cfg),
                        tile_mesh=common.eval_tile_mesh(cfg, pp_eval_mesh
                                                        or mesh),
                        pad_to=common.eval_pad_to(cfg),
                        tile_batch=common.eval_tile_batch(cfg),
                        acc_dtype=common.eval_acc_dtype(cfg))

    # runtime.spatial_axis=true shards image HEIGHT (not batch) over the
    # data axis — spatial partitioning for resolutions where batch-per-chip
    # cannot reach 1 (core/mesh.py:spatial_sharding; GSPMD halo exchanges).
    if spatial_axis:
        from cabinet_tpu.core.mesh import spatial_sharding as _shard_fn
    else:
        _shard_fn = batch_sharding

    def put(batch):
        imgs, lbs = batch[0], batch[1]
        out = (jax.device_put(imgs, _shard_fn(mesh, 4)),
               jax.device_put(lbs, _shard_fn(mesh, 3)))
        if len(batch) == 3:  # geometric='device' adds per-sample (h, w)
            out += (jax.device_put(batch[2], batch_sharding(mesh, 2)),)
        return out

    # XLA-fused photometric augmentation (runtime.device_augs=true): the
    # dataset delivered geometric-only [0,1] crops; HSV/contrast/gamma/
    # noise/cutout/mixup + normalization run jitted on device per batch.
    # runtime.device_geometric=true moves the geometric recipe on-chip too
    # (ops/geometric.py): the host ships raw u8 canvases + (h, w) and ONE
    # fused program does warp+crop+photometric+normalize per batch.
    device_augs = getattr(ds_train, "photometric", "host") == "device"
    device_geom = getattr(ds_train, "geometric", "host") == "device"
    if device_geom and spatial_axis:
        from cabinet_tpu.core.exceptions import ConfigurationError

        raise ConfigurationError(
            "runtime.device_geometric shards the batch; it cannot combine "
            "with runtime.spatial_axis (the warp gathers across the full "
            "image height). Use the host pipeline for spatial partitioning.")
    if device_augs:
        from cabinet_tpu.ops.photometric import (photometric_pipeline,
                                                 street_photometric_pipeline)

        aug_cfg = dict(ds_train.aug)
        mean, std = ds_train.MEAN, ds_train.STD
        # street (Cityscapes) datasets get the jitter/grayscale chain; the
        # aerial sets get the YOLO-style HSV + mixup chain
        photometric_fn = (street_photometric_pipeline
                          if getattr(ds_train, "RECIPE", "aerial") == "street"
                          else photometric_pipeline)

        @jax.jit
        def apply_device_augs(images, labels, key):
            return photometric_fn(images, labels, key, aug_cfg,
                                  mean=mean, std=std)

        if device_geom:
            from cabinet_tpu.ops.geometric import geometric_pipeline

            # runtime.device_geometric=shared selects the batch-shared-
            # rotation warp (~6x cheaper gather; ops/geometric.py
            # apply_geometric_shared docstring lists the divergences)
            geo_shared = (str(cfg.select("runtime.device_geometric",
                                         False)).lower() == "shared")

            @jax.jit
            def apply_device_geom_augs(canvas, label_canvas, hw, key):
                kg, kp = jax.random.split(key)
                imgs, lbs = geometric_pipeline(
                    canvas, label_canvas, hw, kg, aug_cfg, (crop_h, crop_w),
                    ignore_label=cfg.dataset.ignore_idx,
                    shared_linear=geo_shared)
                return photometric_fn(imgs, lbs, kp, aug_cfg,
                                            mean=mean, std=std)

        aug_key = jax.random.PRNGKey(cfg.runtime.seed + 1)

        # Pipeline x device-aug composition: the aug program runs on STAGE
        # 0's sub-mesh (train/pipeline.py train_step_micro) — the warped
        # batch feeds stage 0 and rides to stage 1 as data, exactly like
        # the raw image does on the host path.
        if pipe_loop is not None:
            pipe_loop.pipe.aug_fn = (apply_device_geom_augs if device_geom
                                     else apply_device_augs)
            pipe_loop.aug_key = aug_key

    # Run delimiter for metrics.jsonl: resumed/re-run trainings append to
    # the same file, so every line carries a per-run id and each run opens
    # with a marker line — consumers can split runs instead of
    # double-counting interleaved epochs. Primary-host only (same guard as
    # setup_logger's file handler): on multi-host every process runs this
    # loop and a shared experiments_path would otherwise collect N
    # interleaved copies of every line.
    import json as _json

    from cabinet_tpu.core.logging import _is_primary_host

    write_metrics = _is_primary_host()
    run_id = time.strftime("%Y%m%d-%H%M%S")
    metrics_path = Path(tc.experiments_path) / "metrics.jsonl"
    if write_metrics:
        with open(metrics_path, "a") as mf:
            mf.write(_json.dumps({"run_start": run_id,
                                  "start_epoch": start_epoch}) + "\n")

    results = {"best_miou": best_miou}
    try:
        for epoch in range(start_epoch, int(tc.epochs)):
            t0 = time.time()
            dl_train.set_epoch(epoch)
            losses = []
            last_loss = None
            for i, batch in enumerate(dl_train):
                if pipe_loop is not None:
                    # one loader batch = one microbatch; the adapter runs a
                    # pipeline step every accum_steps microbatches (raw
                    # 3-tuple batches when device_geometric is on)
                    wloss = pipe_loop.feed(*batch)
                    if wloss is not None:
                        last_loss = wloss
                else:
                    staged = put(batch)
                    if device_geom:
                        step_key = jax.random.fold_in(aug_key, int(state.step))
                        imgs, lbs = apply_device_geom_augs(*staged, step_key)
                    elif device_augs:
                        step_key = jax.random.fold_in(aug_key, int(state.step))
                        imgs, lbs = apply_device_augs(*staged, step_key)
                    else:
                        imgs, lbs = staged
                    state, loss = train_step(state, imgs, lbs)
                    last_loss = loss
                if (i + 1) % int(tc.log_iter) == 0 and last_loss is not None:
                    losses.append(float(last_loss))
                    logger.info(f"epoch {epoch} it {i + 1}/{batches_per_epoch} "
                                f"loss {losses[-1]:.4f}")
                    # don't re-log/re-sample a stale window loss at the next
                    # log point if no pipeline window completed in between
                    last_loss = None
            # trailing partial accumulation window
            if pipe_loop is not None:
                pipe_loop.flush()
            else:
                state = flush_step(state)

            # Validation loss on raw weights (pipeline: stage variables
            # merged onto the eval mesh over ICI — no host gather).
            raw_vars = (pipe_loop.pipe.merged_variables_on(
                            pipe_loop.states, pp_eval_mesh,
                            tp_min_features=pp_tp_min)
                        if pipe_loop is not None else state.variables)
            val_losses = [float(eval_loss_step(raw_vars,
                                               jnp.asarray(im), jnp.asarray(lb)))
                          for im, lb in dl_val]
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
            best_loss = min(best_loss, val_loss)

            # Per-epoch mIoU on EMA weights (1 scale, no flip).
            fitness = None
            if (epoch + 1) % int(vc.eval_every_n_epochs) == 0:
                ema_vars = (pipe_loop.pipe.merged_variables_on(
                                pipe_loop.states, pp_eval_mesh, ema=True,
                                tp_min_features=pp_tp_min)
                            if pipe_loop is not None
                            else state.ema_variables)
                res = evaluator.evaluate(ema_vars, dl_val)
                fitness = res["mIoU"]
                logger.info(f"epoch {epoch}: val_loss {val_loss:.4f} "
                            f"mIoU {fitness:.4f} ({time.time() - t0:.1f}s)")
                if fitness > best_miou:
                    best_miou = fitness
                    ckpt.save_variables(f"{tc.model_save_name}_best",
                                        ema_vars)

            # Machine-readable per-epoch metrics (observability analog of
            # the reference's console-only history): one JSON line per
            # epoch under the experiment dir, safe to tail/plot while
            # training runs.
            if write_metrics:
                with open(metrics_path, "a") as mf:
                    mf.write(_json.dumps({
                        "run": run_id,
                        "epoch": epoch,
                        "train_loss": (float(np.mean(losses)) if losses
                                       else None),
                        "val_loss": None if np.isnan(val_loss) else val_loss,
                        "mIoU": fitness,
                        "step": (pipe_loop.step if pipe_loop is not None
                                 else int(state.step)),
                        "seconds": round(time.time() - t0, 2),
                    }) + "\n")

            should_stop = stopper(epoch, fitness)
            if pipe_loop is not None:
                ckpt.save_pipeline_full("checkpoint_last", pipe_loop.states,
                                        epoch, best_miou, best_loss,
                                        stopper.state_dict())
            else:
                ckpt.save_full("checkpoint_last", state, epoch, best_miou,
                               best_loss, stopper.state_dict())
            if should_stop:
                logger.info(f"Early stopping at epoch {epoch} "
                            f"(best {stopper.best_fitness:.4f} "
                            f"@ {stopper.best_epoch})")
                break
    except KeyboardInterrupt:  # graceful final save (reference :569-580)
        logger.info("Interrupted — saving final state.")

    final_ema = (pipe_loop.ema_variables if pipe_loop is not None
                 else state.ema_variables)
    ckpt.save_variables(tc.model_save_name, final_ema)
    save_config(cfg, Path(tc.experiments_path) / "config.yaml")

    # Final multi-scale eval on EMA weights.
    final_eval = MscEval(model.apply, n_classes,
                         ignore_label=cfg.dataset.ignore_idx,
                         scales=tuple(vc.eval_scales), flip=bool(vc.flip),
                         cropsize=max(crop_h, crop_w),
                         compute_dtype=common.compute_dtype_of(cfg),
                         tile_mesh=common.eval_tile_mesh(cfg, mesh),
                         # strict native-resolution protocol for the final
                         # (reported) number; buckets only if explicitly set
                         pad_to=cfg.select("validation_config.eval_pad_to",
                                           None),
                         tile_batch=common.eval_tile_batch(cfg),
                         acc_dtype=common.eval_acc_dtype(cfg))
    res = final_eval.evaluate(final_ema, dl_val, progress=True)
    logger.info(f"Final multi-scale mIoU: {res['mIoU']:.4f} "
                f"acc {res['accuracy']:.4f}")
    results.update(best_miou=best_miou, final=res)
    return results


def main(argv: Optional[Sequence[str]] = None) -> None:
    cfg, _ = common.parse_cli(argv, "train", "Train CABiNet on TPU")
    console = RichConsoleManager.get_console()
    console.print("[info]Composed config:[/info]")
    from cabinet_tpu.core.config import to_yaml

    console.print(to_yaml(cfg))
    train_and_evaluate(cfg)


if __name__ == "__main__":
    main()
