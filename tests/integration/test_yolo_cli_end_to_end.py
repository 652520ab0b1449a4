"""End-to-end YOLO-sem CLI: compose train_yolo config -> 2-epoch train on a
tiny synthetic tree (with nbs accumulation, mosaic close, EMA checkpoints)
-> val mode consumes the result. Proves the in-repo YOLO family trains
through the same loop the reference delegates to ultralytics
(reference src/scripts/train_yolo.py:223-285)."""

import numpy as np

from cabinet_tpu.cli.common import CONFIG_DIR
from cabinet_tpu.core.config import compose

from tests.integration.test_cli_end_to_end import _make_tree


def test_train_yolo_cli_end_to_end(tmp_path, monkeypatch):
    from cabinet_tpu.cli.train_yolo import train, validate

    data_root = _make_tree(tmp_path / "data", n=4, size=(48, 48))
    exp = tmp_path / "exp"
    monkeypatch.setenv("UAVID_YOLO_ROOT", str(data_root))

    overrides = [
        "dataset=uavid",
        "training_config.epochs=2",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.imgsz=32",
        "training_config.nbs=4",  # accum=2: exercises window + flush
        "training_config.cls_pw=0.5",
        "training_config.patience=0",
        f"training_config.experiments_path={exp}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "runtime.compute_dtype=float32",
        "augmentation.close_mosaic=1",  # flips mosaic off for the last epoch
    ]
    cfg = compose(CONFIG_DIR, "train_yolo", overrides)
    assert cfg.model.model_name == "yolo26n-sem"
    res = train(cfg)
    assert np.isfinite(res["best_miou"])
    assert (exp / "last").exists()   # full resume checkpoint
    assert (exp / "final").exists()  # EMA variables

    val_cfg = compose(CONFIG_DIR, "train_yolo", overrides + [
        "mode=val", f"weights={exp / 'final'}"])
    res2 = validate(val_cfg)
    assert 0.0 <= res2["mIoU"] <= 1.0
    assert 0.0 <= res2["accuracy"] <= 1.0
    assert len(res2["iou_per_class"]) == cfg.dataset.num_classes


def test_train_yolo_device_augs(tmp_path, monkeypatch):
    """runtime.device_augs=true through the YOLO trainer: the base dataset
    delivers geometric-only [0,1] crops, host mosaic/copy-paste compose
    them (its own mixup disabled — the device chain owns mixup), and the
    photometric chain + normalization run jitted per batch. Guards the
    silent-unnormalized-training failure mode."""
    from cabinet_tpu.cli.train_yolo import train
    from cabinet_tpu.core.exceptions import ConfigurationError

    data_root = _make_tree(tmp_path / "data", n=4, size=(48, 48))
    exp = tmp_path / "exp_dev"
    monkeypatch.setenv("UAVID_YOLO_ROOT", str(data_root))
    overrides = [
        "dataset=uavid",
        "training_config.epochs=1",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.imgsz=32",
        "training_config.nbs=2",
        "training_config.cls_pw=0",
        "training_config.patience=0",
        f"training_config.experiments_path={exp}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "runtime.compute_dtype=float32",
        "+runtime.device_augs=true",
    ]
    cfg = compose(CONFIG_DIR, "train_yolo", overrides)
    res = train(cfg)
    assert np.isfinite(res["best_miou"])
    assert (exp / "last").exists()

    # device_geometric is host-mosaic-incompatible and must fail loudly
    import pytest

    cfg2 = compose(CONFIG_DIR, "train_yolo", overrides + [
        "+runtime.device_geometric=true"])
    with pytest.raises(ConfigurationError, match="mosaic"):
        train(cfg2)


def test_train_yolo_pipeline_3stage(tmp_path, monkeypatch):
    """runtime.pipeline=3 through the YOLO CLI: the N-stage engine's
    trunk-front | trunk-back | neck+heads split trains end to end on the
    virtual mesh (device_augs composed — the photometric chain runs as the
    pipeline's stage-0 aug_fn), writes per-stage checkpoints, and resumes."""
    import pytest

    from cabinet_tpu.cli.train_yolo import train
    from cabinet_tpu.core.exceptions import ConfigurationError

    data_root = _make_tree(tmp_path / "data", n=4, size=(48, 48))
    exp = tmp_path / "exp_pp3"
    monkeypatch.setenv("UAVID_YOLO_ROOT", str(data_root))
    base = [
        "dataset=uavid",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.imgsz=32",
        "training_config.nbs=4",  # accum=2: window + trailing flush
        "training_config.cls_pw=0.5",
        "training_config.patience=0",
        f"training_config.experiments_path={exp}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "runtime.compute_dtype=float32",
        "+runtime.device_augs=true",
        "+runtime.pipeline=3",
    ]
    res = train(compose(CONFIG_DIR, "train_yolo",
                        base + ["training_config.epochs=1"]))
    assert np.isfinite(res["best_miou"])
    assert (exp / "last").exists()
    assert (exp / "last.meta.json").exists()

    # resume restores the per-stage states
    res2 = train(compose(CONFIG_DIR, "train_yolo",
                         base + ["training_config.epochs=2",
                                 "training_config.resume=true"]))
    assert np.isfinite(res2["best_miou"])

    with pytest.raises(ConfigurationError, match="pipeline"):
        train(compose(CONFIG_DIR, "train_yolo",
                      base + ["training_config.epochs=1",
                              "runtime.pipeline=5"]))


def test_train_yolo_resume_continues(tmp_path, monkeypatch):
    """Interrupt-and-resume through the YOLO CLI: a 1-epoch run resumed to 2
    epochs restores step/EMA/stopper state (reference train_yolo.py:82-98)."""
    from cabinet_tpu.cli.train_yolo import train

    data_root = _make_tree(tmp_path / "data", n=4, size=(48, 48))
    exp = tmp_path / "exp"
    monkeypatch.setenv("UAVID_YOLO_ROOT", str(data_root))

    base = [
        "dataset=uavid",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.imgsz=32",
        "training_config.nbs=2",
        "training_config.cls_pw=0",
        "training_config.patience=0",
        f"training_config.experiments_path={exp}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "runtime.compute_dtype=float32",
    ]
    train(compose(CONFIG_DIR, "train_yolo",
                  base + ["training_config.epochs=1"]))
    res = train(compose(CONFIG_DIR, "train_yolo",
                        base + ["training_config.epochs=2",
                                "training_config.resume=true"]))
    assert np.isfinite(res["best_miou"])
