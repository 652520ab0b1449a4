"""Config-system tests (reference test_evaluate_cli.py / test_train_yolo.py
composition analogs): defaults order, group overrides, dotted overrides,
mandatory ???, env resolvers, interpolation — against the real configs/ tree."""

import os

import pytest

from cabinet_tpu.cli.common import CONFIG_DIR
from cabinet_tpu.core.config import Config, compose, to_yaml
from cabinet_tpu.core.exceptions import ConfigurationError


def test_compose_train_defaults():
    cfg = compose(CONFIG_DIR, "train")
    assert cfg.model.mode == "large"
    assert cfg.dataset.name == "cityscapes"
    assert cfg.training_config.batch_size == 4
    assert cfg.training_config.optimizer_lr_start == 5e-3
    assert cfg.validation_config.eval_scales == [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]


def test_dataset_group_override():
    cfg = compose(CONFIG_DIR, "train", ["dataset=uavid"])
    assert cfg.dataset.name == "uavid"
    assert cfg.dataset.num_classes == 8
    assert cfg.dataset.augmentation.mixup == 0.1


def test_model_group_override():
    cfg = compose(CONFIG_DIR, "train", ["model=mobilenetv3_small"])
    assert cfg.model.mode == "small"
    assert len(cfg.model.cfgs) == 11


def test_dotted_override_and_types():
    cfg = compose(CONFIG_DIR, "train", [
        "dataset=vdd",
        "training_config.batch_size=16",
        "training_config.optimizer_lr_start=0.01",
        "validation_config.flip=false",
    ])
    assert cfg.training_config.batch_size == 16
    assert cfg.training_config.optimizer_lr_start == 0.01
    assert cfg.validation_config.flip is False


def test_unknown_override_key_rejected_plus_adds():
    with pytest.raises(ConfigurationError):
        compose(CONFIG_DIR, "train", ["training_config.nope=1"])
    cfg = compose(CONFIG_DIR, "train", ["+training_config.nope=1"])
    assert cfg.training_config.nope == 1


def test_mandatory_checkpoint_path():
    cfg = compose(CONFIG_DIR, "evaluate")
    with pytest.raises(ConfigurationError, match="checkpoint_path"):
        _ = cfg.checkpoint_path
    cfg2 = compose(CONFIG_DIR, "evaluate", ["checkpoint_path=/tmp/x"])
    assert cfg2.checkpoint_path == "/tmp/x"


def test_env_resolver(monkeypatch):
    monkeypatch.setenv("UAVID_YOLO_ROOT", "/data/uavid")
    cfg = compose(CONFIG_DIR, "train", ["dataset=uavid"])
    assert cfg.dataset.dataset_path == "/data/uavid"
    monkeypatch.delenv("UAVID_YOLO_ROOT")
    cfg2 = compose(CONFIG_DIR, "train", ["dataset=uavid"])
    assert cfg2.dataset.dataset_path == ""  # default


def test_cross_key_interpolation():
    cfg = compose(CONFIG_DIR, "train", ["dataset=uavid"])
    assert "experiments/uavid/" in cfg.training_config.experiments_path
    assert "1024x1024" in cfg.training_config.experiments_path
    # nested interpolation through another interpolated key
    assert cfg.validation_config.results_path.endswith("/results")


def test_multiple_root_configs():
    cfg = compose(CONFIG_DIR, "evaluate", ["checkpoint_path=/x"])
    assert cfg.split == "val"
    assert cfg.validation_config.batch_size == 2


def test_to_yaml_roundtrip():
    cfg = compose(CONFIG_DIR, "train", ["dataset=uavid"])
    text = to_yaml(cfg)
    assert "uavid" in text
    # resolve=True expands interpolations
    resolved = to_yaml(cfg, resolve=True)
    assert "${" not in resolved


def test_config_select_and_get():
    cfg = Config({"a": {"b": {"c": 3}}})
    assert cfg.select("a.b.c") == 3
    assert cfg.select("a.x.c", "dflt") == "dflt"
    assert cfg.a.get("missing") is None


def test_remat_of_accepts_int_and_bool():
    """runtime.remat=N (partial remat: first N backbone blocks) must reach
    the model as an int — a bool() coercion would silently turn it into
    all-blocks remat (models/mobilenetv3.py block_cls_for)."""
    from cabinet_tpu.cli.common import remat_of

    def cfg_with(v):
        return compose(CONFIG_DIR, "train",
                       ["dataset=uavid", f"+runtime.remat={v}"])

    assert remat_of(cfg_with("4")) == 4
    assert remat_of(cfg_with("true")) is True
    assert remat_of(cfg_with("false")) is False
    assert remat_of(compose(CONFIG_DIR, "train", ["dataset=uavid"])) is False
    with pytest.raises(ConfigurationError):
        remat_of(cfg_with("sometimes"))
