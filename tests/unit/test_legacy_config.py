"""Legacy pre-Hydra JSON migration (reference legacy/train_*.json, still read
by the reference's cityscapes __main__ smoke test, cityscapes.py:177-199)."""

import json

import pytest

from cabinet_tpu.cli.common import CONFIG_DIR, parse_cli
from cabinet_tpu.core.exceptions import ConfigurationError
from cabinet_tpu.core.legacy_config import legacy_to_overrides, load_legacy_config

REPO_ROOT = CONFIG_DIR.parent


def test_shipped_uavid_legacy_maps_onto_modern_tree():
    cfg = load_legacy_config(REPO_ROOT / "legacy" / "train_uavid.json")
    assert cfg.dataset.name == "uavid"
    assert cfg.dataset.num_classes == 8
    assert cfg.model.mode == "small"  # from backbone_weights filename
    assert cfg.training_config.batch_size == 12
    # the reference's 'warmup_stemps' typo-key maps to warmup_steps
    assert cfg.training_config.warmup_steps == 3000
    assert cfg.training_config.max_iterations == 120000
    assert cfg.training_config.log_iter == 200  # msg_iterations
    assert cfg.validation_config.batch_size == 1
    assert cfg.validation_config.flip is True
    # empty dataset_path keeps the modern env resolver, not ''
    raw = cfg.dataset._data["dataset_path"]
    assert "oc.env" in raw


def test_shipped_citys_legacy_selects_large_and_cityscapes():
    cfg = load_legacy_config(REPO_ROOT / "legacy" / "train_citys.json")
    assert cfg.dataset.name == "cityscapes"
    assert cfg.dataset.num_classes == 19
    assert cfg.model.mode == "large"
    assert cfg.training_config.warmup_steps == 4000
    assert cfg.validation_config.eval_scales == [0.5, 0.75, 1, 1.25, 1.5, 1.75]


def test_extra_overrides_apply_after_legacy(tmp_path):
    cfg = load_legacy_config(
        REPO_ROOT / "legacy" / "train_uavid.json",
        extra_overrides=["training_config.batch_size=2", "dataset=vdd"],
    )
    assert cfg.training_config.batch_size == 2
    assert cfg.dataset.name == "vdd"


def test_cli_flag_routes_through_legacy_loader():
    cfg, args = parse_cli(
        ["--legacy-config", str(REPO_ROOT / "legacy" / "train_citys.json"),
         "training_config.num_workers=0"],
        "train", "test")
    assert args.legacy_config is not None
    assert cfg.dataset.name == "cityscapes"
    assert cfg.training_config.num_workers == 0


def test_unknown_legacy_key_rejected(tmp_path):
    data = json.loads((REPO_ROOT / "legacy" / "train_uavid.json").read_text())
    data["training_config"]["definitely_not_a_key"] = 1
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(data))
    with pytest.raises(ConfigurationError, match="unknown legacy key"):
        load_legacy_config(p)


def test_missing_section_and_bad_json_rejected(tmp_path):
    p = tmp_path / "nosection.json"
    p.write_text(json.dumps({"dataset_config": {"name": "uavid"}}))
    with pytest.raises(ConfigurationError, match="missing required section"):
        load_legacy_config(p)
    q = tmp_path / "bad.json"
    q.write_text("{not json")
    with pytest.raises(ConfigurationError, match="not valid JSON"):
        load_legacy_config(q)
    with pytest.raises(ConfigurationError, match="not found"):
        load_legacy_config(tmp_path / "absent.json")


def test_overrides_round_trip_values():
    data = json.loads((REPO_ROOT / "legacy" / "train_uavid.json").read_text())
    ovs = legacy_to_overrides(data)
    assert "dataset=uavid" in ovs
    assert "model=mobilenetv3_small" in ovs
    assert "training_config.optimizer_weight_decay=0.0005" in ovs
    assert 'validation_config.flip=true' in ovs
    # floats render in decimal form (str(1e-5)='1e-05' would YAML-parse back
    # as a string — ADVICE r2); the composed value must be a float again
    assert "training_config.warmup_start_lr=0.00001" in ovs


def test_legacy_floats_compose_as_floats():
    cfg = load_legacy_config(REPO_ROOT / "legacy" / "train_uavid.json")
    assert isinstance(cfg.training_config.warmup_start_lr, float)
    assert cfg.training_config.warmup_start_lr == pytest.approx(1e-5)


def test_legacy_list_floats_compose_as_floats(tmp_path):
    """Small floats INSIDE list values (eval_scales) must also render in
    decimal form — json.dumps(1e-05) emits '1e-05', which YAML 1.1 parses
    back as a string (the scalar-float trap, nested)."""
    data = json.loads((REPO_ROOT / "legacy" / "train_uavid.json").read_text())
    data["validation_config"]["eval_scales"] = [1e-05, 0.75, 1.0]
    p = tmp_path / "legacy.json"
    p.write_text(json.dumps(data))
    cfg = load_legacy_config(p)
    scales = list(cfg.validation_config.eval_scales)
    assert all(isinstance(s, float) for s in scales), scales
    assert scales[0] == pytest.approx(1e-05)
