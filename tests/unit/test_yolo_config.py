"""YOLO pipeline config composition (reference test_train_yolo.py analogs:
model allowlist, variant roots, augmentation deltas, nbs accumulation)."""

import pytest

from cabinet_tpu.cli.common import CONFIG_DIR
from cabinet_tpu.cli.train_yolo import SUPPORTED_MODELS
from cabinet_tpu.core.config import compose


def test_supported_model_allowlist():
    assert SUPPORTED_MODELS == {f"yolo26{v}-sem" for v in "nsmlx"}


def test_default_root():
    cfg = compose(CONFIG_DIR, "train_yolo")
    assert cfg.model.model_name == "yolo26n-sem"
    assert cfg.dataset.name == "uavid"
    assert cfg.training_config.nbs == 64
    assert cfg.augmentation.mosaic == 0.8
    assert cfg.augmentation.close_mosaic == 15
    assert cfg.mode == "train"


def test_vdd_variant_inherits_and_overrides():
    cfg = compose(CONFIG_DIR, "train_yolo_vdd")
    assert cfg.dataset.name == "vdd"
    assert cfg.dataset.num_classes == 7
    assert cfg.training_config.epochs == 150      # variant delta
    assert cfg.training_config.nbs == 64          # inherited
    assert cfg.augmentation.mosaic == 1.0         # heavier aug
    assert cfg.validation_config.batch_size == 2  # uniform res => batched val


def test_aeroscapes_variant():
    cfg = compose(CONFIG_DIR, "train_yolo_aeroscapes")
    assert cfg.dataset.name == "aeroscapes"
    assert cfg.training_config.imgsz == 896
    assert cfg.validation_config.batch_size == 4


def test_model_group_at_key_override():
    cfg = compose(CONFIG_DIR, "train_yolo_vdd",
                  ["yolo/model@model=yolo26x-sem"])
    assert cfg.model.model_name == "yolo26x-sem"
    assert cfg.model.variant == "x"
    assert cfg.dataset.name == "vdd"


def test_val_mode_with_weights():
    cfg = compose(CONFIG_DIR, "train_yolo",
                  ["mode=val", "weights=/tmp/best", "split=test"])
    assert cfg.mode == "val"
    assert cfg.weights == "/tmp/best"
    assert cfg.split == "test"


@pytest.mark.parametrize("nbs,batch,want", [(64, 4, 16), (64, 8, 8),
                                            (64, 64, 1), (64, 48, 1),
                                            (16, 8, 2), (4, 8, 1)])
def test_nbs_accumulation_formula(nbs, batch, want):
    # accum = max(round(nbs / batch), 1) (reference train_yolo.py nbs
    # nominal-batch grad accumulation)
    assert max(round(nbs / batch), 1) == want
