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


def test_all_model_variant_configs_compose():
    """All 17 variant files (5 yolo26-sem + 12 legacy seg families,
    reference configs/yolo/model/) select via the model group."""
    variants = sorted(p.stem for p in (CONFIG_DIR / "yolo" / "model").glob("*.yaml"))
    assert len(variants) == 17
    for v in variants:
        cfg = compose(CONFIG_DIR, "train_yolo",
                      overrides=[f"yolo/model@model={v}"])
        assert cfg.model.model_name
        assert cfg.model.run_name
        legacy = v.endswith("-seg")
        assert (cfg.model.model_name in SUPPORTED_MODELS) != legacy


def test_ultralytics_native_interop_configs():
    """configs/yolo/*_{train,val}.yaml drive stock `yolo semantic ...`
    (reference configs/yolo/uavid_train.yaml surface)."""
    import yaml

    for ds, imgsz in (("uavid", 1024), ("vdd", 1024), ("aeroscapes", 896)):
        train = yaml.safe_load((CONFIG_DIR / "yolo" / f"{ds}_train.yaml").read_text())
        assert train["task"] == "semantic"
        assert train["data"] == f"configs/dataset/{ds}_yolo.yaml"
        assert train["nbs"] == 64 and train["cos_lr"] is True
        assert train["imgsz"] == imgsz
        assert train["close_mosaic"] == 15

        val = yaml.safe_load((CONFIG_DIR / "yolo" / f"{ds}_val.yaml").read_text())
        assert val["task"] == "semantic"
        assert val["imgsz"] == imgsz
        assert val["augment"] is False
    # UAVid's mixed native resolutions force batch-1 full-res eval
    uavid_val = yaml.safe_load((CONFIG_DIR / "yolo" / "uavid_val.yaml").read_text())
    assert uavid_val["batch"] == 1
