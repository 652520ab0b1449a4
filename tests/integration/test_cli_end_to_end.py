"""End-to-end CLI integration: compose config -> train 2 epochs on a tiny
synthetic UAVid tree -> checkpoints appear -> standalone evaluate consumes
them -> resume continues. Mirrors the reference's integration suite intent
(test_training_pipeline.py) at the CLI boundary."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from cabinet_tpu.cli.common import CONFIG_DIR
from cabinet_tpu.core.config import compose


def _make_tree(root, n=4, size=(24, 24)):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "masks" / split).mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
            mask = rng.integers(0, 8, size, dtype=np.uint8)
            Image.fromarray(img).save(root / "images" / split / f"s{i}.png")
            Image.fromarray(mask, "L").save(root / "masks" / split / f"s{i}.png")
    return root


TINY_MODEL_OVERRIDES = [
    "model=mobilenetv3_small",
    # truncated cfg table for speed; flax infers attention width
    "model.cfgs=[[3,1,16,1,0,2],[3,4.5,24,0,0,2],[5,4,40,1,1,2],[5,6,96,1,1,2]]",
]


@pytest.fixture
def tiny_run(tmp_path, monkeypatch):
    data_root = _make_tree(tmp_path / "data")
    exp = tmp_path / "exp"
    monkeypatch.setenv("UAVID_YOLO_ROOT", str(data_root))
    overrides = TINY_MODEL_OVERRIDES + [
        "dataset=uavid",
        "dataset.cropsize=[16,16]",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.epochs=2",
        "training_config.warmup_steps=1",
        "training_config.cls_pw=0.5",
        "training_config.patience=0",
        f"training_config.experiments_path={exp}",
        "training_config.model_save_name=tiny",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "validation_config.eval_scales=[1.0]",
        "validation_config.flip=false",
        "runtime.compute_dtype=float32",
    ]
    return data_root, exp, overrides


def test_train_cli_end_to_end(tiny_run):
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides)
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (exp / "checkpoint_last").exists()
    assert (exp / "tiny").exists()  # final EMA variables
    assert (exp / "config.yaml").exists()
    # per-epoch machine-readable metrics: one JSON line per epoch
    import json

    lines = [json.loads(ln) for ln in
             (exp / "metrics.jsonl").read_text().splitlines()]
    # one run-start marker (resume/re-run delimiter) + one line per epoch,
    # each epoch line tagged with the run id
    assert len(lines) == 3 and "run_start" in lines[0]
    assert lines[-1]["epoch"] == 1
    assert lines[-1]["run"] == lines[0]["run_start"]
    assert np.isfinite(lines[-1]["val_loss"])
    assert np.isfinite(lines[-1]["mIoU"])

    # standalone evaluate consumes the final checkpoint
    from cabinet_tpu.cli.evaluate import evaluate_checkpoint

    eval_cfg = compose(CONFIG_DIR, "evaluate", TINY_MODEL_OVERRIDES + [
        "dataset=uavid",
        "dataset.cropsize=[16,16]",
        f"checkpoint_path={exp / 'tiny'}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "validation_config.eval_scales=[1.0]",
        "validation_config.flip=false",
    ])
    res = evaluate_checkpoint(eval_cfg)
    assert 0.0 <= res["mIoU"] <= 1.0

    # resume restarts from checkpoint_last without error
    cfg2 = compose(CONFIG_DIR, "train", overrides + [
        "training_config.resume=true",
        "training_config.epochs=3",
    ])
    results2 = train_and_evaluate(cfg2)
    assert np.isfinite(results2["final"]["mIoU"])


def test_evaluate_rejects_train_split(tiny_run):
    from cabinet_tpu.cli.evaluate import evaluate_checkpoint
    from cabinet_tpu.core.exceptions import ConfigurationError

    _, exp, _ = tiny_run
    cfg = compose(CONFIG_DIR, "evaluate", TINY_MODEL_OVERRIDES + [
        "dataset=uavid", "checkpoint_path=/nonexistent", "split=train",
    ])
    with pytest.raises(ConfigurationError, match="train"):
        evaluate_checkpoint(cfg)


def test_yolo_train_cli_end_to_end(tiny_run):
    from cabinet_tpu.cli.train_yolo import train, validate

    _, exp, _ = tiny_run
    yexp = exp.parent / "yexp"
    overrides = [
        "dataset=uavid",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.epochs=1",
        "training_config.imgsz=32",
        "training_config.nbs=4",
        "training_config.cls_pw=0",
        f"training_config.experiments_path={yexp}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "runtime.compute_dtype=float32",
    ]
    cfg = compose(CONFIG_DIR, "train_yolo", overrides)
    res = train(cfg)
    assert np.isfinite(res["best_miou"])
    assert (yexp / "final").exists()

    val_cfg = compose(CONFIG_DIR, "train_yolo", overrides + [
        "mode=val", f"weights={yexp / 'final'}"])
    vres = validate(val_cfg)
    assert 0.0 <= vres["mIoU"] <= 1.0


def test_train_cli_with_device_augs(tiny_run):
    """runtime.device_augs=true: geometric-only host pipeline + XLA-fused
    photometric/mixup/normalize on device; training runs end to end."""
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides + [
        "runtime.device_augs=true",
        f"training_config.experiments_path={exp.parent / 'exp_dev_augs'}",
        "training_config.epochs=1",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])


def test_train_cli_with_device_geometric(tiny_run):
    """runtime.device_geometric=true: decode-only host pipeline (u8 canvas +
    (h, w)), the FULL aug recipe — warp/crop + photometric/mixup/normalize —
    fused on device; training runs end to end and checkpoints appear."""
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides + [
        "runtime.device_geometric=true",
        f"training_config.experiments_path={exp.parent / 'exp_dev_geom'}",
        "training_config.epochs=1",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (exp.parent / "exp_dev_geom" / "checkpoint_last").exists()


def test_train_cli_with_device_geometric_shared(tiny_run):
    """runtime.device_geometric=shared: the batch-shared-rotation warp
    (~3x cheaper on-chip than the exact per-sample warp, NOTES r4) trains
    end to end through the same decode-only host pipeline."""
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides + [
        "runtime.device_geometric=shared",
        f"training_config.experiments_path={exp.parent / 'exp_dev_geo_sh'}",
        "training_config.epochs=1",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (exp.parent / "exp_dev_geo_sh" / "checkpoint_last").exists()


def test_train_cli_pipeline_parallel(tiny_run):
    """runtime.pipeline=2: the GPipe trainer (train/pipeline.py) behind the
    CLI — backbone | decode stages on disjoint sub-meshes of the virtual
    8-device mesh, accum_steps microbatches per optimizer step, per-stage
    full checkpoint + resume, merged-EMA final artifact consumable by the
    standalone evaluate CLI."""
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    pexp = exp.parent / "exp_pipeline"
    pp_overrides = overrides + [
        "runtime.pipeline=2",
        "runtime.pipeline_dp=2",
        "training_config.accum_steps=2",
        f"training_config.experiments_path={pexp}",
    ]
    cfg = compose(CONFIG_DIR, "train", pp_overrides)
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (pexp / "checkpoint_last").exists()
    assert (pexp / "tiny").exists()
    meta = json.loads((pexp / "checkpoint_last.meta.json").read_text())
    assert meta["pipeline_stages"] == 2

    # the merged-EMA artifact feeds the (non-pipeline) evaluate CLI
    from cabinet_tpu.cli.evaluate import evaluate_checkpoint

    eval_cfg = compose(CONFIG_DIR, "evaluate", TINY_MODEL_OVERRIDES + [
        "dataset=uavid",
        "dataset.cropsize=[16,16]",
        f"checkpoint_path={pexp / 'tiny'}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "validation_config.eval_scales=[1.0]",
        "validation_config.flip=false",
    ])
    assert 0.0 <= evaluate_checkpoint(eval_cfg)["mIoU"] <= 1.0

    # resume restores the per-stage states and continues
    cfg2 = compose(CONFIG_DIR, "train", pp_overrides + [
        "training_config.resume=true",
        "training_config.epochs=3",
    ])
    results2 = train_and_evaluate(cfg2)
    assert np.isfinite(results2["final"]["mIoU"])


def test_train_cli_pipeline_with_device_augs(tiny_run):
    """runtime.pipeline=2 composes with on-device augmentation (was a hard
    error until r5): the photometric program runs on stage 0's sub-mesh and
    the warped batch rides to stage 1 as data (train_step_micro)."""
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides + [
        "runtime.pipeline=2",
        "runtime.device_augs=true",
        "training_config.accum_steps=2",
        f"training_config.experiments_path={exp.parent / 'exp_pp_aug'}",
        "training_config.epochs=1",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])


def test_train_cli_pipeline_with_device_geometric(tiny_run):
    """runtime.pipeline=2 + runtime.device_geometric=true: the host ships
    raw u8 canvases + (h, w); the FULL aug recipe (warp/crop + photometric)
    runs on stage 0's mesh inside the pipeline window."""
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides + [
        "runtime.pipeline=2",
        "runtime.device_geometric=true",
        "training_config.accum_steps=2",
        f"training_config.experiments_path={exp.parent / 'exp_pp_geo'}",
        "training_config.epochs=1",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (exp.parent / "exp_pp_geo" / "checkpoint_last").exists()


def _make_cityscapes_tree(root, n=4, size=(24, 24)):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        im_dir = root / "leftImg8bit" / split / "city"
        gt_dir = root / "gtFine" / split / "city"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
            raw = rng.integers(0, 34, size, dtype=np.uint8)
            Image.fromarray(img).save(
                im_dir / f"city_{i:06d}_leftImg8bit.png")
            Image.fromarray(raw, "L").save(
                gt_dir / f"city_{i:06d}_gtFine_labelIds.png")
    return root


def test_train_cli_cityscapes_device_geometric(tmp_path, monkeypatch):
    """Cityscapes street recipe fully on device (flip + discrete scale +
    crop warp, jitter/grayscale photometric chain): the carve-out is gone —
    all four datasets train with runtime.device_geometric."""
    from cabinet_tpu.cli.train import train_and_evaluate

    data_root = _make_cityscapes_tree(tmp_path / "cs")
    exp = tmp_path / "exp_cs"
    monkeypatch.setenv("CITYSCAPES_ROOT", str(data_root))
    cfg = compose(CONFIG_DIR, "train", TINY_MODEL_OVERRIDES + [
        "dataset=cityscapes",
        "dataset.cropsize=[16,16]",
        "training_config.batch_size=2",
        "training_config.num_workers=0",
        "training_config.epochs=1",
        "training_config.warmup_steps=1",
        "training_config.cls_pw=0",
        "training_config.patience=0",
        f"training_config.experiments_path={exp}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "validation_config.eval_scales=[1.0]",
        "validation_config.flip=false",
        "runtime.compute_dtype=float32",
        "runtime.device_geometric=true",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (exp / "checkpoint_last").exists()


def test_train_cli_with_grain_loader(tiny_run):
    """runtime.loader=grain: the trainer runs one epoch with the grain
    multiprocess input pipeline feeding REAL worker processes (the
    reference's DataLoader-worker analog, src/scripts/train.py:248-275)."""
    pytest.importorskip("grain")
    from cabinet_tpu.cli.train import train_and_evaluate

    _, exp, overrides = tiny_run
    cfg = compose(CONFIG_DIR, "train", overrides + [
        "runtime.loader=grain",
        "training_config.num_workers=1",
        f"training_config.experiments_path={exp.parent / 'exp_grain'}",
        "training_config.epochs=1",
    ])
    results = train_and_evaluate(cfg)
    assert np.isfinite(results["final"]["mIoU"])
    assert (exp.parent / "exp_grain" / "checkpoint_last").exists()


def test_evaluate_cli_accepts_torch_pth(tiny_run, tmp_path):
    """The README north-star runbook path: `cli.evaluate checkpoint_path=x.pth`
    converts a reference-format torch state dict on the fly (full-size
    MobileNetV3-Small table — the .pth loader infers cfgs from the weights)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.models.mobilenetv3 import default_cfgs
    from cabinet_tpu.utils.torch_convert import flax_to_torch

    model = CABiNet(n_classes=8, mode="small")
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False))()
    sd = flax_to_torch(variables, default_cfgs("small"))
    pth = tmp_path / "cabinet_small.pth"
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, pth)

    from cabinet_tpu.cli.evaluate import evaluate_checkpoint

    _, exp, _ = tiny_run
    cfg = compose(CONFIG_DIR, "evaluate", [
        "dataset=uavid",
        "dataset.cropsize=[256,256]",
        "model=mobilenetv3_small",
        f"checkpoint_path={pth}",
        "validation_config.batch_size=1",
        "validation_config.num_workers=0",
        "validation_config.eval_scales=[1.0]",
        "validation_config.flip=false",
    ])
    res = evaluate_checkpoint(cfg)
    assert np.isfinite(res["mIoU"])
    assert res["confusion_matrix"].sum() > 0
