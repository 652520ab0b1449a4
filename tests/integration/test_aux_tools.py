"""Smoke tests: visualize CLI, infer Segmenter, profiler harness."""

import numpy as np
import pytest
from PIL import Image

from cabinet_tpu.cli.common import CONFIG_DIR
from cabinet_tpu.core.config import compose

TINY_MODEL_OVERRIDES = [
    "model=mobilenetv3_small",
    "model.cfgs=[[3,1,16,1,0,2],[3,4.5,24,0,0,2],[5,4,40,1,1,2],[5,6,96,1,1,2]]",
]


def _make_tree(root, n=2, size=(24, 24)):
    rng = np.random.default_rng(0)
    for split in ("val",):
        (root / "images" / split).mkdir(parents=True)
        (root / "masks" / split).mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (*size, 3), dtype=np.uint8)
                            ).save(root / "images" / split / f"s{i}.png")
            Image.fromarray(rng.integers(0, 8, size, dtype=np.uint8), "L"
                            ).save(root / "masks" / split / f"s{i}.png")
    return root


@pytest.fixture
def tiny_ckpt(tmp_path):
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.checkpoint import CheckpointManager

    cfgs = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=8, mode="small", cfgs=cfgs)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)),
                           train=False)
    mgr = CheckpointManager(tmp_path / "ck")
    path = mgr.save_variables("tiny", variables)
    return path, cfgs


def test_visualize_cli(tmp_path, monkeypatch, tiny_ckpt):
    from cabinet_tpu.cli.visualize import visualize

    ckpt_path, _ = tiny_ckpt
    data_root = _make_tree(tmp_path / "data")
    monkeypatch.setenv("UAVID_YOLO_ROOT", str(data_root))
    out_dir = tmp_path / "viz"
    cfg = compose(CONFIG_DIR, "evaluate", TINY_MODEL_OVERRIDES + [
        "dataset=uavid",
        "dataset.cropsize=[16,16]",
        f"checkpoint_path={ckpt_path}",
        "validation_config.num_workers=0",
        "validation_config.eval_scales=[1.0]",
        "validation_config.flip=false",
        f"+output_dir={out_dir}",
        "+num_samples=1",
    ])
    visualize(cfg)
    names = {p.name for p in out_dir.iterdir()}
    assert names == {"0000_input.png", "0000_pred.png", "0000_overlay.png",
                     "0000_gt.png"}


def test_profiler_harness():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from cabinet_tpu.utils.profiler import PerformanceProfiler

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), padding="SAME")(x)

    model = Tiny()
    x = np.zeros((1, 16, 16, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    prof = PerformanceProfiler(warmup=1, repeats=1, chain=3)
    res = prof.run_full_benchmark(model.apply, variables, x)
    # chain differencing can go negative in noise for sub-us CPU ops; just
    # require the harness to produce finite numbers
    assert np.isfinite(res["latency"]["mean_ms"])
    assert res["flops"]["gflops"] > 0 or np.isnan(res["flops"]["gflops"])
    assert res["params"]["total"] == 3 * 3 * 3 * 8 + 8


def test_infer_segmenter_and_image(tmp_path, tiny_ckpt, monkeypatch):
    import cabinet_tpu.cli.infer as infer_mod
    from cabinet_tpu.data.palettes import PALETTES

    ckpt_path, cfgs = tiny_ckpt

    # patch the default cfg table so the tiny checkpoint matches
    import cabinet_tpu.models.mobilenetv3 as mnv3

    monkeypatch.setattr(mnv3, "MOBILENETV3_SMALL_CFGS", cfgs)

    seg = infer_mod.Segmenter(str(ckpt_path), "uavid", mode="small",
                              imgsz=24, dtype_name="float32")
    rgb = np.random.default_rng(0).integers(0, 255, (30, 40, 3), dtype=np.uint8)
    pred = seg.predict(rgb)
    assert pred.shape == (30, 40)
    assert set(np.unique(pred)) <= set(range(8))

    img_path = tmp_path / "frame.png"
    Image.fromarray(rgb).save(img_path)
    out_dir = tmp_path / "out"
    infer_mod.infer_image(seg, PALETTES["uavid"], img_path, out_dir, 0.5)
    assert (out_dir / "frame_mask.png").exists()
    assert (out_dir / "frame_overlay.png").exists()

    # batched path (video/folder throughput engine): same predictions as
    # batch-1, partial chunks padded through one program
    segb = infer_mod.Segmenter(str(ckpt_path), "uavid", mode="small",
                               imgsz=24, dtype_name="float32", batch=4)
    frames = [np.random.default_rng(i).integers(0, 255, (30, 40, 3),
                                                dtype=np.uint8)
              for i in range(3)]
    preds = segb.predict_batch(frames)
    assert len(preds) == 3
    for f, pr in zip(frames, preds):
        assert pr.shape == (30, 40)
        np.testing.assert_array_equal(pr, seg.predict(f))


def test_convert_checkpoint_roundtrip(tmp_path, monkeypatch):
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    import cabinet_tpu.models.mobilenetv3 as mnv3
    from cabinet_tpu.cli import convert_checkpoint as cc
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.checkpoint import CheckpointManager

    cfgs = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
            [5, 6, 96, 1, 1, 2]]
    monkeypatch.setattr(mnv3, "MOBILENETV3_SMALL_CFGS", cfgs)

    model = CABiNet(n_classes=8, mode="small", cfgs=cfgs)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    # export orbax -> .pth
    mgr = CheckpointManager(tmp_path)
    src = mgr.save_variables("v", variables)
    pth = tmp_path / "model.pth"
    cc.do_export(src, pth, "small", 8)
    assert pth.exists()

    # import .pth -> orbax, values round-trip
    out = tmp_path / "back"
    cc.do_import(pth, out, "small")
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        out.resolve(), {"params": variables["params"],
                        "batch_stats": variables["batch_stats"]})
    a = jax.tree_util.tree_leaves(variables["params"])
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
