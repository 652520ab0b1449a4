"""AOT serving export (cabinet_tpu/export.py + cli/export.py).

The artifact contract: uint8 RGB in -> int32 class IDs out, weights +
normalization baked into one StableHLO program, bit-exact against the live
model on the same platform, and deserializable without the checkpoint.

Lives in the integration lane: every test here exports real artifact
directories to disk and round-trips them the way cli.export/cli.serve do
(the serialize+deserialize passes are also the unit suite's largest
compile sinks — ~100s on a 1-core host).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.export import (
    ARTIFACT_NAME,
    METADATA_NAME,
    export_serving,
    load_artifact,
    make_serving_fn,
    save_artifact,
)
from cabinet_tpu.models import CABiNet

IMGSZ = 64
MEAN = (0.5, 0.5, 0.5)
STD = (0.25, 0.25, 0.25)
CFGS = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
        [5, 6, 96, 1, 1, 2]]


@pytest.fixture(scope="module")
def small_model():
    model = CABiNet(n_classes=4, mode="small", cfgs=CFGS, dtype=jnp.float32)
    x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    return model, variables


def _random_u8(batch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (batch, IMGSZ, IMGSZ, 3), np.uint8)


def test_roundtrip_bit_exact(small_model, tmp_path):
    model, variables = small_model
    exported = export_serving(model, variables, mean=MEAN, std=STD,
                              imgsz=IMGSZ, batch=2)
    out = save_artifact(exported, tmp_path / "art", {"dataset": "test"})
    assert (out / ARTIFACT_NAME).exists()
    meta = json.loads((out / METADATA_NAME).read_text())
    assert meta["dataset"] == "test"
    assert meta["platforms"]  # recorded by save_artifact

    serve, meta2 = load_artifact(out)
    assert meta2["dataset"] == "test"
    x = _random_u8(2)
    got = np.asarray(serve(jnp.asarray(x)))
    ref = jax.jit(make_serving_fn(model, variables, MEAN, STD))
    want = np.asarray(ref(jnp.asarray(x)))
    assert got.dtype == np.int32 and got.shape == (2, IMGSZ, IMGSZ)
    np.testing.assert_array_equal(got, want)


def test_load_bare_file_picks_up_sibling_metadata(small_model, tmp_path):
    """Pointing load_artifact at the .stablehlo FILE (not its directory)
    must still find the sibling metadata.json — consumers falling back to
    unrelated defaults (imgsz, palette) is how silent shape mismatches are
    born."""
    model, variables = small_model
    exported = export_serving(model, variables, mean=MEAN, std=STD,
                              imgsz=IMGSZ, batch=1)
    out = save_artifact(exported, tmp_path / "art", {"dataset": "sib",
                                                     "imgsz": IMGSZ})
    serve, meta = load_artifact(out / ARTIFACT_NAME)
    assert meta["dataset"] == "sib" and meta["imgsz"] == IMGSZ
    got = np.asarray(serve(jnp.asarray(_random_u8(1))))
    assert got.shape == (1, IMGSZ, IMGSZ)


def test_symbolic_batch(small_model, tmp_path):
    model, variables = small_model
    exported = export_serving(model, variables, mean=MEAN, std=STD,
                              imgsz=IMGSZ, batch="b")
    out = save_artifact(exported, tmp_path / "art", {})
    serve, _ = load_artifact(out)
    ref = jax.jit(make_serving_fn(model, variables, MEAN, STD))
    for b in (1, 3):
        x = _random_u8(b, seed=b)
        got = np.asarray(serve(jnp.asarray(x)))
        assert got.shape == (b, IMGSZ, IMGSZ)
        np.testing.assert_array_equal(got, np.asarray(ref(jnp.asarray(x))))


def test_quantized_export_roundtrip(small_model, tmp_path):
    """int8 PTQ composed into the artifact: the quantize/dequantize
    arithmetic serializes, and the artifact matches the live quantized
    apply bit-for-bit."""
    from cabinet_tpu.quant import collect_act_scales, make_quantized_apply

    model, variables = small_model
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.normal(size=(2, IMGSZ, IMGSZ, 3)), jnp.float32)
    scales = collect_act_scales(model, variables, [calib])
    assert scales
    q_apply = make_quantized_apply(model, scales)

    exported = export_serving(model, variables, mean=MEAN, std=STD,
                              imgsz=IMGSZ, batch=1, apply_fn=q_apply)
    out = save_artifact(exported, tmp_path / "art", {"quantize": "int8"})
    serve, meta = load_artifact(out)
    assert meta["quantize"] == "int8"
    x = _random_u8(1, seed=9)
    got = np.asarray(serve(jnp.asarray(x)))
    ref = jax.jit(make_serving_fn(model, variables, MEAN, STD,
                                  apply_fn=q_apply))
    np.testing.assert_array_equal(got, np.asarray(ref(jnp.asarray(x))))


def test_yolosem_export_roundtrip(tmp_path):
    """The second model family exports through the same artifact contract."""
    from cabinet_tpu.models.yolosem import YOLOSem

    model = YOLOSem(n_classes=4, variant="n", dtype=jnp.float32)
    x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    exported = export_serving(model, variables, mean=MEAN, std=STD,
                              imgsz=IMGSZ, batch=1)
    out = save_artifact(exported, tmp_path / "art", {"family": "yolosem"})
    serve, _ = load_artifact(out)
    xs = _random_u8(1, seed=4)
    got = np.asarray(serve(jnp.asarray(xs)))
    ref = jax.jit(make_serving_fn(model, variables, MEAN, STD))
    np.testing.assert_array_equal(got, np.asarray(ref(jnp.asarray(xs))))


def test_cli_end_to_end(tmp_path, monkeypatch):
    """cli.export: checkpoint -> artifact -> --check round-trip (the CLI
    builds the stock small model, so save a stock-cfgs checkpoint)."""
    from cabinet_tpu.cli import export as export_cli
    from cabinet_tpu.train.checkpoint import CheckpointManager

    model = CABiNet(n_classes=4, mode="small", dtype=jnp.float32)
    x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    ckpt_dir = tmp_path / "ck"
    CheckpointManager(ckpt_dir).save_variables("m", variables)

    # Route the CLI onto the test-sized model: the dataset only supplies
    # NUM_CLASSES/MEAN/STD, so patch in a tiny stand-in.
    from cabinet_tpu.data import datasets as ds_mod

    class _TinyDS:
        NUM_CLASSES = 4
        MEAN = MEAN
        STD = STD

    monkeypatch.setitem(ds_mod.DATASET_REGISTRY, "tinytest", _TinyDS)
    export_cli.main([
        "--checkpoint", str(ckpt_dir / "m"),
        "--dataset", "tinytest",
        "--out", str(tmp_path / "art"),
        "--imgsz", str(IMGSZ),
        "--mode", "small",
        "--dtype", "float32",
        "--batch", "1",
        "--check",
    ])
    meta = json.loads((tmp_path / "art" / METADATA_NAME).read_text())
    assert meta["n_classes"] == 4 and meta["imgsz"] == IMGSZ
