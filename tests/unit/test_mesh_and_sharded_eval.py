"""Mesh helpers + the sharded evaluation path (the reference's only
collective was dist.reduce of the eval histogram, evaluate.py:230-235; here
the histogram reduction is inserted by XLA from sharding annotations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.core.mesh import (
    auto_data_axis,
    batch_sharding,
    local_batch_size,
    make_mesh,
    process_shard,
    replicate,
    shard_batch,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(n_data=16)


def test_auto_data_axis():
    assert auto_data_axis(16, 8) == 8
    assert auto_data_axis(2, 8) == 2
    assert auto_data_axis(6, 8) == 6
    assert auto_data_axis(7, 4) == 1  # 7 has no divisor <= 4 except 1
    assert auto_data_axis(12, 8) == 6


@needs_8
def test_shard_and_replicate_roundtrip():
    mesh = make_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])
    rep = replicate({"w": np.ones(3)}, mesh)
    assert np.asarray(rep["w"]).shape == (3,)


def test_local_batch_size():
    mesh = make_mesh(n_data=min(4, len(jax.devices())))
    n = mesh.shape["data"]
    assert local_batch_size(8 * n, mesh) == 8
    with pytest.raises(ValueError):
        local_batch_size(8 * n + 1, mesh)


def test_process_shard_single_host():
    s = process_shard(10)
    assert (s.start, s.stop) == (0, 10)


@needs_8
def test_sharded_eval_histogram_matches_unsharded():
    """Histogram from a batch sharded over the data axis == unsharded
    result — XLA inserts the cross-device reduction."""
    from cabinet_tpu.eval.evaluator import MscEval

    N_CLASSES = 4

    def apply_fn(variables, images, train=False):
        B, H, W, _ = images.shape
        logits = jnp.zeros((B, H, W, N_CLASSES))
        logits = logits.at[..., 1].set(4.0)
        return logits, logits

    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 40, 40, 3)).astype(np.float32)
    labels = rng.integers(0, N_CLASSES, (8, 40, 40)).astype(np.int64)

    ev = MscEval(apply_fn, N_CLASSES, scales=(1.0,), cropsize=32)
    _, hist_plain = ev.evaluate_batch({}, images, labels)

    mesh = make_mesh()
    imgs_sh = jax.device_put(jnp.asarray(images), batch_sharding(mesh, 4))
    lbls_sh = jax.device_put(jnp.asarray(labels), batch_sharding(mesh, 3))
    ev2 = MscEval(apply_fn, N_CLASSES, scales=(1.0,), cropsize=32)
    _, hist_sharded = ev2.evaluate_batch({}, imgs_sh, lbls_sh)

    np.testing.assert_array_equal(hist_plain, hist_sharded)
    assert hist_plain.sum() == 8 * 40 * 40


@needs_8
def test_tile_sharded_eval_matches_unsharded():
    """Tiles of one image sharded across the mesh (context-parallel eval)
    == the single-device scan, bit-for-bit on the histogram."""
    from cabinet_tpu.eval.evaluator import MscEval

    N_CLASSES = 3

    def apply_fn(variables, images, train=False):
        m = (images.mean(axis=-1) > 0).astype(jnp.float32)
        logits = jnp.stack([1 - m, m, jnp.zeros_like(m)], axis=-1) * 7.0
        return logits, logits

    rng = np.random.default_rng(1)
    images = np.where(rng.random((1, 100, 88, 3)) > 0.5, 1.0, -1.0
                      ).astype(np.float32)
    labels = rng.integers(0, N_CLASSES, (1, 100, 88)).astype(np.int64)

    # single scale: bit-exact histogram
    plain = MscEval(apply_fn, N_CLASSES, scales=(1.0,), cropsize=32)
    _, hist_plain = plain.evaluate_batch({}, images, labels)
    mesh = make_mesh()
    sharded = MscEval(apply_fn, N_CLASSES, scales=(1.0,), cropsize=32,
                      tile_mesh=mesh)
    _, hist_sharded = sharded.evaluate_batch({}, images, labels)
    np.testing.assert_array_equal(hist_plain, hist_sharded)

    # multi-scale + flip: compare the probability maps (psum reordering can
    # flip argmax on exact resize ties, so histograms may differ by a hair)
    from cabinet_tpu.eval.evaluator import _scale_probs

    img = jnp.asarray(images)
    for s in (0.5, 1.0):
        pa = _scale_probs(apply_fn, N_CLASSES, 32, True, s, {}, img, None)
        pb = _scale_probs(apply_fn, N_CLASSES, 32, True, s, {}, img, mesh)
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)
