"""Mesh helpers + the sharded evaluation path (the reference's only
collective was dist.reduce of the eval histogram, evaluate.py:230-235; here
the histogram reduction is inserted by XLA from sharding annotations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.core.mesh import (
    MODEL_AXIS,
    auto_data_axis,
    batch_sharding,
    local_batch_size,
    make_mesh,
    process_shard,
    replicate,
    shard_batch,
    shard_model_parallel,
    spatial_sharding,
    tensor_parallel_spec,
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

    # the tile_batch fold reaches the SHARDED path too: folding several
    # tiles into one forward cannot change per-chip math -> f32 bit-exact
    folded = MscEval(apply_fn, N_CLASSES, scales=(1.0,), cropsize=32,
                     tile_mesh=mesh, tile_batch=8)
    _, hist_folded = folded.evaluate_batch({}, images, labels)
    np.testing.assert_array_equal(hist_plain, hist_folded)

    # multi-scale + flip: compare the probability maps (psum reordering can
    # flip argmax on exact resize ties, so histograms may differ by a hair)
    from cabinet_tpu.eval.evaluator import _scale_probs

    img = jnp.asarray(images)
    for s in (0.5, 1.0):
        pa = _scale_probs(apply_fn, N_CLASSES, 32, True, s, {}, img, None)
        pb = _scale_probs(apply_fn, N_CLASSES, 32, True, s, {}, img, mesh)
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)

    # the acc_dtype knob reaches the sharded path: bf16 accumulation stays
    # within cast tolerance of the f32 chain
    pc = _scale_probs(apply_fn, N_CLASSES, 32, False, 1.0, {}, img, mesh,
                      tile_batch=8, acc_dtype=jnp.bfloat16)
    pd = _scale_probs(apply_fn, N_CLASSES, 32, False, 1.0, {}, img, mesh,
                      tile_batch=8, acc_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pc, np.float32), np.asarray(pd),
                               atol=2e-2)


def test_tensor_parallel_spec_rule():
    p = tensor_parallel_spec((3, 3, 32, 256), 2)
    assert tuple(p) == (None, None, None, MODEL_AXIS)
    assert tuple(tensor_parallel_spec((256,), 2)) == (MODEL_AXIS,)
    # too narrow / not divisible / scalar -> replicated
    assert tuple(tensor_parallel_spec((3, 3, 16, 64), 2)) == ()
    assert tuple(tensor_parallel_spec((3, 3, 16, 255), 2, 128)) == ()
    assert tuple(tensor_parallel_spec((), 2)) == ()


@needs_8
def test_spatial_sharded_train_step_matches_replicated():
    """Batch-1 train step with image HEIGHT sharded over 8 devices
    (runtime.spatial_axis: GSPMD halo exchanges for convs) == the
    replicated step, to fp tolerance — high-res training where the batch
    dim cannot be split."""
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.trainer import create_train_state, make_train_step

    cfgs = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=5, mode="small", cfgs=cfgs)
    B, H, W = 1, 128, 64
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=True)
    tx = build_optimizer(variables["params"], lr0=1e-2, max_iter=100,
                         warmup_steps=10, max_grad_norm=1.0)
    state0 = jax.device_get(create_train_state(variables, tx))
    step = make_train_step(model.apply, tx, n_min=B * H * W // 16)
    rng = np.random.default_rng(2)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, 5, (B, H, W))

    mesh = make_mesh()
    losses = {}
    for kind, shard_fn in (("replicated", None),
                           ("spatial", spatial_sharding)):
        st = replicate(state0, mesh)
        if shard_fn is None:
            im, lb = jnp.asarray(images), jnp.asarray(labels)
        else:
            im = jax.device_put(jnp.asarray(images), shard_fn(mesh, 4))
            lb = jax.device_put(jnp.asarray(labels), shard_fn(mesh, 3))
            assert im.sharding.spec[1] == "data"  # H is the sharded dim
        _, loss = step(st, im, lb)
        losses[kind] = float(loss)
        assert np.isfinite(losses[kind])
    assert losses["replicated"] == pytest.approx(losses["spatial"], rel=1e-4)


@needs_8
def test_tensor_parallel_train_step_matches_dp():
    """One train step on a (4,2) dp x tp mesh — wide channels physically
    sharded over the model axis — produces the same loss as pure DP
    (GSPMD inserts the collectives; the math is unchanged)."""
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.trainer import create_train_state, make_train_step

    cfgs = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=5, mode="small", cfgs=cfgs)
    B, H, W = 8, 64, 64
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=True)
    tx = build_optimizer(variables["params"], lr0=1e-2, max_iter=100,
                         warmup_steps=10, max_grad_norm=1.0)
    # host copy: the jitted step donates its state arg, so each mesh
    # placement must start from buffers the previous iteration can't have
    # consumed (device_put of an identical sharding aliases, not copies)
    state0 = jax.device_get(create_train_state(variables, tx))
    step = make_train_step(model.apply, tx, n_min=B * H * W // 16)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, 5, (B, H, W))

    losses = {}
    for n_model in (1, 2):
        mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
        st = shard_model_parallel(state0, mesh, min_features=48)
        if n_model > 1:
            spec_leaves = [
                a.sharding.spec for a in jax.tree_util.tree_leaves(st.params)]
            assert any(MODEL_AXIS in tuple(s) for s in spec_leaves), \
                "no param actually sharded over the model axis"
        im = jax.device_put(jnp.asarray(images), batch_sharding(mesh, 4))
        lb = jax.device_put(jnp.asarray(labels), batch_sharding(mesh, 3))
        new_state, loss = step(st, im, lb)
        losses[n_model] = float(loss)
        assert np.isfinite(losses[n_model])
    assert losses[1] == pytest.approx(losses[2], rel=1e-4)


@pytest.mark.slow  # two mesh placements x jitted steps: ~3 min on 1 core
def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a TrainState that is LIVE-sharded on the mesh
    (DP-replicated and TP channel-sharded placements): the save writes
    shards without a host gather (checkpoint.py:_saveable), the restore
    comes back ON the template's shardings, params are bit-equal, and one
    resumed train step matches the uninterrupted one exactly.

    The SPMD lift of the reference checkpoint contract
    (src/scripts/train.py:54-123)."""
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.checkpoint import CheckpointManager
    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.trainer import create_train_state, make_train_step

    cfgs = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=5, mode="small", cfgs=cfgs)
    B, H, W = 8, 32, 32
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=True)
    tx = build_optimizer(variables["params"], lr0=1e-2, max_iter=100,
                         warmup_steps=10, max_grad_norm=1.0)
    state0 = jax.device_get(create_train_state(variables, tx))
    step = make_train_step(model.apply, tx, n_min=B * H * W // 16)
    rng = np.random.default_rng(1)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, 5, (B, H, W))

    for n_model in (1, 2):  # DP-replicated and (4,2) dp x tp placements
        mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
        st = shard_model_parallel(state0, mesh, min_features=48)
        im = jax.device_put(jnp.asarray(images), batch_sharding(mesh, 4))
        lb = jax.device_put(jnp.asarray(labels), batch_sharding(mesh, 3))
        st, _ = step(st, im, lb)  # advance so opt_state is non-trivial

        ckpt = CheckpointManager(tmp_path / f"ck_tp{n_model}")
        ckpt.save_full("checkpoint_last", st, epoch=0, best_miou=0.1,
                       best_loss=1.0,
                       stopper_state={"best_fitness": 0.1, "best_epoch": 0})

        # fresh template with DIFFERENT values, same live shardings
        template = shard_model_parallel(state0, mesh, min_features=48)
        restored = ckpt.restore_full("checkpoint_last", template)
        assert restored is not None and restored["epoch"] == 0
        rst = restored["state"]

        # restored leaves are ON DEVICE with the template's shardings
        for got, want in zip(jax.tree_util.tree_leaves(rst.params),
                             jax.tree_util.tree_leaves(template.params)):
            assert isinstance(got, jax.Array)
            assert got.sharding.is_equivalent_to(want.sharding, got.ndim), \
                (got.sharding, want.sharding)
        # bit-equal state
        for got, want in zip(jax.tree_util.tree_leaves(rst.params),
                             jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert int(rst.step) == int(st.step)

        # resume-equivalence: one more step from the restore == one more
        # step from the uninterrupted state, bit-exact on CPU
        im2 = jax.device_put(jnp.asarray(images), batch_sharding(mesh, 4))
        lb2 = jax.device_put(jnp.asarray(labels), batch_sharding(mesh, 3))
        _, loss_resumed = step(rst, im2, lb2)
        im3 = jax.device_put(jnp.asarray(images), batch_sharding(mesh, 4))
        lb3 = jax.device_put(jnp.asarray(labels), batch_sharding(mesh, 3))
        _, loss_straight = step(st, im3, lb3)
        assert float(loss_resumed) == float(loss_straight)


@needs_8
def test_model_sharded_eval_matches_replicated():
    """Model-sharded (TP) EVAL on a (4,2) mesh: variables arrive sharded
    over the model axis (shard_model_parallel), tiles stream over the data
    axis — the partial-manual shard_map leaves 'model' to GSPMD. The
    histogram must be bit-equal to the replicated-params tile-sharded run
    (the math is unchanged; only placement moves)."""
    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.models import CABiNet

    cfgs = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=5, mode="small", cfgs=cfgs)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 64, 64, 3)),
                                          train=False))
    rng = np.random.default_rng(2)
    images = rng.normal(size=(1, 80, 72, 3)).astype(np.float32)
    labels = rng.integers(0, 5, (1, 80, 72)).astype(np.int64)

    mesh = make_mesh(n_data=4, n_model=2)
    ev = MscEval(model.apply, n_classes=5, scales=(1.0,), cropsize=32,
                 tile_mesh=mesh)

    repl = replicate(variables, mesh)
    hist_repl = ev.hist_batch(repl, images, labels)

    tp_vars = shard_model_parallel(variables, mesh, min_features=48)
    specs = [a.sharding.spec
             for a in jax.tree_util.tree_leaves(tp_vars["params"])]
    assert any(MODEL_AXIS in tuple(s) for s in specs), \
        "no param actually sharded over the model axis"
    # _prepare_variables must NOT clobber the TP placement with replicate
    prepared = ev._prepare_variables(tp_vars)
    pspecs = [a.sharding.spec
              for a in jax.tree_util.tree_leaves(prepared["params"])]
    assert any(MODEL_AXIS in tuple(s) for s in pspecs)

    hist_tp = ev.hist_batch(tp_vars, images, labels)
    np.testing.assert_array_equal(hist_repl, hist_tp)


@needs_8
def test_pipeline_merged_variables_on_mesh():
    """CabinetPipeline.merged_variables_on: stage states merge onto a
    global mesh device-to-device (replicated or TP-sharded), and the
    evaluator consumes the TP placement directly — the model-sharded
    per-epoch eval path of the pipeline trainer."""
    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.pipeline import CabinetPipeline, make_pipeline_meshes

    cfgs = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=5, mode="small", cfgs=cfgs)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 64, 64, 3)),
                                          train=True))
    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, lr0=1e-2, max_iter=10,
                                             max_grad_norm=None),
        n_min=64, num_microbatches=2,
        meshes=make_pipeline_meshes(n_stages=2, dp=2), max_grad_norm=1.0)
    states = pipe.init_state(variables)

    mesh = make_mesh(n_data=4, n_model=2)
    tp_merged = pipe.merged_variables_on(states, mesh, ema=True,
                                         tp_min_features=48)
    specs = [a.sharding.spec
             for a in jax.tree_util.tree_leaves(tp_merged["params"])]
    assert any(MODEL_AXIS in tuple(s) for s in specs)
    # every leaf landed on the GLOBAL mesh, none on a stage sub-mesh
    for leaf in jax.tree_util.tree_leaves(tp_merged):
        assert np.array_equal(np.asarray(leaf.sharding.mesh.devices).ravel(),
                              np.asarray(mesh.devices).ravel())

    # content identical to the host merge
    host = pipe.merged_ema_variables(states)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(tp_merged),
            jax.tree_util.tree_leaves_with_path(host)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), b)

    # and the evaluator consumes it directly (mIoU finite, placement kept)
    ev = MscEval(model.apply, n_classes=5, scales=(1.0,), cropsize=32,
                 tile_mesh=mesh)
    rng = np.random.default_rng(3)
    hist = ev.hist_batch(tp_merged,
                         rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
                         rng.integers(0, 5, (1, 64, 64)).astype(np.int64))
    assert hist.sum() == 64 * 64
