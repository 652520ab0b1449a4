"""Pipeline-parallel trainer (train/pipeline.py): numeric equivalence with
the fused single-program trainer, DP invariance, and variable round-trip.

The contract under test: one CabinetPipeline.train_step over M microbatches
== the fused trainer (train/trainer.py) with accum_steps=M fed the same
microbatches — identical OHEM selection, 1/M loss scaling, GLOBAL-norm clip
across both stages, once-per-window optimizer/EMA advance, chained BN stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.models import CABiNet
from cabinet_tpu.train.optimizer import build_optimizer
from cabinet_tpu.train.pipeline import (
    CABINET_STAGE_KEYS,
    YOLOSEM_STAGE_KEYS,
    YOLOSEM_STAGE_METHODS,
    CabinetPipeline,
    PipelineTrainLoop,
    make_pipeline_meshes,
    merge_variables,
    split_variables,
)
from cabinet_tpu.train.trainer import (
    create_train_state,
    make_flush_step,
    make_train_step,
)

CFGS = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
        [5, 6, 96, 1, 1, 2]]
B, H, W, C = 4, 64, 64, 5
M = 2
N_MIN = (B // M) * H * W // 16
OPT = dict(lr0=1e-2, max_iter=50, warmup_steps=5)


def _model_and_batch():
    model = CABiNet(n_classes=C, mode="small", cfgs=CFGS)
    rng = np.random.default_rng(7)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), train=True)
    # Host copies: the fused trainer donates its TrainState, so each run
    # must start from buffers it cannot delete from under the other.
    return model, jax.device_get(variables), images, labels


def _fused_reference(model, variables, images, labels, max_grad_norm):
    tx = build_optimizer(variables["params"], max_grad_norm=max_grad_norm,
                         **OPT)
    state = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=N_MIN, accum_steps=M)
    losses = []
    mb = B // M
    for m in range(M):
        state, loss = step(state, jnp.asarray(images[m * mb:(m + 1) * mb]),
                           jnp.asarray(labels[m * mb:(m + 1) * mb]))
        losses.append(float(loss))
    return state, float(np.mean(losses))


def _pipeline_run(model, variables, images, labels, max_grad_norm, dp):
    meshes = make_pipeline_meshes(n_stages=2, dp=dp)
    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M, meshes=meshes,
        max_grad_norm=max_grad_norm)
    states = pipe.init_state(variables)
    states, loss = pipe.train_step(states, images, labels)
    return pipe, states, float(loss)


def _assert_tree_close(a, b, **tol):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for key, leaf in fa:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(fb[jax.tree_util.keystr(key)]),
                                   err_msg=jax.tree_util.keystr(key), **tol)


@pytest.mark.parametrize("max_grad_norm", [1.0, 1e6],
                         ids=["clip-engaged", "clip-dormant"])
def test_pipeline_equivalent_to_fused_accum(max_grad_norm):
    model, variables, images, labels = _model_and_batch()
    fused, fused_loss = _fused_reference(model, variables, images, labels,
                                         max_grad_norm)
    pipe, states, loss = _pipeline_run(model, variables, images, labels,
                                       max_grad_norm, dp=1)

    merged = pipe.merged_variables(states)
    _assert_tree_close(merged["params"], jax.device_get(fused.params),
                       rtol=1e-4, atol=1e-6)
    _assert_tree_close(merged["batch_stats"],
                       jax.device_get(fused.batch_stats),
                       rtol=1e-4, atol=1e-6)
    ema = pipe.merged_ema_variables(states)
    _assert_tree_close(ema["params"],
                       jax.device_get(fused.ema.variables["params"]),
                       rtol=1e-4, atol=1e-6)
    assert np.isclose(loss, fused_loss, rtol=1e-4)
    assert all(int(s.step) == 1 for s in states)


@pytest.mark.slow
def test_pipeline_dp_invariance():
    """(pp=2, dp=2) over 4 devices == (pp=2, dp=1): the stage-internal data
    axis (XLA-inserted gradient psums) must not change the update."""
    model, variables, images, labels = _model_and_batch()
    pipe1, states1, loss1 = _pipeline_run(model, variables, images, labels,
                                          1.0, dp=1)
    pipe2, states2, loss2 = _pipeline_run(model, variables, images, labels,
                                          1.0, dp=2)
    _assert_tree_close(pipe1.merged_variables(states1)["params"],
                       pipe2.merged_variables(states2)["params"],
                       rtol=1e-4, atol=1e-6)
    assert np.isclose(loss1, loss2, rtol=1e-4)


def test_pipeline_loop_trailing_flush_matches_fused():
    """PipelineTrainLoop fed 3 microbatches with M=2 (one full window + a
    trailing partial) == fused trainer at accum_steps=2 fed the same three
    + flush_step (reference train.py:479-480 semantics)."""
    model, variables, images, labels = _model_and_batch()
    mb = B // M  # fused microbatch size
    micro = [(images[i * mb:(i + 1) * mb], labels[i * mb:(i + 1) * mb])
             for i in range(M)]
    extra_im = images[:mb][::-1].copy()
    extra_lb = labels[:mb][::-1].copy()
    micro.append((extra_im, extra_lb))

    # fused reference: 3 microbatch steps + trailing flush
    tx = build_optimizer(variables["params"], max_grad_norm=1.0, **OPT)
    fused = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=N_MIN, accum_steps=M)
    flush = make_flush_step(tx)
    fused_losses = []
    for im, lb in micro:
        fused, loss = step(fused, jnp.asarray(im), jnp.asarray(lb))
        fused_losses.append(float(loss))
    fused = flush(fused)

    # pipeline adapter fed the same microbatches
    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M,
        meshes=make_pipeline_meshes(n_stages=2, dp=1), max_grad_norm=1.0)
    loop = PipelineTrainLoop(pipe, pipe.init_state(variables))
    window_losses = [loop.feed(im, lb) for im, lb in micro]
    assert window_losses[0] is None  # mid-window buffers, no step yet
    assert window_losses[1] is not None
    assert window_losses[2] is None  # trailing microbatch buffered
    flush_loss = loop.flush()
    assert flush_loss is not None and np.isfinite(flush_loss)
    assert loop.flush() is None  # empty buffer is a no-op
    assert loop.step == 2  # one windowed step + one flush step

    # window loss is the mean unscaled microbatch loss of its window
    assert np.isclose(window_losses[1], np.mean(fused_losses[:2]), rtol=1e-4)
    _assert_tree_close(loop.variables["params"],
                       jax.device_get(fused.params), rtol=1e-4, atol=1e-6)
    _assert_tree_close(loop.ema_variables["params"],
                       jax.device_get(fused.ema.variables["params"]),
                       rtol=1e-4, atol=1e-6)


def test_pipeline_yolosem_equivalent_to_fused():
    """The second model family pipelines too: YOLO-sem's CSP trunk | FPN+heads
    split (pytree inter-stage activations — the (P3, P4, P5) pyramid) matches
    the fused trainer under the YOLO recipe's plain-CE loss."""
    from cabinet_tpu.models.yolosem import YOLOSem

    model = YOLOSem(n_classes=C, variant="n")
    rng = np.random.default_rng(3)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, H, W, 3)), train=True))

    tx = build_optimizer(variables["params"], max_grad_norm=1.0, **OPT)
    fused = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=N_MIN, accum_steps=M,
                           loss_type="ce")
    mb = B // M
    for m in range(M):
        fused, _ = step(fused, jnp.asarray(images[m * mb:(m + 1) * mb]),
                        jnp.asarray(labels[m * mb:(m + 1) * mb]))

    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M,
        meshes=make_pipeline_meshes(n_stages=2, dp=1),
        loss_type="ce", max_grad_norm=1.0,
        stage_keys=YOLOSEM_STAGE_KEYS, stage_methods=YOLOSEM_STAGE_METHODS)
    states = pipe.init_state(variables)
    assert set(states[0].params) == set(YOLOSEM_STAGE_KEYS[0])
    states, loss = pipe.train_step(states, images, labels)

    merged = pipe.merged_variables(states)
    _assert_tree_close(merged["params"], jax.device_get(fused.params),
                       rtol=1e-4, atol=1e-6)
    _assert_tree_close(merged["batch_stats"],
                       jax.device_get(fused.batch_stats),
                       rtol=1e-4, atol=1e-6)
    assert np.isfinite(float(loss))


def test_pipeline_3stage_yolosem_equivalent_to_fused():
    """The N-stage generalization (VERDICT r4 next #8): YOLO-sem's trunk
    cut at P3 gives trunk-front | trunk-back | neck+heads. The 3-stage
    pipeline must produce the same update as the fused trainer — the middle
    stage exercises the remat backward that chains activation cotangents
    (bwd_i returning (g_params, g_feat_in)) and the 3-way global-norm
    scalar exchange."""
    from cabinet_tpu.train.pipeline import (
        YOLOSEM_STAGE_KEYS_3,
        YOLOSEM_STAGE_METHODS_3,
    )
    from cabinet_tpu.models.yolosem import YOLOSem

    model = YOLOSem(n_classes=C, variant="n")
    rng = np.random.default_rng(3)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = rng.integers(0, C, (B, H, W)).astype(np.int32)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, H, W, 3)), train=True))

    # the split itself is numerics-neutral: backbone == back(front(x))
    full = model.apply(variables, jnp.asarray(images), train=False,
                       method=lambda mod, x, train: mod.backbone(x, train))
    front = model.apply(variables, jnp.asarray(images), train=False,
                        method=lambda mod, x, train: mod.backbone_front(
                            x, train))
    split = model.apply(variables, front, train=False,
                        method=lambda mod, f, train: mod.backbone_back(
                            f, train))
    for a, b in zip(full, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tx = build_optimizer(variables["params"], max_grad_norm=1.0, **OPT)
    fused = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=N_MIN, accum_steps=M,
                           loss_type="ce")
    mb = B // M
    fused_losses = []
    for m in range(M):
        fused, loss = step(fused, jnp.asarray(images[m * mb:(m + 1) * mb]),
                           jnp.asarray(labels[m * mb:(m + 1) * mb]))
        fused_losses.append(float(loss))

    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M,
        meshes=make_pipeline_meshes(n_stages=3, dp=1),
        loss_type="ce", max_grad_norm=1.0,
        stage_keys=YOLOSEM_STAGE_KEYS_3,
        stage_methods=YOLOSEM_STAGE_METHODS_3)
    states = pipe.init_state(variables)
    assert set(states[0].params) == set(YOLOSEM_STAGE_KEYS_3[0])
    assert set(states[1].params) == set(YOLOSEM_STAGE_KEYS_3[1])
    states, loss = pipe.train_step(states, images, labels)

    merged = pipe.merged_variables(states)
    _assert_tree_close(merged["params"], jax.device_get(fused.params),
                       rtol=1e-4, atol=1e-6)
    _assert_tree_close(merged["batch_stats"],
                       jax.device_get(fused.batch_stats),
                       rtol=1e-4, atol=1e-6)
    ema = pipe.merged_ema_variables(states)
    _assert_tree_close(ema["params"],
                       jax.device_get(fused.ema.variables["params"]),
                       rtol=1e-4, atol=1e-6)
    assert np.isclose(float(loss), np.mean(fused_losses), rtol=1e-4)
    assert all(int(s.step) == 1 for s in states)


@pytest.mark.slow
def test_pipeline_tp_composition_matches_fused():
    """PP x TP x DP: 2 stages, each on a (dp=2, tp=2) sub-mesh — stage
    params physically channel-sharded over the stage's model axis — must
    produce the fused trainer's update. Completes the scale-out
    composition matrix the r4 pipeline work opened (pp x aug and TP eval
    landed earlier in r5)."""
    from jax.sharding import PartitionSpec

    from cabinet_tpu.core.mesh import MODEL_AXIS

    model, variables, images, labels = _model_and_batch()
    fused, fused_loss = _fused_reference(model, variables, images, labels,
                                         1.0)

    meshes = make_pipeline_meshes(n_stages=2, dp=2, tp=2)
    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M, meshes=meshes, max_grad_norm=1.0)
    states = pipe.init_state(variables, tp_min_features=16)

    def tp_sharded(arr):
        spec = getattr(arr.sharding, "spec", PartitionSpec())
        return any(e == MODEL_AXIS or
                   (isinstance(e, tuple) and MODEL_AXIS in e) for e in spec)

    n_sharded = sum(tp_sharded(a) for s in states
                    for a in jax.tree_util.tree_leaves(s.params))
    assert n_sharded > 0, "tp=2 placement sharded no stage params"

    states, loss = pipe.train_step(states, images, labels)
    merged = pipe.merged_variables(states)
    _assert_tree_close(merged["params"], jax.device_get(fused.params),
                       rtol=1e-4, atol=1e-6)
    _assert_tree_close(merged["batch_stats"],
                       jax.device_get(fused.batch_stats),
                       rtol=1e-4, atol=1e-6)
    assert np.isclose(float(loss), fused_loss, rtol=1e-4)


def test_pipeline_requires_methods_beyond_two_stages():
    model, variables, *_ = _model_and_batch()
    with pytest.raises(ValueError, match="stage_methods"):
        CabinetPipeline(
            model,
            tx_factory=lambda p: build_optimizer(p, max_grad_norm=None,
                                                 **OPT),
            n_min=N_MIN, num_microbatches=M,
            meshes=make_pipeline_meshes(n_stages=3, dp=1),
            stage_keys=(("mobile",), ("sb", "ab"), ("ffm", "conv_out")))


def test_split_merge_roundtrip():
    model, variables, _, _ = _model_and_batch()
    parts = split_variables(variables, CABINET_STAGE_KEYS)
    assert set(parts[0]["params"]) == {"mobile"}
    assert set(parts[1]["params"]) == {"sb", "ab", "ffm", "conv_out"}
    merged = merge_variables(parts)
    _assert_tree_close(merged["params"], variables["params"], rtol=0, atol=0)
    _assert_tree_close(merged["batch_stats"], variables["batch_stats"],
                       rtol=0, atol=0)


def test_split_rejects_uncovered_modules():
    model, variables, _, _ = _model_and_batch()
    with pytest.raises(ValueError, match="do not cover"):
        split_variables(variables, (("mobile",), ("sb", "ab", "ffm")))


def test_pipeline_device_aug_equivalent_to_fused():
    """Pipeline built with aug_fn == fused trainer fed the PRE-augmented
    microbatches: the aug program runs on stage 0's mesh, its output feeds
    stage 0 and rides to stage 1 as data. The raw microbatch here is the
    3-operand (canvas, label_canvas, hw) tuple of the device-geometric
    loader contract (cli/train.py), exercising multi-operand routing."""
    model, variables, images, labels = _model_and_batch()

    # raw canvases: the aug crops the top-left (H, W) window and rescales —
    # deterministic (key unused), so the fused side can see identical data.
    S = H + 16
    rng = np.random.default_rng(3)
    canvas = rng.integers(0, 256, (B, S, S, 3)).astype(np.uint8)
    lbl_canvas = np.full((B, S, S), 255, np.uint8)
    lbl_canvas[:, :H, :W] = labels
    hw = np.tile(np.asarray([[H, W]], np.int32), (B, 1))

    def aug(cv, lc, hw_, key):
        del hw_, key
        return (cv[:, :H, :W].astype(jnp.float32) / 255.0,
                lc[:, :H, :W].astype(jnp.int32))

    pre_im = canvas[:, :H, :W].astype(np.float32) / 255.0
    fused, fused_loss = _fused_reference(model, variables, pre_im,
                                         labels, 1.0)

    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M,
        meshes=make_pipeline_meshes(n_stages=2, dp=2), max_grad_norm=1.0,
        aug_fn=jax.jit(aug))
    loop = PipelineTrainLoop(pipe, pipe.init_state(variables),
                             aug_key=jax.random.PRNGKey(0))
    mb = B // M
    wlosses = [loop.feed(canvas[m * mb:(m + 1) * mb],
                         lbl_canvas[m * mb:(m + 1) * mb],
                         hw[:mb]) for m in range(M)]
    assert wlosses[0] is None and wlosses[1] is not None

    _assert_tree_close(loop.variables["params"],
                       jax.device_get(fused.params), rtol=1e-4, atol=1e-6)
    _assert_tree_close(loop.ema_variables["params"],
                       jax.device_get(fused.ema.variables["params"]),
                       rtol=1e-4, atol=1e-6)
    assert np.isclose(wlosses[1], fused_loss, rtol=1e-4)


def test_pipeline_aug_requires_key():
    model, variables, *_ = _model_and_batch()
    pipe = CabinetPipeline(
        model,
        tx_factory=lambda p: build_optimizer(p, max_grad_norm=None, **OPT),
        n_min=N_MIN, num_microbatches=M,
        meshes=make_pipeline_meshes(n_stages=2, dp=1),
        aug_fn=lambda im, lb, key: (im, lb))
    loop = PipelineTrainLoop(pipe, pipe.init_state(variables))  # no aug_key
    with pytest.raises(ValueError, match="aug_key"):
        loop.feed(np.zeros((2, H, W, 3), np.float32),
                  np.zeros((2, H, W), np.int32))


def test_split_rejects_module_only_in_batch_stats():
    """Coverage is validated across ALL collections, not just params: a
    module present only in batch_stats must not be silently dropped."""
    variables = {"params": {"mobile": {"w": jnp.zeros(2)},
                            "sb": {"w": jnp.zeros(2)},
                            "ab": {"w": jnp.zeros(2)},
                            "ffm": {"w": jnp.zeros(2)},
                            "conv_out": {"w": jnp.zeros(2)}},
                 "batch_stats": {"orphan": {"mean": jnp.zeros(2)}}}
    with pytest.raises(ValueError, match="orphan"):
        split_variables(variables, CABINET_STAGE_KEYS)
