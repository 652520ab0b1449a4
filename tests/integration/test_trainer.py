"""Trainer numeric contracts (reference test_training_pipeline.py analogs):
accumulation equivalence, no mid-window param update, trailing flush,
EMA-on-real-step-only, optimizer-step counting, checkpoint round-trip,
and the sharded data-parallel step on the virtual 8-device CPU mesh."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.train.checkpoint import CheckpointManager
from cabinet_tpu.train.optimizer import build_optimizer
from cabinet_tpu.train.trainer import (
    create_train_state,
    make_eval_loss_step,
    make_flush_step,
    make_train_step,
)

N_CLASSES = 4


class MiniSeg(nn.Module):
    """Tiny segmentation net with BN + two heads, CABiNet-like signature."""

    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Conv(8, (3, 3), padding="SAME", name="mobile_conv")(x)
        if self.use_bn:
            h = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
                h, use_running_average=not train)
        h = nn.relu(h)
        final = nn.Conv(N_CLASSES, (1, 1), name="head")(h)
        aux = nn.Conv(N_CLASSES, (1, 1), name="aux_head")(h)
        return final, aux


def setup(accum_steps=1, lr=0.1, n_min=None, batch_hw=(2, 8, 8),
          max_grad_norm=None, use_bn=True):
    model = MiniSeg(use_bn=use_bn)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    tx = build_optimizer(variables["params"], lr0=lr, max_iter=1000,
                         momentum=0.9, wd=0.0, warmup_steps=0,
                         max_grad_norm=max_grad_norm)
    state = create_train_state(variables, tx)
    B, H, W = batch_hw
    if n_min is None:
        n_min = B * H * W  # thresh large + n_min=all => plain masked mean
    # exact top_k selection so the accumulation-equivalence contract is
    # bit-tight (bisect's boundary handling differs by O(1/N) at the cut)
    step = make_train_step(model.apply, tx, n_min=n_min, thresh=1e9,
                           accum_steps=accum_steps, ohem_method="topk")
    return model, tx, state, step


def batch(seed, B=2, H=8, W=8):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, N_CLASSES, (B, H, W))))


def test_accumulation_equivalent_to_full_batch():
    # Two micro-batches of 2 with accum=2  ==  one batch of 4 with accum=1
    # (mean CE loss: mean of equal-size means == full mean). BN disabled —
    # per-micro-batch statistics make exact equivalence impossible (true of
    # the torch reference as well).
    imgs1, lbs1 = batch(0)
    imgs2, lbs2 = batch(1)
    full_imgs = jnp.concatenate([imgs1, imgs2])
    full_lbs = jnp.concatenate([lbs1, lbs2])

    _, _, state_a, step_a = setup(accum_steps=2, use_bn=False)
    state_a, _ = step_a(state_a, imgs1, lbs1)
    state_a, _ = step_a(state_a, imgs2, lbs2)

    _, _, state_b, step_b = setup(accum_steps=1, batch_hw=(4, 8, 8),
                                  use_bn=False)
    state_b, _ = step_b(state_b, full_imgs, full_lbs)

    assert int(state_a.step) == 1 and int(state_b.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_params_unchanged_mid_window():
    _, _, state, step = setup(accum_steps=3)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    imgs, lbs = batch(2)
    state, _ = step(state, imgs, lbs)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.micro_step) == 1
    assert int(state.step) == 0
    # accumulated grads are non-zero
    assert float(sum(jnp.abs(g).sum()
                     for g in jax.tree_util.tree_leaves(state.accum_grads))) > 0


def test_trailing_partial_window_flush():
    _, tx, state, step = setup(accum_steps=4)
    imgs, lbs = batch(3)
    state, _ = step(state, imgs, lbs)  # 1 of 4 micro-batches
    flush = make_flush_step(tx)
    p_before = jax.tree_util.tree_map(np.asarray, state.params)
    state = flush(state)
    assert int(state.step) == 1
    assert int(state.micro_step) == 0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p_before),
                        jax.tree_util.tree_leaves(state.params)))
    assert changed
    # flushing again is a no-op
    state2 = flush(state)
    assert int(state2.step) == 1


def test_ema_advances_only_on_real_steps():
    _, _, state, step = setup(accum_steps=2)
    imgs, lbs = batch(4)
    state, _ = step(state, imgs, lbs)
    assert int(state.ema.updates) == 0  # mid-window: EMA untouched
    state, _ = step(state, imgs, lbs)
    assert int(state.ema.updates) == 1
    assert int(state.step) == 1


def test_ema_distinct_from_raw_after_steps():
    _, _, state, step = setup(accum_steps=1, lr=0.5)
    for s in range(3):
        imgs, lbs = batch(s)
        state, _ = step(state, imgs, lbs)
    raw = jax.tree_util.tree_leaves(state.params)
    ema = jax.tree_util.tree_leaves(state.ema.variables["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(raw, ema))


def test_step_counts_optimizer_steps():
    _, _, state, step = setup(accum_steps=2)
    for s in range(6):
        imgs, lbs = batch(s)
        state, _ = step(state, imgs, lbs)
    assert int(state.step) == 3  # 6 micro-batches / accum 2


def test_loss_is_finite_and_decreases_on_average():
    _, _, state, step = setup(accum_steps=1, lr=0.05)
    imgs, lbs = batch(7)
    losses = []
    for _ in range(12):
        state, loss = step(state, imgs, lbs)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_eval_loss_step_runs():
    model, _, state, step = setup()
    imgs, lbs = batch(8)
    eval_loss = make_eval_loss_step(model.apply, n_min=2 * 8 * 8, thresh=1e9)
    v = float(eval_loss(state.variables, imgs, lbs))
    assert np.isfinite(v)


def test_checkpoint_roundtrip_continues_identically(tmp_path):
    _, tx, state, step = setup(accum_steps=2, lr=0.1)
    for s in range(3):
        imgs, lbs = batch(s)
        state, _ = step(state, imgs, lbs)

    mgr = CheckpointManager(tmp_path)
    mgr.save_full("checkpoint_last", state, epoch=5, best_miou=0.5,
                  best_loss=1.2, stopper_state={"best_fitness": 0.5,
                                                "best_epoch": 4})

    _, _, fresh, step2 = setup(accum_steps=2, lr=0.1)
    restored = mgr.restore_full("checkpoint_last", fresh)
    assert restored["epoch"] == 5
    assert restored["best_miou"] == 0.5
    rstate = restored["state"]
    assert int(rstate.step) == int(state.step)
    assert int(rstate.micro_step) == int(state.micro_step)

    # both continue with the same batch and stay identical
    imgs, lbs = batch(99)
    state, la = step(state, imgs, lbs)
    rstate, lb_ = step2(rstate, imgs, lbs)
    np.testing.assert_allclose(float(la), float(lb_), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(rstate.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_any_checkpoint_accepts_full_checkpoints(tmp_path):
    """Consumers accept FULL train checkpoints, not only variables artifacts
    (reference evaluate.py:259-267 loads either a raw state_dict or a full
    checkpoint's model_state): load_any_checkpoint extracts the raw
    params/batch_stats from a fused checkpoint_last, and merges per-stage
    sub-trees from a pipeline one."""
    from types import SimpleNamespace

    from cabinet_tpu.train.checkpoint import load_any_checkpoint

    _, tx, state, step = setup(accum_steps=1)
    imgs, lbs = batch(0)
    state, _ = step(state, imgs, lbs)
    stopper = {"best_fitness": 0.0, "best_epoch": 0}

    mgr = CheckpointManager(tmp_path)
    mgr.save_full("checkpoint_last", state, 0, 0.0, 1.0, stopper)
    template = jax.tree_util.tree_map(np.zeros_like,
                                      jax.device_get(state.variables))
    loaded = load_any_checkpoint(tmp_path / "checkpoint_last", template)
    assert set(loaded) >= {"params", "batch_stats"}
    for a, b in zip(jax.tree_util.tree_leaves(loaded["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pipeline-kind full checkpoint: two stage sub-trees merge back
    host = jax.device_get(state.variables)
    parts = ({"params": {k: host["params"][k]
                         for k in ("mobile_conv", "bn")},
              "batch_stats": {"bn": host["batch_stats"]["bn"]}},
             {"params": {k: host["params"][k] for k in ("head", "aux_head")},
              "batch_stats": {}})
    stages = [SimpleNamespace(params=p["params"],
                              batch_stats=p["batch_stats"],
                              opt_state={"dummy": np.zeros(2)},
                              step=np.int32(1),
                              ema=SimpleNamespace(variables=p,
                                                  updates=np.int32(1)))
              for p in parts]
    mgr.save_pipeline_full("pp_last", stages, 0, 0.0, 1.0, stopper)
    merged = load_any_checkpoint(tmp_path / "pp_last", template)
    assert set(merged["params"]) == set(host["params"])
    for k in host["params"]:
        for a, b in zip(jax.tree_util.tree_leaves(merged["params"][k]),
                        jax.tree_util.tree_leaves(host["params"][k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_train_step_matches_single_device():
    """DP over the 8-device CPU mesh == single-device, same batch."""
    from cabinet_tpu.core.mesh import batch_sharding, make_mesh, replicate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    imgs, lbs = batch(0, B=8)

    _, _, state_s, step_s = setup(accum_steps=1, batch_hw=(8, 8, 8))
    state_s, loss_s = step_s(state_s, imgs, lbs)

    mesh = make_mesh(n_data=8)
    _, _, state_m, step_m = setup(accum_steps=1, batch_hw=(8, 8, 8))
    state_m = replicate(state_m, mesh)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh, 4))
    lbs_sh = jax.device_put(lbs, batch_sharding(mesh, 3))
    state_m, loss_m = step_m(state_m, imgs_sh, lbs_sh)

    # Per-device BN stats and per-device OHEM pixel pools make tiny numeric
    # differences possible in principle; with this loss config (masked mean)
    # the results must agree to float tolerance.
    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state_s.params),
                    jax.tree_util.tree_leaves(state_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_cabinet_converges_on_learnable_task():
    """Full CABiNet trains to well under half the initial loss on a task
    representable at its /8 output resolution. (On real TPU hardware the
    bf16 run matches this f32 curve to 3 decimals: 2.518 -> 1.054.)"""
    from cabinet_tpu.models import CABiNet

    cfgs = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
            [5, 6, 96, 1, 1, 2]]
    model = CABiNet(n_classes=3, mode="small", cfgs=cfgs)
    B, H, W = 2, 32, 32
    rng = np.random.default_rng(0)
    coarse = rng.normal(size=(B, 4, 4, 3)).astype(np.float32)
    base = np.repeat(np.repeat(coarse, 8, axis=1), 8, axis=2)
    labels = ((base[..., 0] > 0).astype(np.int64)
              + (base[..., 1] > 0).astype(np.int64))
    imgs, lbls = jnp.asarray(base), jnp.asarray(labels)

    variables = model.init(jax.random.PRNGKey(0), imgs, train=True)
    tx = build_optimizer(variables["params"], lr0=0.01, max_iter=500,
                         warmup_steps=5, max_grad_norm=1.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=B * H * W, thresh=1e9)
    first = last = None
    for i in range(80):
        state, loss = step(state, imgs, lbls)
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.6, (first, last)
