"""Warmup+poly schedule and grouped-SGD contract tests
(reference test_training_pipeline.py:759-835 analog)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cabinet_tpu.train.optimizer import (
    NOWD,
    NOWD_X,
    WD,
    WD_X,
    build_optimizer,
    param_labels,
    warmup_poly_schedule,
)


def ref_lr(it, lr0, warmup_steps, warmup_start, max_iter, power):
    """Reference get_lr (optimizer.py:124-138)."""
    if it < warmup_steps:
        return warmup_start + (it / warmup_steps) * (lr0 - warmup_start)
    k = max((it - warmup_steps) / (max_iter - warmup_steps), 0.0)
    return lr0 * (1 - k) ** power


def test_schedule_matches_reference_formula():
    sched = warmup_poly_schedule(5e-3, max_iter=1000, power=0.9,
                                 warmup_steps=100, warmup_start_lr=1e-5)
    for it in [0, 1, 50, 99, 100, 101, 500, 999, 1000]:
        want = ref_lr(it, 5e-3, 100, 1e-5, 1000, 0.9)
        np.testing.assert_allclose(float(sched(it)), want, rtol=1e-5,
                                   err_msg=f"it={it}")


def test_schedule_zero_after_max_iter():
    sched = warmup_poly_schedule(5e-3, max_iter=100, power=0.9)
    assert float(sched(100)) == 0.0
    assert float(sched(5000)) == 0.0  # clamped, not NaN


def test_param_labels_decoder_split():
    params = {
        "mobile": {"stem": {"kernel": jnp.zeros((3, 3, 3, 16))},
                   "stem_bn": {"scale": jnp.ones(16), "bias": jnp.zeros(16)},
                   "block_0": {"se": {"fc1": {"kernel": jnp.zeros((16, 8)),
                                              "bias": jnp.zeros(8)}}}},
        "sb": {"conv1": {"conv": {"kernel": jnp.zeros((7, 7, 3, 64))}}},
        "ab": {"conva": {"kernel": jnp.zeros((3, 3, 960, 256))},
               "a2block": {"gamma": jnp.zeros(1)},
               "convb": {"kernel": jnp.zeros((1, 1, 256, 256)),
                         "bias": jnp.zeros(256)}},
        "ffm": {"convblk": {"conv": {"kernel": jnp.zeros((1, 1, 384, 256))}}},
        "conv_out": {"conv_out": {"kernel": jnp.zeros((1, 1, 256, 8))}},
    }
    labels = param_labels(params)
    assert labels["mobile"]["stem"]["kernel"] == WD
    assert labels["mobile"]["stem_bn"]["scale"] == NOWD
    # SE dense kernels are no-wd, like the reference's isinstance(Conv2d) test.
    assert labels["mobile"]["block_0"]["se"]["fc1"]["kernel"] == NOWD
    assert labels["sb"]["conv1"]["conv"]["kernel"] == WD
    assert labels["ab"]["conva"]["kernel"] == WD_X
    assert labels["ab"]["a2block"]["gamma"] == NOWD_X
    assert labels["ab"]["convb"]["bias"] == NOWD_X
    assert labels["ffm"]["convblk"]["conv"]["kernel"] == WD_X
    assert labels["conv_out"]["conv_out"]["kernel"] == WD_X


def test_sgd_matches_torch_sgd():
    """Grouped transform == torch SGD (momentum, per-group wd/lr) step-for-step."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 4)).astype(np.float32)  # conv-kernel-ish (wd)
    b0 = rng.normal(size=(4,)).astype(np.float32)  # bias (no wd)

    params = {"mobile": {"c": {"kernel": jnp.asarray(w0.reshape(2, 2, 2, 2)),
                               "bias": jnp.asarray(b0)}}}
    lr0, wd, mom, T = 0.01, 5e-4, 0.9, 50
    tx = build_optimizer(params, lr0=lr0, max_iter=T, momentum=mom, wd=wd,
                         power=0.9, warmup_steps=5, warmup_start_lr=1e-5)
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = torch.optim.SGD([
        {"params": [tw], "weight_decay": wd},
        {"params": [tb], "weight_decay": 0.0},
    ], lr=lr0, momentum=mom)

    for it in range(10):
        gw = rng.normal(size=(4, 4)).astype(np.float32)
        gb = rng.normal(size=(4,)).astype(np.float32)
        grads = {"mobile": {"c": {"kernel": jnp.asarray(gw.reshape(2, 2, 2, 2)),
                                  "bias": jnp.asarray(gb)}}}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

        lr = ref_lr(it, lr0, 5, 1e-5, T, 0.9)
        for g in topt.param_groups:
            g["lr"] = lr
        tw.grad = torch.from_numpy(gw)
        tb.grad = torch.from_numpy(gb)
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["mobile"]["c"]["kernel"]).reshape(4, 4),
        tw.detach().numpy(), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["mobile"]["c"]["bias"]),
                               tb.detach().numpy(), rtol=2e-5, atol=1e-7)


def test_grad_clipping_caps_norm():
    params = {"mobile": {"c": {"kernel": jnp.zeros((1, 1, 2, 2))}}}
    tx = build_optimizer(params, lr0=1.0, max_iter=10, momentum=0.0, wd=0.0,
                         max_grad_norm=1.0)
    state = tx.init(params)
    grads = {"mobile": {"c": {"kernel": jnp.full((1, 1, 2, 2), 100.0)}}}
    updates, _ = tx.update(grads, state, params)
    norm = float(optax.global_norm(updates))
    # lr at step 0 with no warmup = lr0 -> update norm == clipped grad norm.
    np.testing.assert_allclose(norm, 1.0, rtol=1e-5)
