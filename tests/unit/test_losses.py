"""OHEM / focal loss numeric-contract tests (reference test_loss.py analog).

The oracle below re-implements the reference algorithm (loss.py:38-80)
directly in numpy with dynamic shapes; the static-shape JAX version must agree
on every branch: above-threshold mean, top-n_min mean, n_min clamping, ignore
handling, class weights, and the empty-valid-mask zero case.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.train.losses import (
    cross_entropy_mean,
    ohem_cross_entropy,
    softmax_focal_loss,
)


def _np_ce(logits, labels, ignore, weights=None):
    x = logits.astype(np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
    valid = labels != ignore
    safe = np.where(valid, labels, 0)
    loss = -np.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if weights is not None:
        loss = loss * weights[safe]
    return np.where(valid, loss, 0.0), valid


def ohem_oracle(logits, labels, n_min, thresh=0.7, ignore=255, weights=None):
    loss, valid = _np_ce(logits, labels, ignore, weights)
    flat = loss[valid]
    if flat.size == 0:
        return 0.0
    srt = np.sort(flat)[::-1]
    n = min(n_min, srt.size)
    if srt[n - 1] > thresh:
        return srt[srt > thresh].mean()
    return srt[:n].mean()


@pytest.mark.parametrize("seed,n_min,thresh", [(0, 10, 0.7), (1, 500, 0.7),
                                               (2, 64, 3.0), (3, 1, 0.01)])
def test_ohem_matches_oracle(seed, n_min, thresh):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(2, 16, 16, 5)).astype(np.float32) * 3
    labels = rng.integers(0, 5, (2, 16, 16)).astype(np.int32)
    labels[0, :4, :4] = 255
    got = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   n_min=n_min, thresh=thresh))
    want = ohem_oracle(logits, labels, n_min, thresh)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_ohem_all_ignored_is_zero():
    logits = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)
    labels = np.full((1, 8, 8), 255, np.int32)
    got = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), n_min=4))
    assert got == 0.0


def test_ohem_class_weights():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (1, 8, 8)).astype(np.int32)
    w = np.array([0.5, 2.0, 1.0, 3.0], np.float32)
    got = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   n_min=16, class_weights=jnp.asarray(w)))
    want = ohem_oracle(logits, labels, 16, weights=w)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_ohem_n_min_clamped_to_valid():
    # Fewer valid pixels than n_min: mean over all valid (reference :71-74).
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    labels = np.full((1, 4, 4), 255, np.int32)
    labels[0, 0, :3] = [0, 1, 2]
    got = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   n_min=100, thresh=100.0))
    want = ohem_oracle(logits, labels, 100, thresh=100.0)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_ohem_is_differentiable():
    import jax

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (1, 8, 8)).astype(np.int32))
    g = jax.grad(lambda lg: ohem_cross_entropy(lg, labels, n_min=8))(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_focal_loss_against_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 6, 6, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 6, 6)).astype(np.int64)
    labels[0, 0] = 255
    w = np.array([1.0, 2.0, 0.5, 1.5, 1.0], np.float32)
    gamma = 2.0

    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    prob = F.softmax(tl, dim=1)
    focal = (1 - prob) ** gamma * F.log_softmax(tl, dim=1)
    want = F.nll_loss(focal, torch.from_numpy(labels),
                      weight=torch.from_numpy(w), ignore_index=255).item()

    got = float(softmax_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   gamma=gamma, class_weights=jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_cross_entropy_mean_against_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 5, 5)).astype(np.int64)
    labels[1, 2] = 255
    want = F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                           torch.from_numpy(labels), ignore_index=255).item()
    got = float(cross_entropy_mean(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


@pytest.mark.parametrize("seed,n_min,thresh", [(0, 10, 0.7), (1, 500, 0.7),
                                               (2, 64, 3.0), (3, 1, 0.01)])
def test_ohem_bisect_matches_topk(seed, n_min, thresh):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(2, 16, 16, 5)).astype(np.float32) * 3
    labels = rng.integers(0, 5, (2, 16, 16)).astype(np.int32)
    labels[0, :4, :4] = 255
    a = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                 n_min=n_min, thresh=thresh, method="topk"))
    b = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                 n_min=n_min, thresh=thresh, method="bisect"))
    np.testing.assert_allclose(b, a, rtol=1e-5)


def test_ohem_bisect_gradients_match_topk():
    import jax

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (1, 8, 8)).astype(np.int32))
    ga = jax.grad(lambda lg: ohem_cross_entropy(lg, labels, n_min=8,
                                                method="topk"))(logits)
    gb = jax.grad(lambda lg: ohem_cross_entropy(lg, labels, n_min=8,
                                                method="bisect"))(logits)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=1e-5)
