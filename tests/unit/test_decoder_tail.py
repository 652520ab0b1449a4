"""Fused FFM+head Pallas kernels (ops/decoder_tail.py) vs the Flax modules,
interpret mode (CPU). The decoder tail's channel widths (128/256/384) are
architecture constants, so a truncated backbone still exercises the real
kernel shapes; S=32 at 256^2 input."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.models import CABiNet
from cabinet_tpu.models.cab import resize_bilinear
from cabinet_tpu.ops.decoder_tail import (
    fold_tail_params,
    fused_ffm_head,
    fused_tail_supported,
)

CFGS = [[3, 1, 16, 0, 0, 1], [3, 4, 24, 0, 0, 2], [5, 3, 40, 1, 0, 2],
        [5, 6, 96, 1, 1, 2]]


@pytest.fixture(scope="module")
def setup():
    model = CABiNet(n_classes=8, mode="large", cfgs=CFGS)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    # non-trivial batch_stats so BN folding is actually exercised
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.default_rng(0).standard_normal(v.shape)
        .astype(v.dtype) if v.ndim > 0 else v, variables)
    return model, variables


def _branches(model, variables, images):
    def meth(m, x, train):
        mob = m.mobile(x, train)
        feat_sb = m.sb(x, train)
        low_res, aux = m.ab(mob, train)
        return feat_sb, low_res, aux

    return model.apply(variables, images, False, method=meth)


def test_fused_tail_matches_flax_modules(setup):
    model, variables = setup
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    feat_sb, low_res, aux = _branches(model, variables, images)
    fcp = resize_bilinear(low_res, feat_sb.shape[1:3])

    def ref_meth(m, a, b, train):
        return m.conv_out(m.ffm(a, b, train), train)

    ref = model.apply(variables, feat_sb, fcp, False, method=ref_meth)

    folded = fold_tail_params(variables, dtype=jnp.float32)
    out = fused_ffm_head(feat_sb, fcp, folded, interpret=True)

    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err < 2e-4 * scale, f"max err {err} vs scale {scale}"


def test_fused_tail_full_forward_parity(setup):
    """End-to-end: the fused-tail apply matches model.apply final logits."""
    model, variables = setup
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(1, 256, 256, 3)).astype(np.float32))
    ref_final, _ = model.apply(variables, images, train=False)

    from cabinet_tpu.models.fused import make_fused_tail_apply

    forward = make_fused_tail_apply(model, variables, interpret=True)
    out_final, out_aux = forward(images)
    assert out_final.shape == ref_final.shape
    err = float(jnp.max(jnp.abs(out_final - ref_final)))
    scale = float(jnp.max(jnp.abs(ref_final))) + 1e-6
    assert err < 2e-4 * scale, f"max err {err} vs scale {scale}"
    assert np.isfinite(np.asarray(out_aux, np.float32)).all()


def test_supported_predicate():
    assert fused_tail_supported(128, 128)   # 1024^2 input
    assert fused_tail_supported(32, 32)
    assert fused_tail_supported(90, 90)     # 720^2 (AeroScapes): rt=15
    assert fused_tail_supported(16, 16)     # 128^2: rt=8, 2 row tiles
    assert not fused_tail_supported(128, 64)
    assert not fused_tail_supported(6, 6)     # no workable row tile
    assert not fused_tail_supported(272, 272)  # plane exceeds VMEM budget
    # a prime S has no workable row tile
    assert not fused_tail_supported(127, 127)
    # classifier pads into one 128-lane block; more classes must fall back
    assert fused_tail_supported(128, 128, 128)
    assert not fused_tail_supported(128, 128, 129)


def test_row_tile_selection():
    from cabinet_tpu.ops.decoder_tail import _row_tile

    assert _row_tile(128) == 16
    assert _row_tile(90) == 15
    assert _row_tile(40) == 10
    assert _row_tile(127) == 0


def test_fused_tail_s90_matches_flax_modules(setup):
    """720^2-input grid (S=90, row tile 15 — the AeroScapes serving shape
    that silently fell back in r2)."""
    model, variables = setup
    rng = np.random.default_rng(7)
    feat_sb = jnp.asarray(rng.normal(size=(1, 90, 90, 128)).astype(np.float32))
    fcp = jnp.asarray(rng.normal(size=(1, 90, 90, 256)).astype(np.float32))

    def ref_meth(m, a, b, train):
        return m.conv_out(m.ffm(a, b, train), train)

    ref = model.apply(variables, feat_sb, fcp, False, method=ref_meth)
    folded = fold_tail_params(variables, dtype=jnp.float32)
    out = fused_ffm_head(feat_sb, fcp, folded, interpret=True)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err < 2e-4 * scale, f"max err {err} vs scale {scale}"


def test_fused_tail_with_early_stage_composes(setup):
    """use_early=True routes stem+block_0 through the early-stage kernel
    and the tail through the decoder kernels — the full serving path."""
    model, variables = setup
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.normal(size=(1, 256, 256, 3)).astype(np.float32))
    ref_final, _ = model.apply(variables, images, train=False)

    from cabinet_tpu.models.fused import make_fused_tail_apply

    forward = make_fused_tail_apply(model, variables, interpret=True,
                                    use_early=True)
    out_final, _ = forward(images)
    err = float(jnp.max(jnp.abs(out_final - ref_final)))
    scale = float(jnp.max(jnp.abs(ref_final))) + 1e-6
    assert err < 5e-4 * scale, f"max err {err} vs scale {scale}"
