"""Fused stem+block0 kernel vs its XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.ops import early_stage as es


def _rand_params(rng):
    return (
        jnp.asarray(rng.normal(size=(16, 27)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(3, 3, 16)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1),
    )


def test_pack_input_planes_layout():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    p = es.pack_input_planes(x, pad_bottom=3)  # Hp = 8+3+3 = 14
    assert p.shape == (1, 3, 2, 2, 7, 4)
    # planes[b, c, wp, hp, hh, w] == padded[b, 2*hh+hp, 2*w+wp, c],
    # padded row = orig + 3
    # orig row 2 -> padded 5 -> hp=1, hh=2 ; orig col 4 -> wp=0, w=2
    np.testing.assert_allclose(np.asarray(p[0, 1, 0, 1, 2, 2]),
                               np.asarray(x[0, 2, 4, 1]))
    # orig row 4 -> padded 7 -> hp=1, hh=3 ; orig col 1 -> wp=1, w=0
    np.testing.assert_allclose(np.asarray(p[0, 2, 1, 1, 3, 0]),
                               np.asarray(x[0, 4, 1, 2]))
    # top padding rows (padded rows 0..2 -> hh 0 both parities + hh1 hp0)
    assert float(jnp.abs(p[:, :, :, :, 0]).max()) == 0.0


@pytest.mark.parametrize("H,W", [(256, 256), (128, 256)])
def test_fused_kernel_matches_xla_reference(H, W, monkeypatch):
    monkeypatch.setattr(es, "F_BAND", 32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
    params = _rand_params(rng)

    # the kernel packs the input to bf16 — compare against the reference on
    # the same quantized input
    xq = x.astype(jnp.bfloat16).astype(jnp.float32)
    want = es.stem_block0_reference(xq, *params)  # (B, H/2, W/2, 16) NHWC
    got = es.fused_stem_block0(x, *params, interpret=True)  # planes
    got_nhwc = np.asarray(got).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got_nhwc, np.asarray(want), atol=2e-4,
                               rtol=1e-3)


def test_fused_apply_end_to_end_parity():
    """make_fused_apply (Pallas early stage, interpret mode) matches the
    standard CABiNet apply at the logit level over the same params."""
    from cabinet_tpu.models import CABiNet, make_fused_apply
    from cabinet_tpu.models.mobilenetv3 import MOBILENETV3_LARGE_CFGS

    rng = np.random.default_rng(3)
    model = CABiNet(n_classes=6, mode="large",
                    cfgs=tuple(map(tuple, MOBILENETV3_LARGE_CFGS[:4])))
    # bf16-quantize the input up front: the kernel packs to bf16 internally,
    # so this makes both paths consume identical values.
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32))
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial batch stats so BN folding is exercised
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) ** 2 + 0.5, a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    want_final, want_aux = model.apply(variables, x, train=False)
    forward = make_fused_apply(model, variables, interpret=True)
    got_final, got_aux = forward(x)

    np.testing.assert_allclose(np.asarray(got_final), np.asarray(want_final),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_aux), np.asarray(want_aux),
                               atol=2e-3, rtol=1e-3)


def test_fused_apply_rejects_unsupported():
    """Small-mode block_0 (SE, stride 2) and non-band-aligned shapes fall
    back with a clear error instead of silently wrong numerics."""
    from cabinet_tpu.models import CABiNet, fused_early_supported, make_fused_apply
    from cabinet_tpu.models.mobilenetv3 import MOBILENETV3_SMALL_CFGS

    model = CABiNet(n_classes=4, mode="small",
                    cfgs=tuple(map(tuple, MOBILENETV3_SMALL_CFGS[:4])))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="block_0"):
        make_fused_apply(model, variables)

    assert not fused_early_supported((1, 63, 64, 3))   # odd H
    assert not fused_early_supported((1, 96, 256, 3), interpret=True)  # 48 rows
    # compiled path: Mosaic needs the W/2 lane dim 128-aligned
    assert not fused_early_supported((1, 64, 64, 3))
    assert fused_early_supported((1, 64, 64, 3), interpret=True)
    assert fused_early_supported((1, 1024, 1024, 3))


def test_mobilenet_tail_matches_full_forward():
    """mobile.tail(block_0(stem(x))) == mobile(x) — the seam the fused
    kernel plugs into is numerically the identity split."""
    from cabinet_tpu.models.mobilenetv3 import MOBILENETV3_LARGE_CFGS, MobileNetV3
    from cabinet_tpu.models.layers import hard_swish

    rng = np.random.default_rng(4)
    model = MobileNetV3(cfgs=tuple(map(tuple, MOBILENETV3_LARGE_CFGS[:3])),
                        mode="large")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    full = model.apply(variables, x, train=False)

    def split(mdl, x):
        h = mdl.stem(x)
        h = mdl.stem_bn(h, use_running_average=True)
        h = hard_swish(h)
        h = mdl.block[0](h, train=False)
        return mdl.tail(h, train=False)

    via_tail = model.apply(variables, x, method=split)
    np.testing.assert_allclose(np.asarray(via_tail), np.asarray(full),
                               atol=0, rtol=0)


def test_fold_matches_unfused_model():
    """Folded weights through the XLA reference == the real model's first
    two stages (inference BN)."""
    from cabinet_tpu.models.mobilenetv3 import MOBILENETV3_LARGE_CFGS, MobileNetV3

    rng = np.random.default_rng(2)
    model = MobileNetV3(cfgs=tuple(map(tuple, MOBILENETV3_LARGE_CFGS[:1])),
                        mode="large")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch stats so BN folding is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) ** 2 + 0.5, a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    params = es.fold_stem_block0_params(variables["params"],
                                        variables["batch_stats"])
    got = es.stem_block0_reference(x, *params)

    # ground truth: run the model's stem + block_0 directly
    import flax.linen as nn

    class Sub(nn.Module):
        @nn.compact
        def __call__(self, x):
            from cabinet_tpu.models.layers import batch_norm, hard_swish
            from cabinet_tpu.models.mobilenetv3 import InvertedResidual, _conv

            h = _conv(16, 3, 2, jnp.float32, "stem")(x)
            h = batch_norm(jnp.float32, "stem_bn")(h, use_running_average=True)
            h = hard_swish(h)
            return InvertedResidual(16, 16, 3, 1, False, False,
                                    name="block_0")(h, train=False)

    want = Sub().apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=1e-3)
