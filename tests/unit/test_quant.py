"""int8 PTQ serving path (cabinet_tpu/quant.py): calibration, interception,
numerics vs the float model. CPU-only (int8 convs lower on every backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.models import CABiNet
from cabinet_tpu.quant import (
    collect_act_scales,
    default_site_predicate,
    make_quantized_apply,
    quantization_report,
)

CFGS = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
        [5, 6, 96, 1, 1, 2]]


@pytest.fixture(scope="module")
def setup():
    model = CABiNet(n_classes=3, mode="small", cfgs=CFGS)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    return model, variables, batch


def test_calibration_selects_mxu_convs_only(setup):
    model, variables, batch = setup
    scales = collect_act_scales(model, variables, [batch])
    assert scales, "no quantization sites found"
    for key, scale in scales.items():
        assert scale > 0
    # 3-channel stems excluded (spatial-branch conv1, backbone stem)
    assert not any(key.endswith("stem") for key in scales)
    assert "sb/conv1/conv" not in scales
    # n_classes classifier heads excluded (cout=3 < 16)
    assert not any("conv_out/conv_out" in key or key.endswith("b4")
                   for key in scales)
    # the big decoder convs are in
    assert any("ffm/convblk" in key for key in scales)
    assert any("conv_out/conv" in key for key in scales)
    # backbone expand/project 1x1s are in
    assert any("expand" in key for key in scales)


def test_empty_scales_is_bitwise_reference(setup):
    model, variables, batch = setup
    q_apply = make_quantized_apply(model, {})
    ref, ref_aux = model.apply(variables, batch, train=False)
    out, aux = q_apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(ref_aux), np.asarray(aux))


def test_quantized_forward_tracks_float_model(setup):
    model, variables, batch = setup
    scales = collect_act_scales(model, variables, [batch])
    report = quantization_report(model, variables, scales, batch, train=False)
    assert report["n_quantized_convs"] == len(scales) > 5
    # random-weight logits are small; agreement is the robust signal
    assert report["argmax_agreement"] > 0.95
    assert np.isfinite(report["mean_abs_logit_delta"])
    ref, _ = model.apply(variables, batch, train=False)
    spread = float(jnp.std(ref.astype(jnp.float32)))
    assert report["mean_abs_logit_delta"] < 0.25 * max(spread, 1e-6)


def test_partial_quantization_filters_sites(setup):
    model, variables, batch = setup
    scales = collect_act_scales(model, variables, [batch])
    decoder_only = {k: v for k, v in scales.items()
                    if k.startswith(("ffm", "conv_out", "ab"))}
    assert 0 < len(decoder_only) < len(scales)
    q_apply = make_quantized_apply(model, decoder_only)
    out, _ = q_apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_calibration_max_over_batches(setup):
    model, variables, batch = setup
    small = collect_act_scales(model, variables, [batch * 0.1])
    both = collect_act_scales(model, variables, [batch * 0.1, batch])
    big = collect_act_scales(model, variables, [batch])
    for key in big:
        assert both[key] == pytest.approx(max(big[key], small[key]))


def test_quantized_apply_drives_msc_eval(setup):
    """q_apply is a drop-in apply_fn for the sliding-window evaluator
    (the cli.evaluate `+runtime.quantize=int8` path)."""
    from cabinet_tpu.eval.evaluator import MscEval

    model, variables, batch = setup
    scales = collect_act_scales(model, variables, [batch])
    q_apply = make_quantized_apply(model, scales)
    ev = MscEval(q_apply, n_classes=3, scales=(1.0,), cropsize=32)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 48, 40, 3)).astype(np.float32)
    lbl = rng.integers(0, 3, (1, 48, 40)).astype(np.int64)
    hist = ev.hist_batch(variables, img, lbl)
    assert hist.sum() == 48 * 40


def test_site_predicate_contract():
    assert default_site_predicate(("x",), (3, 3, 256, 256))
    assert not default_site_predicate(("x",), (7, 7, 3, 64))    # 3-ch input
    assert not default_site_predicate(("x",), (1, 1, 256, 8))   # class head
    # classifier heads stay float EVEN when cout >= 16 (e.g. Cityscapes 19):
    # matched by conv name, not width
    assert not default_site_predicate(("conv_out", "conv_out"), (1, 1, 256, 19))
    assert not default_site_predicate(("ab", "b4"), (1, 1, 128, 19))
    assert not default_site_predicate(("classifier",), (1, 1, 256, 19))
    assert not default_site_predicate(("aux_classifier",), (1, 1, 256, 19))
    # ...but ConvBNReLU blocks under a module *named* conv_out still quantize
    assert default_site_predicate(("conv_out", "conv", "conv"), (3, 3, 256, 256))


def test_depthwise_sites_opt_in(setup):
    """quantize_depthwise=True adds DepthwiseConv2D sites (the int8
    activation-chain mode); default calibration must not touch them."""
    model, variables, batch = setup
    base = collect_act_scales(model, variables, [batch])
    chain = collect_act_scales(model, variables, [batch],
                               quantize_depthwise=True)
    dw_keys = set(chain) - set(base)
    assert dw_keys, "no depthwise sites calibrated"
    # every added site is a dw conv (kernel (k,k,1,C)) in the backbone or CAB
    params = variables["params"]
    for key in dw_keys:
        node = params
        for part in key.split("/"):
            node = node[part]
        kshape = node["kernel"].shape
        assert kshape[2] == 1 and kshape[3] >= 16, (key, kshape)
    # the nn.Conv sites are unchanged
    for key in base:
        assert chain[key] == pytest.approx(base[key])


def test_depthwise_quantized_forward_tracks_float(setup):
    model, variables, batch = setup
    scales = collect_act_scales(model, variables, [batch],
                                quantize_depthwise=True)
    report = quantization_report(model, variables, scales, batch, train=False)
    assert report["argmax_agreement"] > 0.95
    ref, _ = model.apply(variables, batch, train=False)
    spread = float(jnp.std(ref.astype(jnp.float32)))
    assert report["mean_abs_logit_delta"] < 0.25 * max(spread, 1e-6)


def test_quantized_dw_matches_float_dw_closely():
    """_quantized_dw against the module's own float lowering on one site."""
    from cabinet_tpu.models.layers import DepthwiseConv2D
    from cabinet_tpu.quant import _quantized_dw

    mod = DepthwiseConv2D(kernel_size=3, stride=2, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x)

    got = None

    def interceptor(next_fn, args, kwargs, context):
        nonlocal got
        if (isinstance(context.module, DepthwiseConv2D)
                and context.method_name == "__call__"):
            got = _quantized_dw(context.module, args[0],
                                float(jnp.max(jnp.abs(x))) / 127.0)
            return got
        return next_fn(*args, **kwargs)

    import flax.linen as nn
    with nn.intercept_methods(interceptor):
        mod.apply(variables, x)
    assert got is not None and got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err < 0.05 * max(scale, 1e-6)


def test_yolosem_quantized_forward_tracks_float():
    """The second model family through the same PTQ machinery (bench.py
    yolo-int8): class heads stay float by name, forward stays close."""
    from cabinet_tpu.models.yolosem import YOLOSem

    model = YOLOSem(n_classes=3, variant="n")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    batch = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 64, 64, 3)).astype(np.float32))
    scales = collect_act_scales(model, variables, [batch])
    assert scales
    assert not any(key.endswith(("classifier", "aux_classifier"))
                   for key in scales)
    report = quantization_report(model, variables, scales, batch, train=False)
    assert report["argmax_agreement"] > 0.95
    ref, _ = model.apply(variables, batch, train=False)
    spread = float(jnp.std(ref.astype(jnp.float32)))
    assert report["mean_abs_logit_delta"] < 0.25 * max(spread, 1e-6)


def test_wide_class_heads_stay_float():
    """A >=16-class model (the Cityscapes regime) must not calibrate its
    class-logit heads — they pass the old cout>=16 width check but are
    excluded by name (ADVICE r2, medium)."""
    model = CABiNet(n_classes=19, mode="small", cfgs=CFGS)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    batch = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(np.float32))
    scales = collect_act_scales(model, variables, [batch])
    assert scales
    assert "conv_out/conv_out" not in scales
    assert not any(key.endswith("b4") for key in scales)
    # the pre-head 3x3 ConvBNReLU still quantizes
    assert any("conv_out/conv" in key for key in scales)
