"""Pallas attention (interpret mode on CPU) + on-device photometric ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cabinet_tpu.ops import photometric as P
from cabinet_tpu.ops.attention import fused_global_attention


def test_fused_attention_matches_einsum_reference():
    # On CPU this exercises the fallback path; the TPU kernel itself is
    # verified in bench/TPU runs (max diff ~4e-5 vs einsum).
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    got = np.asarray(fused_global_attention(q, k, v))
    scale = 32 ** -0.5
    attn = jax.nn.softmax(jnp.einsum("bnk,bmk->bnm", q, k) * scale, -1)
    want = np.asarray(jnp.einsum("bnm,bmv->bnv", attn, v))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hsv_roundtrip():
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    back = P.hsv_to_rgb(P.rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_random_hsv_zero_gains_identity():
    rgb = jnp.asarray(np.random.default_rng(2).random((1, 4, 4, 3)),
                      dtype=jnp.float32)
    out = P.random_hsv(rgb, jax.random.PRNGKey(0), 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


def test_gamma_applied_per_sample():
    imgs = jnp.full((4, 4, 4, 3), 0.5)
    out = P.random_gamma(imgs, jax.random.PRNGKey(1), (2.0, 2.0), p=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)
    out2 = P.random_gamma(imgs, jax.random.PRNGKey(1), (2.0, 2.0), p=0.0)
    np.testing.assert_allclose(np.asarray(out2), 0.5, atol=1e-6)


def test_cutout_zeroes_square_area():
    imgs = jnp.ones((2, 16, 16, 3))
    out = np.asarray(P.random_cutout(imgs, jax.random.PRNGKey(2), size=4,
                                     p=1.0))
    zeros_per_sample = (out == 0).all(-1).reshape(2, -1).sum(1)
    np.testing.assert_array_equal(zeros_per_sample, [16, 16])


def test_mixup_blends_and_takes_dominant_label():
    imgs = jnp.stack([jnp.zeros((4, 4, 3)), jnp.ones((4, 4, 3))])
    lbls = jnp.stack([jnp.zeros((4, 4), jnp.int32),
                      jnp.ones((4, 4), jnp.int32)])
    out_i, out_l = P.mixup(imgs, lbls, jax.random.PRNGKey(3), p=1.0)
    out_i, out_l = np.asarray(out_i), np.asarray(out_l)
    # blended values strictly between the two sources
    assert 0 < out_i[0].mean() < 1
    # labels remain hard (one of the two sources)
    assert set(np.unique(out_l)) <= {0, 1}


def test_mixup_p_zero_identity():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((3, 4, 4, 3)).astype(np.float32))
    lbls = jnp.asarray(rng.integers(0, 5, (3, 4, 4)))
    out_i, out_l = P.mixup(imgs, lbls, jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lbls))


def test_brightness_saturation_grayscale_semantics():
    """Street-recipe ops (reference cityscapes.py:114-136): brightness
    scales toward black, saturation blends with per-pixel luma, grayscale
    replaces with luma at probability p."""
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32))
    # strength 0 => identity for brightness/saturation
    np.testing.assert_allclose(
        np.asarray(P.random_brightness(imgs, jax.random.PRNGKey(0), 0.0)),
        np.asarray(imgs), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(P.random_saturation(imgs, jax.random.PRNGKey(0), 0.0)),
        np.asarray(imgs), atol=1e-6)
    # grayscale p=1: all three channels equal the ITU-R 601 luma
    g = np.asarray(P.random_grayscale(imgs, jax.random.PRNGKey(1), p=1.0))
    luma = (np.asarray(imgs) * [0.299, 0.587, 0.114]).sum(-1)
    for c in range(3):
        np.testing.assert_allclose(g[..., c], luma, atol=1e-6)
    # grayscale p=0: identity
    np.testing.assert_array_equal(
        np.asarray(P.random_grayscale(imgs, jax.random.PRNGKey(1), p=0.0)),
        np.asarray(imgs))
    # a fully-gray image is a saturation fixed point
    gray = jnp.broadcast_to(luma[..., None], imgs.shape).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(P.random_saturation(gray, jax.random.PRNGKey(2), 0.5)),
        np.asarray(gray), atol=1e-6)


def test_street_photometric_pipeline_jits():
    rng = np.random.default_rng(8)
    imgs = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    lbls = jnp.asarray(rng.integers(0, 19, (2, 16, 16)))
    fn = jax.jit(lambda i, l, k: P.street_photometric_pipeline(
        i, l, k, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25)))
    out_i, out_l = fn(imgs, lbls, jax.random.PRNGKey(9))
    assert out_i.shape == imgs.shape
    assert np.isfinite(np.asarray(out_i)).all()
    # labels pass through untouched (no mixup in the street recipe)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lbls))


def test_full_photometric_pipeline_jits():
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    lbls = jnp.asarray(rng.integers(0, 8, (2, 16, 16)))
    fn = jax.jit(lambda i, l, k: P.photometric_pipeline(
        i, l, k, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25)))
    out_i, out_l = fn(imgs, lbls, jax.random.PRNGKey(5))
    assert out_i.shape == imgs.shape and out_l.shape == lbls.shape
    assert np.isfinite(np.asarray(out_i)).all()


class TestResizeBilinear:
    """Separable-matmul resize must sample exactly like the reference's
    torch ``F.interpolate(mode="bilinear", align_corners=False)`` in BOTH
    directions (models/cab.py resize_bilinear) — in particular downscale
    must NOT anti-alias (torch never does; jax.image.resize defaults to
    antialias=True, a silent eval-protocol divergence)."""

    def test_upscale_matches_jax_image(self):
        import jax
        import jax.numpy as jnp

        from cabinet_tpu.models.cab import resize_bilinear

        rng = np.random.default_rng(0)
        for shape, size in [((1, 32, 32, 8), (128, 128)),
                            ((2, 7, 5, 3), (13, 11)),
                            ((1, 16, 16, 4), (16, 16)),
                            ((1, 9, 9, 2), (27, 36)),
                            ((1, 32, 28, 16), (128, 112))]:
            x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            fast = resize_bilinear(x, size)
            ref = jax.image.resize(x, (shape[0], *size, shape[3]),
                                   method="bilinear")
            assert float(jnp.max(jnp.abs(fast - ref))) < 2e-5

    def test_matches_torch_interpolate_both_directions(self):
        import jax.numpy as jnp

        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from cabinet_tpu.models.cab import resize_bilinear

        rng = np.random.default_rng(1)
        # down, up, mixed (H up / W down), and the protocol's exact ratios
        # (scale 0.5 input downscale, scale 1.75 prob-map downscale)
        for shape, size in [((1, 64, 48, 4), (32, 24)),
                            ((2, 9, 7, 3), (17, 13)),
                            ((1, 33, 17, 2), (48, 9)),
                            ((1, 100, 88, 5), (50, 44)),
                            ((1, 112, 154, 6), (64, 88))]:
            x = rng.normal(size=shape).astype(np.float32)
            out = np.asarray(resize_bilinear(jnp.asarray(x), size))
            ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                size, mode="bilinear",
                                align_corners=False
                                ).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(out, ref, atol=2e-6)

    def test_banded_matches_dense(self):
        """At eval-protocol lengths resize_bilinear switches to the banded
        matmul (models/cab.py _resize_axis_banded). The dropped columns are
        exact 0.0 weights, so banded matches the dense interp matmul to
        reduction-order ULPs (the two taps may associate differently in a
        shorter dot) — thin strips keep the check cheap on CPU."""
        import jax.numpy as jnp

        from cabinet_tpu.models.cab import (_BAND_MIN_IN, _interp_matrix,
                                            resize_bilinear)

        rng = np.random.default_rng(3)
        # (n_in, n_out): down 1.75x, up from exactly the banding threshold,
        # and a non-multiple-of-chunk output
        for n_in, n_out in [(2048, 1170), (_BAND_MIN_IN, 1792), (1536, 900)]:
            x = rng.normal(size=(1, n_in, 4, 3)).astype(np.float32)
            out = np.asarray(resize_bilinear(jnp.asarray(x), (n_out, 4)))
            dense = np.einsum("ph,bhwc->bpwc",
                              np.asarray(_interp_matrix(n_in, n_out)), x)
            np.testing.assert_allclose(out, dense, atol=1e-6)
            # W axis via the same sizes transposed
            xt = np.ascontiguousarray(x.transpose(0, 2, 1, 3))
            out_w = np.asarray(resize_bilinear(jnp.asarray(xt), (4, n_out)))
            np.testing.assert_allclose(out_w, dense.transpose(0, 2, 1, 3),
                                       atol=1e-6)

    def test_banded_matches_torch(self):
        """End-to-end: a both-axes-banded resize still matches torch.

        Tolerance note (measured): against the f64 ground truth at this
        size, OUR f32 matmul chain is within 4.3e-7 while torch's own f32
        F.interpolate carries 1.4e-4 of rounding — the 3e-4 budget here is
        torch's noise, not ours."""
        import jax.numpy as jnp

        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from cabinet_tpu.models.cab import resize_bilinear

        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 1512, 1280, 2)).astype(np.float32)
        out = np.asarray(resize_bilinear(jnp.asarray(x), (864, 2240)))
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            (864, 2240), mode="bilinear",
                            align_corners=False).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(out, ref, atol=3e-4)

    def test_no_antialias_on_downscale(self):
        """Guard the divergence itself: the anti-aliased jax.image kernel
        must NOT be what we compute (it differs from torch by ~2.0 on
        unit-normal data at 1.75x downscale)."""
        import jax
        import jax.numpy as jnp

        from cabinet_tpu.models.cab import resize_bilinear

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 56, 56, 4)).astype(np.float32))
        out = np.asarray(resize_bilinear(x, (32, 32)))
        aa = np.asarray(jax.image.resize(x, (1, 32, 32, 4),
                                         method="bilinear"))  # antialias=True
        assert float(np.abs(out - aa).max()) > 0.2


def test_hsv_to_rgb_matches_colorsys():
    """The branchless sector formula (the jnp.choose select was a hidden
    XLA gather, 53.9 ms/img on TPU) must match colorsys ground truth."""
    import colorsys

    import numpy as np

    from cabinet_tpu.ops import photometric as P

    rng = np.random.default_rng(3)
    hsv = rng.random((64, 3)).astype(np.float32)
    got = np.asarray(P.hsv_to_rgb(hsv.reshape(1, 8, 8, 3))).reshape(-1, 3)
    want = np.array([colorsys.hsv_to_rgb(*x) for x in hsv], np.float32)
    np.testing.assert_allclose(got, want, atol=2e-6)
