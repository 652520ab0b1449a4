"""On-device geometric augmentation semantics (ops/geometric.py).

Contracts: identity exactness, PIL-matching flip/rotate/translate/scale
conventions, nearest-label / ignore-fill / reflect-crop semantics, no
leakage from canvas padding in mixed-resolution batches, determinism, and
distribution sanity against the host PIL pipeline it replaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from cabinet_tpu.ops.geometric import apply_geometric, geometric_pipeline

IGNORE = 255


def identity_params(B):
    return {
        "flip_h": jnp.zeros((B,), bool),
        "flip_v": jnp.zeros((B,), bool),
        "dx": jnp.zeros((B,)),
        "dy": jnp.zeros((B,)),
        "theta": jnp.zeros((B,)),
        "scale": jnp.ones((B,)),
        "crop_u": jnp.zeros((B, 2)),
    }


def make_canvas(img_hw3_u8, lbl_hw_u8, canvas):
    h, w = img_hw3_u8.shape[:2]
    ci = np.zeros((canvas, canvas, 3), np.uint8)
    cl = np.full((canvas, canvas), IGNORE, np.uint8)
    ci[:h, :w] = img_hw3_u8
    cl[:h, :w] = lbl_hw_u8
    return ci[None], cl[None], np.array([[h, w]], np.int32)


def rand_img(h, w, seed=0):
    r = np.random.default_rng(seed)
    return (r.integers(0, 256, (h, w, 3)).astype(np.uint8),
            r.integers(0, 8, (h, w)).astype(np.uint8))


def test_identity_exact():
    img, lbl = rand_img(16, 16)
    ci, cl, hw = make_canvas(img, lbl, 16)
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), identity_params(1), (16, 16))
    np.testing.assert_allclose(np.asarray(out[0]), img / 255.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(lout[0]), lbl)


def test_hflip_vflip():
    img, lbl = rand_img(12, 16, seed=1)
    ci, cl, hw = make_canvas(img, lbl, 16)
    p = identity_params(1)
    p["flip_h"] = jnp.ones((1,), bool)
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), p, (12, 16))
    np.testing.assert_allclose(np.asarray(out[0]), img[:, ::-1] / 255.0,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lout[0]), lbl[:, ::-1])
    p = identity_params(1)
    p["flip_v"] = jnp.ones((1,), bool)
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), p, (12, 16))
    np.testing.assert_allclose(np.asarray(out[0]), img[::-1] / 255.0,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lout[0]), lbl[::-1])


def test_translate_integer_shift_and_ignore_fill():
    """PIL AFFINE (1,0,dx,0,1,dy) maps output->input: out[y,x] = in[y,x+dx];
    exposed pixels are black in the image, ignore in the label
    (transform.py:134-157)."""
    img, lbl = rand_img(16, 16, seed=2)
    ci, cl, hw = make_canvas(img, lbl, 16)
    p = identity_params(1)
    p["dx"] = jnp.asarray([3.0])
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), p, (16, 16))
    out, lout = np.asarray(out[0]), np.asarray(lout[0])
    np.testing.assert_allclose(out[:, :13], img[:, 3:] / 255.0, atol=1e-5)
    np.testing.assert_array_equal(lout[:, :13], lbl[:, 3:])
    assert (out[:, 13:] == 0).all()
    assert (lout[:, 13:] == IGNORE).all()


def test_rotate_90_matches_pil():
    img, lbl = rand_img(16, 16, seed=3)
    ci, cl, hw = make_canvas(img, lbl, 16)
    p = identity_params(1)
    p["theta"] = jnp.asarray([np.pi / 2])
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), p, (16, 16))
    ref = np.asarray(Image.fromarray(img).rotate(90, resample=Image.BILINEAR,
                                                 expand=True))
    np.testing.assert_allclose(np.asarray(out[0]), ref / 255.0, atol=1e-4)
    ref_l = np.asarray(Image.fromarray(lbl).rotate(
        90, resample=Image.NEAREST, expand=True, fillcolor=IGNORE))
    np.testing.assert_array_equal(np.asarray(lout[0]), ref_l)


def test_scale_matches_pil_resize():
    img, lbl = rand_img(16, 16, seed=4)
    ci, cl, hw = make_canvas(img, lbl, 16)
    p = identity_params(1)
    p["scale"] = jnp.asarray([2.0])
    out, _ = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                             jnp.asarray(hw), p, (32, 32))
    ref = np.asarray(Image.fromarray(img).resize((32, 32), Image.BILINEAR))
    np.testing.assert_allclose(np.asarray(out[0]), ref / 255.0, atol=2e-2)


def test_canvas_padding_never_leaks():
    """Mixed-resolution batches: pixels outside a sample's valid (h, w)
    region (the canvas padding) must never reach the output."""
    img, lbl = rand_img(8, 10, seed=5)
    ci, cl, hw = make_canvas(img, lbl, 16)
    ci = ci.copy()
    ci[0, 8:, :, :] = 255  # sentinel in padding rows
    ci[0, :, 10:, :] = 255
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), identity_params(1), (12, 12))
    out, lout = np.asarray(out[0]), np.asarray(lout[0])
    np.testing.assert_allclose(out[:8, :10], img / 255.0, atol=1e-5)
    # beyond the scaled extent: reflect for the image, ignore for the label
    assert (lout[8:, :] == IGNORE).all() and (lout[:, 10:] == IGNORE).all()
    np.testing.assert_allclose(out[8:12, :10], img[6:2:-1] / 255.0, atol=1e-5)


def test_crop_reflect_pad_semantics():
    """Crop beyond the scaled image = the host RandomCrop pad_if_needed
    branch (transform.py:161-210): image reflect-pads, label ignore-pads."""
    img, lbl = rand_img(8, 8, seed=6)
    ci, cl, hw = make_canvas(img, lbl, 16)
    out, lout = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), identity_params(1), (16, 16))
    out, lout = np.asarray(out[0]), np.asarray(lout[0])
    ref = np.pad(img, ((0, 8), (0, 8), (0, 0)), mode="reflect")
    np.testing.assert_allclose(out[:14, :14], ref[:14, :14] / 255.0,
                               atol=1e-5)
    assert (lout[8:, :] == IGNORE).all() and (lout[:, 8:] == IGNORE).all()


def test_random_crop_offsets_cover_window():
    """crop_u spans the full valid offset range [0, ws - Wc]."""
    img, lbl = rand_img(16, 16, seed=7)
    ci, cl, hw = make_canvas(img, lbl, 16)
    for u, lo in ((0.0, 0), (0.999, 8)):
        p = identity_params(1)
        p["crop_u"] = jnp.full((1, 2), u)
        out, _ = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                                 jnp.asarray(hw), p, (8, 8))
        np.testing.assert_allclose(np.asarray(out[0]),
                                   img[lo:lo + 8, lo:lo + 8] / 255.0,
                                   atol=1e-5)


def test_labels_never_invent_classes():
    img, lbl = rand_img(24, 24, seed=8)
    ci, cl, hw = make_canvas(img, lbl, 32)
    aug = {"degrees": 30, "translate": 0.2, "scale": 0.5, "fliplr": 0.5,
           "flipud": 0.5}
    for s in range(5):
        _, lout = geometric_pipeline(jnp.asarray(ci), jnp.asarray(cl),
                                     jnp.asarray(hw), jax.random.PRNGKey(s),
                                     aug, (16, 16))
        vals = set(np.unique(np.asarray(lout)).tolist())
        assert vals <= (set(np.unique(lbl).tolist()) | {IGNORE})


def test_pipeline_deterministic_and_batched():
    r = np.random.default_rng(9)
    B, S = 4, 32
    ci = r.integers(0, 256, (B, S, S, 3)).astype(np.uint8)
    cl = r.integers(0, 8, (B, S, S)).astype(np.uint8)
    hw = np.tile(np.array([[S, S]], np.int32), (B, 1))
    aug = {"degrees": 10, "translate": 0.05, "scale": 0.3, "fliplr": 0.5,
           "flipud": 0.2}
    key = jax.random.PRNGKey(0)
    o1, l1 = geometric_pipeline(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), key, aug, (16, 16))
    o2, l2 = geometric_pipeline(jnp.asarray(ci), jnp.asarray(cl),
                                jnp.asarray(hw), key, aug, (16, 16))
    assert o1.shape == (B, 16, 16, 3) and l1.shape == (B, 16, 16)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # different keys give different crops
    o3, _ = geometric_pipeline(jnp.asarray(ci), jnp.asarray(cl),
                               jnp.asarray(hw), jax.random.PRNGKey(1),
                               aug, (16, 16))
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))


@pytest.mark.slow
def test_distribution_sanity_vs_host_pipeline():
    """Same aug config, same source image: the device path's ignore-pixel
    fraction and mean-brightness distribution must track the host PIL
    pipeline (distribution parity, not bit parity)."""
    from cabinet_tpu.data import transforms as T

    img, lbl = rand_img(48, 48, seed=10)
    aug = {"degrees": 10, "translate": 0.05, "scale": 0.3, "fliplr": 0.5,
           "flipud": 0.2}
    crop = 32
    host = T.Compose([
        T.RandomHorizontalFlip(p=aug["fliplr"]),
        T.RandomVerticalFlip(p=aug["flipud"]),
        T.RandomTranslate(translate=aug["translate"], ignore_label=IGNORE),
        T.RandomRotate(degrees=(-aug["degrees"], aug["degrees"]),
                       ignore_label=IGNORE),
        T.RandomScale((1 - aug["scale"], 1 + aug["scale"]), continuous=True),
        T.RandomCrop(size=(crop, crop), pad_if_needed=True,
                     ignore_label=IGNORE),
    ])
    n = 300
    h_ign, h_mean = [], []
    for s in range(n):
        out = host({"image": Image.fromarray(img),
                    "label": Image.fromarray(lbl)},
                   np.random.default_rng(s))
        la = np.asarray(out["label"])
        h_ign.append((la == IGNORE).mean())
        h_mean.append(np.asarray(out["image"]).mean() / 255.0)

    ci, cl, hw = make_canvas(img, lbl, 48)
    ci_b = jnp.asarray(np.repeat(ci, n, 0))
    cl_b = jnp.asarray(np.repeat(cl, n, 0))
    hw_b = jnp.asarray(np.repeat(hw, n, 0))
    oi, ol = geometric_pipeline(ci_b, cl_b, hw_b, jax.random.PRNGKey(0),
                                aug, (crop, crop))
    d_ign = (np.asarray(ol) == IGNORE).mean(axis=(1, 2))
    # device images are black where geometry exposed pixels; mask those out
    # of the brightness statistic the same way PIL's black fill enters the
    # host statistic (both included) for a like-for-like comparison
    d_mean = np.asarray(oi).mean(axis=(1, 2, 3))
    assert abs(np.mean(h_ign) - np.mean(d_ign)) < 0.05, \
        (np.mean(h_ign), np.mean(d_ign))
    assert abs(np.mean(h_mean) - np.mean(d_mean)) < 0.04, \
        (np.mean(h_mean), np.mean(d_mean))


def test_street_distribution_sanity_vs_host_pipeline():
    """Cityscapes street recipe (hflip + DISCRETE RandomScale + crop): the
    device warp with `scale_choices` must track the host PIL pipeline's
    ignore-fraction and brightness distributions (the full device chain for
    the no-rotate/no-translate street geometry)."""
    from cabinet_tpu.data import transforms as T

    img, lbl = rand_img(48, 48, seed=11)
    choices = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)
    aug = {"fliplr": 0.5, "flipud": 0.0, "degrees": 0.0, "translate": 0.0,
           "scale_choices": choices}
    crop = 32
    host = T.Compose([
        T.RandomHorizontalFlip(p=0.5),
        T.RandomScale(choices),
        T.RandomCrop(size=(crop, crop), pad_if_needed=True,
                     ignore_label=IGNORE),
    ])
    n = 300
    h_ign, h_mean = [], []
    for s in range(n):
        out = host({"image": Image.fromarray(img),
                    "label": Image.fromarray(lbl)},
                   np.random.default_rng(s))
        h_ign.append((np.asarray(out["label"]) == IGNORE).mean())
        h_mean.append(np.asarray(out["image"]).mean() / 255.0)

    ci, cl, hw = make_canvas(img, lbl, 48)
    ci_b = jnp.asarray(np.repeat(ci, n, 0))
    cl_b = jnp.asarray(np.repeat(cl, n, 0))
    hw_b = jnp.asarray(np.repeat(hw, n, 0))
    oi, ol = geometric_pipeline(ci_b, cl_b, hw_b, jax.random.PRNGKey(1),
                                aug, (crop, crop))
    d_ign = (np.asarray(ol) == IGNORE).mean(axis=(1, 2))
    d_mean = np.asarray(oi).mean(axis=(1, 2, 3))
    assert abs(np.mean(h_ign) - np.mean(d_ign)) < 0.05, \
        (np.mean(h_ign), np.mean(d_ign))
    assert abs(np.mean(h_mean) - np.mean(d_mean)) < 0.04, \
        (np.mean(h_mean), np.mean(d_mean))
