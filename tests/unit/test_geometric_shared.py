"""Batch-shared-rotation warp semantics (ops/geometric.apply_geometric_shared).

The shared fast path must match the exact per-sample path bit-for-bit on
everything that stays per-sample (flips, integer AND fractional translates,
crops, mixed-resolution masking, label tie rounding) and within documented
tolerances where it diverges (continuous scale ratio instead of PIL's
integer-rounded size; edge-clamp instead of reflect in pad_if_needed).
Comparison methodology: image diffs are gated where BOTH paths agree the
pixel is valid — the black-fill boundary may move <=0.4 px under the
continuous-ratio divergence, which is a full-scale diff on a thin line —
and that boundary-disagreement fraction is gated separately. Exact .5
coordinate ties are float-association coin flips and get their own budget.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cabinet_tpu.ops.geometric import (apply_geometric,
                                       apply_geometric_shared,
                                       geometric_pipeline,
                                       sample_geometric_params)

IGN = 255
B, S, Hc, Wc = 4, 64, 32, 32
_rng = np.random.default_rng(0)


def mkparams(theta=0.0, scale=1.0, dx=0.0, dy=0.0, fh=False, fv=False,
             cu=0.0):
    return {
        "flip_h": jnp.asarray([fh] * B),
        "flip_v": jnp.asarray([fv] * B),
        "dx": jnp.full((B,), dx, jnp.float32),
        "dy": jnp.full((B,), dy, jnp.float32),
        "theta": jnp.full((B,), np.deg2rad(theta), jnp.float32),
        "scale": jnp.full((B,), scale, jnp.float32),
        "crop_u": jnp.full((B, 2), cu, jnp.float32),
    }


def shared_params(p):
    q = dict(p)
    q["theta"] = p["theta"][0]
    q["scale"] = p["scale"][0]
    return q


def canvases(h, w, smooth=False):
    ci = np.zeros((B, S, S, 3), np.uint8)
    cl = np.full((B, S, S), IGN, np.uint8)
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        g = (127 + 60 * np.sin(xx / 7.0) + 50 * np.cos(yy / 9.0)
             ).astype(np.uint8)
        ci[:, :h, :w] = np.stack([g] * 3, -1)[None]
        cl[:, :h, :w] = (xx // 8 + yy // 8).astype(np.uint8) % 8
    else:
        ci[:, :h, :w] = _rng.integers(0, 256, (B, h, w, 3))
        cl[:, :h, :w] = _rng.integers(0, 8, (B, h, w))
    hw = np.tile(np.asarray([[h, w]], np.int32), (B, 1))
    return jnp.asarray(ci), jnp.asarray(cl), jnp.asarray(hw)


def run_both(h, w, smooth=False, interior=False, **kw):
    ci, cl, hw = canvases(h, w, smooth=smooth)
    p = mkparams(**kw)
    oe, le = apply_geometric(ci, cl, hw, p, (Hc, Wc), IGN)
    os_, ls = apply_geometric_shared(ci, cl, hw, shared_params(p),
                                     (Hc, Wc), IGN)
    oe, le, os_, ls = (np.asarray(v) for v in (oe, le, os_, ls))
    if interior:  # skip 2px border (edge-clamp vs reflect divergence)
        oe, le, os_, ls = (v[:, 2:-2, 2:-2] for v in (oe, le, os_, ls))
    return oe, le, os_, ls


def gate(oe, le, os_, ls, img_atol=1e-5, lbl_frac=0.0, bnd_frac=0.0):
    val_e, val_s = le != IGN, ls != IGN
    both = val_e & val_s
    assert (val_e != val_s).mean() <= bnd_frac
    assert (np.abs(oe - os_) * both[..., None]).max() <= img_atol
    assert ((le != ls) & both).mean() <= lbl_frac


def test_per_sample_ops_bit_exact():
    """Flips, integer and fractional translates, mixed-resolution masks:
    identical to the exact path, labels included (half-even ties)."""
    for kw in ({}, {"fh": True}, {"fh": True, "fv": True},
               {"dx": 5, "dy": -3}, {"dx": 2.5, "dy": -1.25}):
        gate(*run_both(40, 48, **kw))
    gate(*run_both(S, S, dx=2.5, dy=-1.25))


def test_scale_integral_ratio_images_exact():
    """w*s integral => the continuous ratio equals the exact path's
    rounded one; images match, label flips confined to exact .5 ties."""
    oe, le, os_, ls = run_both(S, S, scale=0.75)
    gate(oe, le, os_, ls, img_atol=2e-5, lbl_frac=0.35)
    # every label mismatch must sit on a .5 coordinate tie (x or y):
    # positions are (4k+2)/3 - 0.5 grids, ties on every 3rd row/column
    mism = (le != ls) & (le != IGN) & (ls != IGN)
    if mism.any():
        px = (np.arange(Wc) + 0.5) * 4.0 / 3.0 - 0.5
        tie_cols = np.nonzero(np.isclose(px % 1.0, 0.5, atol=1e-4))[0]
        py = (np.arange(Hc) + 0.5) * 4.0 / 3.0 - 0.5
        tie_rows = np.nonzero(np.isclose(py % 1.0, 0.5, atol=1e-4))[0]
        yy, xx = np.nonzero(mism.any(axis=0))
        assert all(y in tie_rows or x in tie_cols for y, x in zip(yy, xx))


def test_rotation_smooth_within_tolerance():
    """<=0.4px coordinate divergence (continuous vs rounded scale ratio)
    on smooth content; the moving black-fill boundary is a thin line."""
    gate(*run_both(S, S, theta=7.0, smooth=True, interior=True),
         img_atol=0.05, lbl_frac=0.08, bnd_frac=0.04)
    gate(*run_both(S, S, theta=-5.0, scale=1.2, cu=0.6, smooth=True,
                   interior=True),
         img_atol=0.05, lbl_frac=0.08, bnd_frac=0.04)


def test_padding_never_leaks_and_classes_real():
    ci, cl, hw = canvases(40, 48)
    ci2 = np.asarray(ci).copy()
    ci2[:, 40:, :] = 199  # poison canvas padding
    ci2[:, :, 48:] = 199
    p = shared_params(mkparams(theta=3.0, scale=0.9, dx=1.5))
    o1, l1 = apply_geometric_shared(ci, cl, hw, p, (Hc, Wc), IGN)
    o2, _ = apply_geometric_shared(jnp.asarray(ci2), cl, hw, p,
                                   (Hc, Wc), IGN)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() < 1e-6
    vals = set(np.unique(np.asarray(l1)).tolist())
    assert vals <= set(range(8)) | {IGN}


def test_rectangular_crop_and_batch1():
    """Non-square crops and B=1 run through BOTH warp paths and keep the
    identity/masking contracts (AeroScapes-style geometry guard)."""
    Hc2, Wc2 = 24, 40
    ci = np.zeros((1, S, S, 3), np.uint8)
    cl = np.full((1, S, S), IGN, np.uint8)
    ci[:, :48, :56] = _rng.integers(0, 256, (1, 48, 56, 3))
    cl[:, :48, :56] = _rng.integers(0, 8, (1, 48, 56))
    hw = np.asarray([[48, 56]], np.int32)
    p = {
        "flip_h": jnp.asarray([False]),
        "flip_v": jnp.asarray([False]),
        "dx": jnp.zeros((1,), jnp.float32),
        "dy": jnp.zeros((1,), jnp.float32),
        "theta": jnp.zeros((1,), jnp.float32),
        "scale": jnp.ones((1,), jnp.float32),
        "crop_u": jnp.zeros((1, 2), jnp.float32),
    }
    oe, le = apply_geometric(jnp.asarray(ci), jnp.asarray(cl),
                             jnp.asarray(hw), p, (Hc2, Wc2), IGN)
    ps = dict(p)
    ps["theta"] = p["theta"][0]
    ps["scale"] = p["scale"][0]
    os_, ls = apply_geometric_shared(jnp.asarray(ci), jnp.asarray(cl),
                                     jnp.asarray(hw), ps, (Hc2, Wc2), IGN)
    assert oe.shape == os_.shape == (1, Hc2, Wc2, 3)
    assert le.shape == ls.shape == (1, Hc2, Wc2)
    np.testing.assert_allclose(np.asarray(oe),
                               np.asarray(ci[:, :Hc2, :Wc2]) / 255.0,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(oe), np.asarray(os_))
    np.testing.assert_array_equal(np.asarray(le), np.asarray(ls))


def test_pipeline_shared_deterministic_and_distribution():
    """geometric_pipeline(shared_linear=True): deterministic per key,
    scalar theta/scale shared across the batch, per-sample crops differ."""
    ci, cl, hw = canvases(S, S)
    aug = {"degrees": 10, "translate": 0.05, "scale": 0.3, "fliplr": 0.5,
           "flipud": 0.2}
    k = jax.random.PRNGKey(3)
    o1, l1 = geometric_pipeline(ci, cl, hw, k, aug, (Hc, Wc),
                                shared_linear=True)
    o2, l2 = geometric_pipeline(ci, cl, hw, k, aug, (Hc, Wc),
                                shared_linear=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    o3, _ = geometric_pipeline(ci, cl, hw, jax.random.PRNGKey(4), aug,
                               (Hc, Wc), shared_linear=True)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))
    p = sample_geometric_params(k, B, aug, hw, shared_linear=True)
    assert p["theta"].shape == () and p["scale"].shape == ()
    assert p["crop_u"].shape == (B, 2)
    # marginal distribution sanity: shared draws across many keys span the
    # same U(-deg, deg) range as per-sample draws
    ths = np.asarray([sample_geometric_params(
        jax.random.PRNGKey(i), B, aug, hw, shared_linear=True)["theta"]
        for i in range(200)])
    assert abs(np.mean(ths)) < np.deg2rad(2.0)
    assert np.deg2rad(5.0) < np.std(ths) < np.deg2rad(7.0)


def test_shared_distribution_tracks_exact_path():
    """End-to-end distribution parity of the shared warp vs the exact
    per-sample warp: over many BATCH draws (theta/scale shared within a
    batch but fresh per key) the ignore-fraction and brightness statistics
    must match the exact path's — the marginal augmentation distribution
    is unchanged, only within-batch correlation differs."""
    ci, cl, hw = canvases(48, 56)
    aug = {"degrees": 10, "translate": 0.05, "scale": 0.3, "fliplr": 0.5,
           "flipud": 0.2}
    n_keys = 40
    stats = {}
    for shared in (False, True):
        ign, mean = [], []
        for k in range(n_keys):
            oi, ol = geometric_pipeline(ci, cl, hw, jax.random.PRNGKey(k),
                                        aug, (32, 32), shared_linear=shared)
            ign.append((np.asarray(ol) == IGN).mean())
            mean.append(np.asarray(oi).mean())
        stats[shared] = (np.mean(ign), np.mean(mean))
    assert abs(stats[True][0] - stats[False][0]) < 0.05, stats
    assert abs(stats[True][1] - stats[False][1]) < 0.04, stats
