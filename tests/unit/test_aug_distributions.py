"""Per-parameter distribution parity: device aug samplers vs the host sampler.

VERDICT r4 weak #4: the old guards compared two AGGREGATE statistics at
n=300 with 0.04-0.05 mean tolerance — a marginal-distribution bug smaller
than that (e.g. a halved rotation range) would pass and silently change
training. These tests draw n >= 2000 PARAMETER samples from both samplers
(params are cheap — only the ignore-fraction statistic needs the warp) and
run per-parameter two-sample Kolmogorov-Smirnov tests:

  host side   — the REAL transform chain (data/transforms.py, the exact
                objects datasets._build_train_transforms composes) run under
                a recording RNG proxy, so the draws are the ones training
                actually consumes (order, ranges, integer-size arithmetic);
  device side — sample_geometric_params (ops/geometric.py:39-82), exact AND
                shared_linear paths, plus the crop-offset resolution mirrored
                from apply_geometric (ops/geometric.py:129-133).

Each KS assertion carries an in-test NEGATIVE CONTROL: the same statistic
recomputed from a deliberately range-halved draw must FAIL the bound, so the
test demonstrably detects the bug class it guards against.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cabinet_tpu.data import transforms as T
from cabinet_tpu.ops.geometric import geometric_pipeline, sample_geometric_params

IGNORE = 255
AUG = {"degrees": 10.0, "translate": 0.05, "scale": 0.3,
       "fliplr": 0.5, "flipud": 0.2}
SRC = 48          # source image is SRC x SRC (canvas == image, hw = (48, 48))
CROP = 32         # min scaled size round(48 * 0.7) = 34 > 32, so the host
                  # crop ALWAYS draws both offsets (fixed call count = 8)
N_HOST = 2000
N_DEV = 4096


def ks2(a, b) -> float:
    """Two-sample KS distance (sup |F_a - F_b|)."""
    a = np.sort(np.asarray(a, np.float64))
    b = np.sort(np.asarray(b, np.float64))
    both = np.concatenate([a, b])
    return float(np.max(np.abs(
        np.searchsorted(a, both, side="right") / len(a)
        - np.searchsorted(b, both, side="right") / len(b))))


def ks_crit(n: int, m: int, alpha: float = 1e-6) -> float:
    """Two-sample KS critical distance at significance alpha."""
    return float(np.sqrt(-0.5 * np.log(alpha / 2.0))
                 * np.sqrt((n + m) / (n * m)))


def rate_bound(p: float, n: int, m: int, sigmas: float = 5.0) -> float:
    """Two-proportion bound for Bernoulli(p) rates at n/m draws."""
    return sigmas * float(np.sqrt(p * (1 - p) * (1.0 / n + 1.0 / m)))


class RecordingRNG:
    """np.random.Generator proxy that logs every draw the transforms make."""

    def __init__(self, rng: np.random.Generator):
        self._rng = rng
        self.calls = []

    def _wrap(self, name, *args, **kwargs):
        v = getattr(self._rng, name)(*args, **kwargs)
        self.calls.append((name, args, v))
        return v

    def random(self, *a, **k):
        return self._wrap("random", *a, **k)

    def uniform(self, *a, **k):
        return self._wrap("uniform", *a, **k)

    def integers(self, *a, **k):
        return self._wrap("integers", *a, **k)

    def __getattr__(self, name):
        return getattr(self._rng, name)


@pytest.fixture(scope="module")
def host_draws():
    """Run the REAL host geometric chain N_HOST times under the recorder.

    Call sequence per sample (datasets._build_train_transforms order):
      random(hflip), random(vflip), uniform(dx), uniform(dy),
      uniform(angle), uniform(scale), integers(crop x), integers(crop y).
    Also collects the warped label's ignore fraction (free by-product).
    """
    r = np.random.default_rng(20)
    img = r.integers(0, 256, (SRC, SRC, 3), dtype=np.uint8)
    lbl = r.integers(0, 8, (SRC, SRC), dtype=np.uint8)
    chain = T.Compose([
        T.RandomHorizontalFlip(p=AUG["fliplr"]),
        T.RandomVerticalFlip(p=AUG["flipud"]),
        T.RandomTranslate(translate=AUG["translate"], ignore_label=IGNORE),
        T.RandomRotate(degrees=(-AUG["degrees"], AUG["degrees"]),
                       ignore_label=IGNORE),
        T.RandomScale((1 - AUG["scale"], 1 + AUG["scale"]), continuous=True),
        T.RandomCrop(size=(CROP, CROP), pad_if_needed=True,
                     ignore_label=IGNORE),
    ])
    out = {k: [] for k in ("flip_h", "flip_v", "dx", "dy", "theta_deg",
                           "scale", "cov_x", "cov_y", "ign")}
    for s in range(N_HOST):
        rec = RecordingRNG(np.random.default_rng([21, s]))
        res = chain({"image": Image.fromarray(img),
                     "label": Image.fromarray(lbl)}, rec)
        names = [c[0] for c in rec.calls]
        assert names == ["random", "random", "uniform", "uniform",
                         "uniform", "uniform", "integers", "integers"], names
        c = rec.calls
        out["flip_h"].append(c[0][2] < AUG["fliplr"])
        out["flip_v"].append(c[1][2] < AUG["flipud"])
        out["dx"].append(c[2][2] * SRC)      # RandomTranslate multiplies by w
        out["dy"].append(c[3][2] * SRC)
        out["theta_deg"].append(c[4][2])
        out["scale"].append(c[5][2])
        # integers(0, w' - tw + 1): args carry the scaled size -> normalized
        # crop coverage in [0, 1] (comparable across integer-size rounding)
        out["cov_x"].append(c[6][2] / max(c[6][1][1] - 1, 1))
        out["cov_y"].append(c[7][2] / max(c[7][1][1] - 1, 1))
        out["ign"].append(
            (np.asarray(res["label"]) == IGNORE).mean())
    return {k: np.asarray(v, np.float64) for k, v in out.items()}


@pytest.fixture(scope="module")
def device_draws():
    """One sample_geometric_params call at N_DEV (the exact path) + the
    crop-offset resolution mirrored from apply_geometric."""
    hw = jnp.tile(jnp.array([[SRC, SRC]], jnp.int32), (N_DEV, 1))
    p = jax.jit(lambda k: sample_geometric_params(k, N_DEV, AUG, hw)
                )(jax.random.PRNGKey(3))
    p = {k: np.asarray(v, np.float64) for k, v in p.items()}
    return p | _resolve_crop(p["theta"], p["scale"], p["crop_u"])


def _resolve_crop(theta, scale, crop_u):
    """Mirror of apply_geometric's crop-offset math (ops/geometric.py:122-133)
    so coverage is testable without running the warp."""
    wr = SRC * np.abs(np.cos(theta)) + SRC * np.abs(np.sin(theta))
    hr = SRC * np.abs(np.sin(theta)) + SRC * np.abs(np.cos(theta))
    ws = np.round(wr * scale)
    hs = np.round(hr * scale)
    cx = np.floor(crop_u[..., 0] * (np.maximum(ws - CROP, 0) + 1 - 1e-6))
    cy = np.floor(crop_u[..., 1] * (np.maximum(hs - CROP, 0) + 1 - 1e-6))
    return {"cov_x": cx / np.maximum(ws - CROP, 1),
            "cov_y": cy / np.maximum(hs - CROP, 1)}


@pytest.fixture(scope="module")
def shared_draws():
    """shared_linear=True draws over 1024 independent keys: (theta, scale)
    are one scalar per KEY (the batch-shared draw whose marginal must still
    match the host), per-sample params come from the same keys."""
    K, B = 1024, 2
    hw = jnp.tile(jnp.array([[SRC, SRC]], jnp.int32), (B, 1))

    @jax.jit
    def draw(keys):
        return jax.vmap(lambda k: sample_geometric_params(
            k, B, AUG, hw, shared_linear=True))(keys)

    p = draw(jax.random.split(jax.random.PRNGKey(4), K))
    flat = {k: np.asarray(v, np.float64).reshape(-1)
            for k, v in p.items() if k not in ("theta", "scale", "crop_u")}
    flat["theta"] = np.asarray(p["theta"], np.float64)    # (K,) scalar draws
    flat["scale"] = np.asarray(p["scale"], np.float64)
    # crop resolution broadcasts the shared (theta, scale) over the batch
    cu = np.asarray(p["crop_u"], np.float64).reshape(K * B, 2)
    th = np.repeat(flat["theta"], B)
    sc = np.repeat(flat["scale"], B)
    return flat | _resolve_crop(th, sc, cu)


# ---------------------------------------------------------------------------
# exact path
# ---------------------------------------------------------------------------

def test_ks_theta_scale_translate_exact(host_draws, device_draws):
    h, d = host_draws, device_draws
    crit = ks_crit(N_HOST, N_DEV)
    theta_dev = np.rad2deg(d["theta"])
    assert ks2(h["theta_deg"], theta_dev) < crit
    assert ks2(h["scale"], d["scale"]) < crit
    assert ks2(h["dx"], d["dx"]) < crit
    assert ks2(h["dy"], d["dy"]) < crit
    # negative control: a halved-range bug MUST fail the same bound
    assert ks2(h["theta_deg"], theta_dev / 2.0) > crit
    assert ks2(h["scale"], 1.0 + (d["scale"] - 1.0) / 2.0) > crit
    assert ks2(h["dx"], d["dx"] / 2.0) > crit


def test_ks_crop_coverage_exact(host_draws, device_draws):
    # normalized coverage strips the <=1 px integer-size differences between
    # PIL's rotate-expand/resize sizes and the device's continuous wr
    crit = ks_crit(N_HOST, N_DEV)
    assert ks2(host_draws["cov_x"], device_draws["cov_x"]) < crit
    assert ks2(host_draws["cov_y"], device_draws["cov_y"]) < crit
    assert ks2(host_draws["cov_x"], device_draws["cov_x"] / 2.0) > crit


def test_flip_rates_exact(host_draws, device_draws):
    for k, p in (("flip_h", AUG["fliplr"]), ("flip_v", AUG["flipud"])):
        rh = host_draws[k].mean()
        rd = device_draws[k].mean()
        bound = rate_bound(p, N_HOST, N_DEV)
        assert abs(rh - rd) < bound, (k, rh, rd)
        # halved rate fails
        assert abs(rh - rd / 2.0) > bound, (k, rh, rd)


# ---------------------------------------------------------------------------
# shared-linear path (batch-shared theta/scale — VERDICT r4 weak #4's target)
# ---------------------------------------------------------------------------

def test_ks_shared_marginals(host_draws, shared_draws):
    h, s = host_draws, shared_draws
    n_scalar = len(s["theta"])
    crit_s = ks_crit(N_HOST, n_scalar)
    theta_dev = np.rad2deg(s["theta"])
    assert ks2(h["theta_deg"], theta_dev) < crit_s
    assert ks2(h["scale"], s["scale"]) < crit_s
    assert ks2(h["theta_deg"], theta_dev / 2.0) > crit_s

    n_ps = len(s["dx"])
    crit_p = ks_crit(N_HOST, n_ps)
    assert ks2(h["dx"], s["dx"]) < crit_p
    assert ks2(h["dy"], s["dy"]) < crit_p
    assert ks2(h["cov_x"], s["cov_x"]) < crit_p
    assert ks2(h["cov_y"], s["cov_y"]) < crit_p
    for k, p in (("flip_h", AUG["fliplr"]), ("flip_v", AUG["flipud"])):
        assert abs(h[k].mean() - s[k].mean()) < rate_bound(p, N_HOST, n_ps)


# ---------------------------------------------------------------------------
# warp statistic: per-sample ignore fraction (needs the gather — smaller n)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_ks_ignore_fraction_vs_host(host_draws):
    """Distribution (not just mean) of the warped label's ignore fraction.
    Looser bound than the param KS tests: the fill REGIONS legitimately
    differ at the sub-pixel level (reflect vs clamp at crop pad), but a
    halved rotation/translate range shifts the whole distribution."""
    r = np.random.default_rng(20)          # same source as host_draws
    img = r.integers(0, 256, (SRC, SRC, 3), dtype=np.uint8)
    lbl = r.integers(0, 8, (SRC, SRC), dtype=np.uint8)
    n = 1024
    ci = jnp.asarray(np.broadcast_to(img, (n, SRC, SRC, 3)))
    cl = jnp.asarray(np.broadcast_to(lbl, (n, SRC, SRC)))
    hw = jnp.tile(jnp.array([[SRC, SRC]], jnp.int32), (n, 1))
    fracs = {}
    _, lo = geometric_pipeline(ci, cl, hw, jax.random.PRNGKey(6), AUG,
                               (CROP, CROP), ignore_label=IGNORE)
    fracs["exact"] = (np.asarray(lo) == IGNORE).mean(axis=(1, 2))
    # shared mode draws ONE (theta, scale) per CALL: sampling its marginal
    # needs many independent keys, not one big batch (a single batch-1024
    # call has one rotation for all samples and D jumps to ~0.38)
    K, B = n // 2, 2
    ci2, cl2, hw2 = ci[:B], cl[:B], hw[:B]
    lo = jax.jit(jax.vmap(lambda k: geometric_pipeline(
        ci2, cl2, hw2, k, AUG, (CROP, CROP), ignore_label=IGNORE,
        shared_linear=True)[1]))(jax.random.split(jax.random.PRNGKey(6), K))
    fracs["shared"] = (np.asarray(lo) == IGNORE).mean(axis=(2, 3)).reshape(-1)
    bound = 2.0 * ks_crit(N_HOST, n)
    for mode, f in fracs.items():
        d = ks2(host_draws["ign"], f)
        assert d < bound, (mode, d, bound)
    # sensitivity: halving rotation+translate measurably shrinks ignore area
    weak = dict(AUG, degrees=AUG["degrees"] / 2, translate=AUG["translate"] / 2)
    _, lo = geometric_pipeline(ci, cl, hw, jax.random.PRNGKey(6), weak,
                               (CROP, CROP), ignore_label=IGNORE)
    f_weak = (np.asarray(lo) == IGNORE).mean(axis=(1, 2))
    assert ks2(host_draws["ign"], f_weak) > bound


# ---------------------------------------------------------------------------
# mixup (device ops/photometric.mixup vs host datasets.__getitem__ draw)
# ---------------------------------------------------------------------------

def test_mixup_rate_and_ratio_distribution():
    """Functional draw-through: feed alternating 0/1 images so the applied
    Beta(32,32) ratio is recoverable from the output, then KS it against the
    host's rng.beta(32, 32) draw (datasets.py:255-259) and bound the apply
    and label-switch rates."""
    from cabinet_tpu.ops.photometric import mixup

    B, p = 4096, 0.5
    x = jnp.asarray((np.arange(B) % 2).astype(np.float32)
                    ).reshape(B, 1, 1, 1) * jnp.ones((B, 2, 2, 3))
    lbl = jnp.asarray((np.arange(B) % 2).astype(np.int32)
                      ).reshape(B, 1, 1) * jnp.ones((B, 2, 2), jnp.int32)
    out, out_lbl = mixup(x, lbl, jax.random.PRNGKey(7), p=p)
    out = np.asarray(out)[:, 0, 0, 0]
    x_np = np.asarray(x)[:, 0, 0, 0]
    partner = np.roll(x_np, 1)
    applied = ~np.isclose(out, x_np)           # blended => value moved
    # recovered ratio r: out = x*r + partner*(1-r), |x - partner| == 1
    r_rec = np.abs((out - partner))[applied]
    host = np.random.default_rng(8).beta(32.0, 32.0, size=4096)
    # Beta(32,32) mass below ~0.35 is 1e-4: "value moved" misses only
    # r ~= 1 draws, which Beta(32,32) never produces at these n
    assert ks2(r_rec, host) < ks_crit(len(r_rec), len(host))
    assert abs(applied.mean() - p) < rate_bound(p, B, 10**9)
    switch = (np.asarray(out_lbl)[:, 0, 0] != np.asarray(lbl)[:, 0, 0]).mean()
    assert abs(switch - p / 2) < rate_bound(p / 2, B, 10**9)


# ---------------------------------------------------------------------------
# street recipe: discrete RandomScale choices
# ---------------------------------------------------------------------------

def test_street_scale_choice_frequencies():
    """jax.random.choice over scale_choices must be uniform like the host's
    rng.integers(len(choices)) (transforms.py:85); each frequency within 5
    sigma of 1/6 — a dropped or doubled choice fails."""
    choices = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)
    n = 6000
    hw = jnp.tile(jnp.array([[SRC, SRC]], jnp.int32), (n, 1))
    p = sample_geometric_params(jax.random.PRNGKey(9), n,
                                {"scale_choices": choices}, hw)
    sc = np.asarray(p["scale"])
    q = 1.0 / len(choices)
    sig = np.sqrt(q * (1 - q) / n)
    for c in choices:
        f = (sc == c).mean()
        assert abs(f - q) < 5 * sig, (c, f)
