"""On-device batched geometric augmentation (jit/XLA-fused).

The host pipeline (data/transforms.py) runs the reference's geometric recipe
(reference src/datasets/transform.py:19-210, recipe uavid.py:192-229) through
PIL — measured at 1-3.5 img/s/core on aerial crops, which makes the HOST the
end-to-end training wall (NOTES r3 "Input-pipeline throughput"). Training
augmentation does not need bit-parity with PIL; it needs the same parameter
DISTRIBUTION and the same fill semantics (bilinear image / nearest label /
ignore-fill where geometry exposes new pixels). This module provides exactly
that as ONE composed inverse-affine warp per sample, fused under jit:

    flipH -> flipV -> translate -> rotate(expand) -> scale -> crop

collapses to a single bilinear (image) / nearest (label) gather from the raw
decoded frame, so the host keeps only decode + ResizeIfLarger + a memcpy into
a fixed canvas. Per-step fill semantics are preserved:

  - translate / rotate expose pixels: image black (PIL default fill), label
    ignore (transform.py:148-157, :283-299);
  - crop beyond the scaled extent (the pad_if_needed branch,
    transform.py:161-210): image REFLECT, label ignore;
  - the canvas padding outside each sample's valid (h, w) region is never
    sampled (gather indices are clamped per-sample), so batching mixed
    resolutions is exact.

Every op consumes explicit PRNG keys; coordinate conventions (pixel-center
sampling, PIL resize half-pixel offsets, PIL rotate's output->input matrix)
match PIL so a 90-degree rotation or an axis flip is bit-comparable.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def sample_geometric_params(key: jax.Array, batch: int, aug: Dict,
                            src_hw: jnp.ndarray,
                            shared_linear: bool = False
                            ) -> Dict[str, jnp.ndarray]:
    """Draw per-sample augmentation parameters.

    Matches the host recipe's distributions (data/datasets.py
    _build_train_transforms): flips ~ Bernoulli(fliplr/flipud), translate
    ~ U(-t, t) * (w, h) pixels, angle ~ U(-degrees, degrees), scale
    ~ U(1-s, 1+s) continuous, crop offset uniform over the valid window.

    src_hw: (B, 2) int32 valid (h, w) per sample within the canvas.
    Returns a dict of (B,)-shaped arrays (crop offsets are resolved inside
    apply_geometric because they depend on the traced scaled size).

    shared_linear=True draws ONE (theta, scale) for the whole batch
    (scalar-shaped) — the apply_geometric_shared fast path; marginal
    distributions are unchanged, only the within-batch correlation of the
    rotation/scale draws differs.
    """
    kf, kg, kt, ku, kr, ks, kc = jax.random.split(key, 7)
    h = src_hw[:, 0].astype(jnp.float32)
    w = src_hw[:, 1].astype(jnp.float32)
    t = float(aug.get("translate", 0.0))
    deg = float(aug.get("degrees", 0.0))
    s = float(aug.get("scale", 0.0))
    lin = () if shared_linear else (batch,)
    # discrete RandomScale (the street recipe, reference cityscapes.py:119)
    choices = aug.get("scale_choices")
    if choices is not None:
        scale = jax.random.choice(ks, jnp.asarray(choices, jnp.float32),
                                  shape=lin)
    else:
        scale = jax.random.uniform(ks, lin, minval=1.0 - s, maxval=1.0 + s)
    return {
        "flip_h": jax.random.uniform(kf, (batch,)) < float(aug.get("fliplr", 0.0)),
        "flip_v": jax.random.uniform(kg, (batch,)) < float(aug.get("flipud", 0.0)),
        "dx": jax.random.uniform(kt, (batch,), minval=-t, maxval=t) * w,
        "dy": jax.random.uniform(ku, (batch,), minval=-t, maxval=t) * h,
        "theta": jnp.deg2rad(
            jax.random.uniform(kr, lin, minval=-deg, maxval=deg)),
        "scale": scale,
        "crop_u": jax.random.uniform(kc, (batch, 2)),
    }


def _reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect coordinate x into [0, n-1] (np.pad mode='reflect' semantics,
    no repeated edge). n is a traced per-sample float; safe for n == 1."""
    period = 2.0 * jnp.maximum(n - 1.0, 1.0)
    xm = jnp.mod(jnp.abs(x), period)
    refl = jnp.minimum(xm, period - xm)
    return jnp.where(n > 1.0, refl, 0.0)


def apply_geometric(images: jnp.ndarray, labels: jnp.ndarray,
                    src_hw: jnp.ndarray, params: Dict[str, jnp.ndarray],
                    crop_hw: Tuple[int, int],
                    ignore_label: int = 255
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the composed warp with explicit params (see module docstring).

    images: (B, S_h, S_w, 3) uint8 (or float in [0, 255]) canvas; each
        sample's content occupies the top-left (h, w) = src_hw[b] region.
    labels: (B, S_h, S_w) integer canvas, ignore-filled outside (h, w).
    Returns (images (B, Hc, Wc, 3) float32 in [0, 1],
             labels (B, Hc, Wc) int32).
    """
    B, Sh, Sw = images.shape[0], images.shape[1], images.shape[2]
    Hc, Wc = int(crop_hw[0]), int(crop_hw[1])

    def col(v):  # (B,) -> (B, 1, 1) for broadcasting over the output grid
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0:  # shared-linear params also work on the exact path
            v = jnp.broadcast_to(v, (B,))
        return v[:, None, None]

    h, w = col(src_hw[:, 0]), col(src_hw[:, 1])
    theta = col(params["theta"])
    scale = col(params["scale"])
    cosb, sinb = jnp.cos(theta), jnp.sin(theta)

    # Traced intermediate sizes (never materialized as shapes).
    wr = w * jnp.abs(cosb) + h * jnp.abs(sinb)        # rotate expand=True
    hr = w * jnp.abs(sinb) + h * jnp.abs(cosb)
    ws = jnp.round(wr * scale)                        # RandomScale
    hs = jnp.round(hr * scale)

    # Random crop window over the scaled image (integer offsets like the
    # host's rng.integers(0, w - tw + 1); clamped to 0 when smaller).
    cu = params["crop_u"]
    cx = jnp.floor(cu[:, 0, None, None]
                   * (jnp.maximum(ws - Wc, 0.0) + 1.0 - 1e-6))
    cy = jnp.floor(cu[:, 1, None, None]
                   * (jnp.maximum(hs - Hc, 0.0) + 1.0 - 1e-6))

    xs = jnp.arange(Wc, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(Hc, dtype=jnp.float32)[None, :, None]
    x1 = xs + cx                                       # scaled-image coords
    y1 = ys + cy
    # Beyond the scaled extent = the host RandomCrop pad_if_needed branch.
    crop_oob = ((x1 < -0.5) | (x1 > ws - 0.5)
                | (y1 < -0.5) | (y1 > hs - 0.5))

    def chain(x1c, y1c):
        """Inverse map: scaled coords -> original-image coords."""
        # undo RandomScale (PIL resize half-pixel convention)
        xr = (x1c + 0.5) * wr / jnp.maximum(ws, 1.0) - 0.5
        yr = (y1c + 0.5) * hr / jnp.maximum(hs, 1.0) - 0.5
        # undo RandomRotate: PIL rotate's output->input matrix is
        # [cos t, -sin t; sin t, cos t] about the canvas centers
        dxr = xr - (wr - 1.0) / 2.0
        dyr = yr - (hr - 1.0) / 2.0
        xt = cosb * dxr - sinb * dyr + (w - 1.0) / 2.0
        yt = sinb * dxr + cosb * dyr + (h - 1.0) / 2.0
        # undo RandomTranslate: PIL AFFINE (1,0,dx,0,1,dy) maps out->in
        xf = xt + col(params["dx"])
        yf = yt + col(params["dy"])
        # undo flips
        x0 = jnp.where(col(params["flip_h"]) > 0, (w - 1.0) - xf, xf)
        y0 = jnp.where(col(params["flip_v"]) > 0, (h - 1.0) - yf, yf)
        return x0, y0

    # ---- image: reflect at the crop stage, black beyond the source -------
    xi, yi = chain(_reflect(x1, ws), _reflect(y1, hs))
    img_oob = ((xi < -0.5) | (xi > w - 0.5) | (yi < -0.5) | (yi > h - 0.5))
    wi = (w - 1.0)
    hi = (h - 1.0)
    # label coords + analytic ignore mask (no gather needed for the mask)
    xl, yl = chain(x1, y1)
    xn = jnp.round(xl)
    yn = jnp.round(yl)
    lbl_oob = (crop_oob | (xn < 0) | (xn > wi) | (yn < 0) | (yn > hi))

    if images.dtype == jnp.uint8:
        # TPU fast path: ONE gather instead of five. A TPU gather costs
        # ~14-16 ns per INDEX nearly independently of granule size (3 B ..
        # 16 B measured identical; probe table in NOTES r4) — so the four
        # bilinear taps + the label tap, five 1M-index gathers, were >95%
        # of the measured 68.95 ms/img warp. Packing RGB+label into one
        # u32 and pre-building each 2x2 neighborhood into the gather
        # granule folds all five into ONE 1M-index gather of 4xu32, which
        # costs the same as a single-tap gather.
        #   - Coordinates are clamped BEFORE floor, so a +1 tap carries
        #     weight exactly 0 wherever the old per-tap index clamp would
        #     have fired: the clamp (and the canvas-padding guarantee)
        #     becomes a weight-0 fetch of a finite unused value. Output
        #     values are identical (ULP-level: v vs (1-f)*v + f*v).
        #   - The label rides in byte 3 and is the quad tap nearest to the
        #     sample point (jnp.round, same half-to-even ties as the float
        #     path). One documented augmentation-level approximation vs
        #     the host path: in the <=0.5 px crop-boundary sliver where
        #     the image's reflect padding is active but the crop is not
        #     out-of-bounds, the label samples the reflected (<=1 px away)
        #     position. This does not affect the semantics guards
        #     (ignore-fill, class inventory, integer geometries,
        #     distribution parity).
        xic = jnp.clip(xi, 0.0, wi)
        yic = jnp.clip(yi, 0.0, hi)
        x0f = jnp.floor(xic)
        y0f = jnp.floor(yic)
        fx = (xic - x0f)[..., None]
        fy = (yic - y0f)[..., None]
        packed = (images[..., 0].astype(jnp.uint32)
                  | (images[..., 1].astype(jnp.uint32) << 8)
                  | (images[..., 2].astype(jnp.uint32) << 16)
                  | ((labels.astype(jnp.uint32) & 0xFF) << 24))
        xp = jnp.concatenate([packed[:, :, 1:], packed[:, :, -1:]], axis=2)
        yp = jnp.concatenate([packed[:, 1:, :], packed[:, -1:, :]], axis=1)
        yxp = jnp.concatenate([xp[:, 1:, :], xp[:, -1:, :]], axis=1)
        quad = jnp.stack([packed, xp, yp, yxp],
                         axis=-1).reshape(B, Sh * Sw, 4)
        idx = (y0f.astype(jnp.int32) * Sw
               + x0f.astype(jnp.int32)).reshape(B, Hc * Wc)
        taps = jnp.take_along_axis(quad, idx[:, :, None],
                                   axis=1).reshape(B, Hc, Wc, 4)

        def rgb(t):
            return jnp.stack([t & 0xFF, (t >> 8) & 0xFF, (t >> 16) & 0xFF],
                             axis=-1).astype(jnp.float32)

        out = ((rgb(taps[..., 0]) * (1 - fx) + rgb(taps[..., 1]) * fx)
               * (1 - fy)
               + (rgb(taps[..., 2]) * (1 - fx) + rgb(taps[..., 3]) * fx)
               * fy)
        out = jnp.where(img_oob[..., None], 0.0, out / 255.0)
        # label: nearest quad tap via vector selects (a take_along_axis
        # over the size-4 minor dim would be another gather); jnp.round
        # keeps the float path's half-to-even tie convention
        selx = jnp.round(xic) > x0f
        sely = jnp.round(yic) > y0f
        t01 = jnp.where(selx, taps[..., 1], taps[..., 0])
        t23 = jnp.where(selx, taps[..., 3], taps[..., 2])
        near = jnp.where(sely, t23, t01)
        lbl = (near >> 24).astype(jnp.int32)
        return out, jnp.where(lbl_oob, ignore_label, lbl)

    # ---- float-canvas fallback: the original five-gather formulation ----
    x0f = jnp.floor(xi)
    y0f = jnp.floor(yi)
    fx = (xi - x0f)[..., None]
    fy = (yi - y0f)[..., None]
    # Clamp gather indices to the per-sample VALID region so canvas padding
    # is never sampled (mixed-resolution batches stay exact).
    ix0 = jnp.clip(x0f, 0.0, wi).astype(jnp.int32)
    ix1 = jnp.clip(x0f + 1.0, 0.0, wi).astype(jnp.int32)
    iy0 = jnp.clip(y0f, 0.0, hi).astype(jnp.int32)
    iy1 = jnp.clip(y0f + 1.0, 0.0, hi).astype(jnp.int32)

    flat = images.reshape(B, Sh * Sw, -1)

    def gather(iy, ix):
        idx = (iy * Sw + ix).reshape(B, Hc * Wc)
        g = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        return g.reshape(B, Hc, Wc, -1).astype(jnp.float32)

    out = ((gather(iy0, ix0) * (1 - fx) + gather(iy0, ix1) * fx) * (1 - fy)
           + (gather(iy1, ix0) * (1 - fx) + gather(iy1, ix1) * fx) * fy)
    out = jnp.where(img_oob[..., None], 0.0, out / 255.0)

    # ---- label: nearest, ignore everywhere geometry exposed pixels -------
    lidx = (jnp.clip(yn, 0.0, hi).astype(jnp.int32) * Sw
            + jnp.clip(xn, 0.0, wi).astype(jnp.int32)).reshape(B, Hc * Wc)
    lbl = jnp.take_along_axis(labels.reshape(B, Sh * Sw), lidx, axis=1)
    lbl = lbl.reshape(B, Hc, Wc).astype(jnp.int32)
    return out, jnp.where(lbl_oob, ignore_label, lbl)


def _sel3(t: jnp.ndarray, a0: jnp.ndarray, a1: jnp.ndarray, a2: jnp.ndarray
          ) -> jnp.ndarray:
    """Elementwise 3-way select (a take over a size-3 minor dim would lower
    to a gather — the exact op this module exists to avoid)."""
    return jnp.where(t == 0, a0, jnp.where(t == 1, a1, a2))


def apply_geometric_shared(images: jnp.ndarray, labels: jnp.ndarray,
                           src_hw: jnp.ndarray,
                           params: Dict[str, jnp.ndarray],
                           crop_hw: Tuple[int, int],
                           ignore_label: int = 255
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-shared-rotation warp: the ~6x faster gather formulation.

    TPU gathers cost ~14 ns per INDEX nearly independently of granule size,
    but an index that fetches ALL batch lanes amortizes that cost B ways
    (measured 0.89 vs 13.8 ms/img at B=16; probe table in NOTES r4). Shared
    spatial indices require the LINEAR part of the warp (rotation angle,
    scale factor) to be shared across the batch; everything per-sample is
    preserved by moving it into content preprocessing and per-sample
    scalars:

      - flips           -> per-sample canvas reversal (content move),
      - translate+crop  -> one per-sample integer 2-D roll + a fractional
                           residual handled by widening the shared gather
                           granule to a 3x3 tap window,
      - mixed (h, w)    -> per-sample edge replication of the canvas
                           padding (so clamp semantics survive shared
                           indices), analytic validity masks as before.

    The gather itself is ONE full-row take of 1M shared indices from a
    pre-built (S*S, B*9) lane array holding all nine (ty, tx) tap shifts —
    unit-major-slice row takes run at the flat ~14 ns/index cost, whereas
    the same fetch expressed as a (3, B*3) windowed slice gather measured
    ~100x slower composed (NOTES r4).

    Documented divergences from `apply_geometric` (all augmentation-level;
    marginal parameter distributions are identical):
      - (theta, scale) are drawn ONCE per batch (params from
        `sample_geometric_params(..., shared_linear=True)`),
      - the scale step uses the continuous ratio 1/s instead of PIL's
        integer-rounded output size (<=0.4 px coordinate difference under
        rotation; exact when w*s is integral),
      - the RandomCrop pad_if_needed region shows edge-clamped content
        where the host path reflects.
    Flips, integer/fractional translates, crops, label nearest-rounding
    (incl. half-to-even ties) and all validity masks match the exact path
    bit-for-bit (tested).
    """
    B, Sh, Sw = images.shape[0], images.shape[1], images.shape[2]
    if Sh != Sw:
        raise ValueError("shared-mode canvas must be square (fixed loader "
                         f"canvas); got {(Sh, Sw)}")
    S = Sh
    Hc, Wc = int(crop_hw[0]), int(crop_hw[1])
    if images.dtype != jnp.uint8:
        raise ValueError("shared mode requires a uint8 canvas")

    h = src_hw[:, 0].astype(jnp.float32)  # (B,)
    w = src_hw[:, 1].astype(jnp.float32)
    theta = jnp.asarray(params["theta"], jnp.float32)
    scale = jnp.asarray(params["scale"], jnp.float32)
    if theta.ndim or scale.ndim:
        raise ValueError("shared mode needs scalar theta/scale — draw "
                         "params with sample_geometric_params("
                         "shared_linear=True)")
    cosb, sinb = jnp.cos(theta), jnp.sin(theta)

    # ---- per-sample scalars of the inverse map ---------------------------
    wr = w * jnp.abs(cosb) + h * jnp.abs(sinb)        # rotate expand=True
    hr = w * jnp.abs(sinb) + h * jnp.abs(cosb)
    ws = wr * scale                                    # continuous ratio
    hs = hr * scale
    cu = params["crop_u"]
    cx = jnp.floor(cu[:, 0] * (jnp.maximum(ws - Wc, 0.0) + 1.0 - 1e-6))
    cy = jnp.floor(cu[:, 1] * (jnp.maximum(hs - Hc, 0.0) + 1.0 - 1e-6))
    rhox = (cx + 0.5) / scale - 0.5                    # undo-scale offsets
    rhoy = (cy + 0.5) / scale - 0.5
    # source coords: xf = ux + Dx_b with ux = (cos*x - sin*y)/s shared
    dx_ = rhox - (wr - 1.0) / 2.0
    dy_ = rhoy - (hr - 1.0) / 2.0
    Dx = cosb * dx_ - sinb * dy_ + (w - 1.0) / 2.0 + params["dx"]
    Dy = sinb * dx_ + cosb * dy_ + (h - 1.0) / 2.0 + params["dy"]
    # flips move CONTENT; sampling then shifts by the content offset
    ox = jnp.where(params["flip_h"], jnp.float32(S) - w, 0.0)
    oy = jnp.where(params["flip_v"], jnp.float32(S) - h, 0.0)
    shiftx = Dx + ox                                   # (B,) canvas shifts
    shifty = Dy + oy
    kx = jnp.floor(shiftx)                             # integer -> roll
    ky = jnp.floor(shifty)
    deltax = shiftx - kx                               # fractional in [0,1)
    deltay = shifty - ky

    # ---- canvas preprocessing (all full-bandwidth VPU passes) ------------
    packed = (images[..., 0].astype(jnp.uint32)
              | (images[..., 1].astype(jnp.uint32) << 8)
              | (images[..., 2].astype(jnp.uint32) << 16)
              | ((labels.astype(jnp.uint32) & 0xFF) << 24))
    # edge-replicate the per-sample padding so shared indices see clamp
    # semantics at the valid-region border
    wi32 = (src_hw[:, 1] - 1).astype(jnp.int32)
    hi32 = (src_hw[:, 0] - 1).astype(jnp.int32)
    colx = jnp.arange(S, dtype=jnp.int32)
    edge_c = jnp.take_along_axis(packed, wi32[:, None, None] *
                                 jnp.ones((B, S, 1), jnp.int32), axis=2)
    packed = jnp.where(colx[None, None, :] > wi32[:, None, None],
                       edge_c, packed)
    edge_r = jnp.take_along_axis(packed, hi32[:, None, None] *
                                 jnp.ones((B, 1, S), jnp.int32), axis=1)
    packed = jnp.where(colx[None, :, None] > hi32[:, None, None],
                       edge_r, packed)
    # per-sample flips (content reversal)
    packed = jnp.where(params["flip_h"][:, None, None],
                       packed[:, :, ::-1], packed)
    packed = jnp.where(params["flip_v"][:, None, None],
                       packed[:, ::-1, :], packed)

    # per-sample integer 2-D shift with EDGE-CLAMP (not wrap): a wrapped
    # roll would blend up to 50% of the far edge into taps within 0.5 px of
    # the content border, where the exact path clamps. |k| > S means every
    # sampled tap is out-of-content (masked), so clamping k is lossless.
    rx = jnp.clip(kx, -S, S).astype(jnp.int32)
    ry = jnp.clip(ky, -S, S).astype(jnp.int32)

    def roll_one(img, sy, sx):
        d = jnp.concatenate([jnp.broadcast_to(img[:1], (S, S)), img,
                             jnp.broadcast_to(img[-1:], (S, S))], axis=0)
        img = jax.lax.dynamic_slice(d, (S + sy, jnp.int32(0)), (S, S))
        d = jnp.concatenate([jnp.broadcast_to(img[:, :1], (S, S)), img,
                             jnp.broadcast_to(img[:, -1:], (S, S))], axis=1)
        return jax.lax.dynamic_slice(d, (jnp.int32(0), S + sx), (S, S))

    rolled = jax.vmap(roll_one)(packed, ry, rx)        # (B, S, S)

    # full 3x3 tap window in the gather LANES: every shared index fetches
    # whole (S*S, B*9) rows via jnp.take — unit-major-slice gathers run at
    # the flat ~14 ns/index cost, while a (3, B*3) windowed slice (non-unit
    # slice on the major axis) measured ~100x slower composed (NOTES r4)
    t = jnp.transpose(rolled, (1, 2, 0))               # (y, x, B)

    def sh_y(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    def sh_x(a):
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    rows3 = [t, sh_y(t), sh_y(sh_y(t))]                # ty = 0, 1, 2
    lanes = jnp.stack([v for r in rows3
                       for v in (r, sh_x(r), sh_x(sh_x(r)))],
                      axis=-1)                         # (y, x, B, 9) ty*3+tx
    lanes = lanes.reshape(S * S, B * 9)

    # ---- shared-index gather ---------------------------------------------
    xs = jnp.arange(Wc, dtype=jnp.float32)[None, :]
    ys = jnp.arange(Hc, dtype=jnp.float32)[:, None]
    ux = (cosb * xs - sinb * ys) / scale               # (Hc, Wc) shared
    uy = (sinb * xs + cosb * ys) / scale
    basex = jnp.clip(jnp.floor(ux), 0.0, S - 3).astype(jnp.int32)
    basey = jnp.clip(jnp.floor(uy), 0.0, S - 3).astype(jnp.int32)
    starts = (basey * S + basex).reshape(Hc * Wc)
    taps = jnp.take(lanes, starts, axis=0)             # (N, B*9)
    taps = taps.reshape(Hc, Wc, B, 3, 3)               # (y, x, b, ty, tx)

    # ---- per-sample epilogue (broadcast (Hc, Wc, B), vector selects) -----
    px = ux[:, :, None] + deltax[None, None, :]        # rolled-frame coords
    py = uy[:, :, None] + deltay[None, None, :]
    fxp = jnp.floor(px)
    fyp = jnp.floor(py)
    frx = (px - fxp)
    fry = (py - fyp)
    t0x = jnp.clip(fxp.astype(jnp.int32) - basex[:, :, None], 0, 1)
    t0y = jnp.clip(fyp.astype(jnp.int32) - basey[:, :, None], 0, 1)
    x0 = _sel3(t0x[..., None], taps[..., 0], taps[..., 1],
               taps[..., 2])                               # (H,W,B,3ty)
    x1 = _sel3(t0x[..., None] + 1, taps[..., 0], taps[..., 1],
               taps[..., 2])
    v00 = _sel3(t0y, x0[..., 0], x0[..., 1], x0[..., 2])          # (H,W,B)
    v01 = _sel3(t0y + 1, x0[..., 0], x0[..., 1], x0[..., 2])
    v10 = _sel3(t0y, x1[..., 0], x1[..., 1], x1[..., 2])
    v11 = _sel3(t0y + 1, x1[..., 0], x1[..., 1], x1[..., 2])

    def rgb(tp):
        return jnp.stack([tp & 0xFF, (tp >> 8) & 0xFF, (tp >> 16) & 0xFF],
                         axis=-1).astype(jnp.float32)

    fx = frx[..., None]
    fy = fry[..., None]
    out = ((rgb(v00) * (1 - fx) + rgb(v10) * fx) * (1 - fy)
           + (rgb(v01) * (1 - fx) + rgb(v11) * fx) * fy)

    # ---- analytic validity masks (same contracts as apply_geometric) -----
    xf = ux[:, :, None] + Dx[None, None, :]            # source-frame coords
    yf = uy[:, :, None] + Dy[None, None, :]
    wB = w[None, None, :]
    hB = h[None, None, :]
    img_oob = ((xf < -0.5) | (xf > wB - 0.5) | (yf < -0.5) | (yf > hB - 0.5))
    out = jnp.where(img_oob[..., None], 0.0, out / 255.0)

    x1c = xs[:, :, None] + cx[None, None, :]           # crop-window coords
    y1c = ys[:, :, None] + cy[None, None, :]
    crop_oob = ((x1c < -0.5) | (x1c > ws[None, None, :] - 0.5)
                | (y1c < -0.5) | (y1c > hs[None, None, :] - 0.5))
    # label: nearest (round-half-up) tap, selected among the 3x3 window
    # nearest tap: round in the SOURCE frame (round-half-even there, exactly
    # like the host/exact paths — half-even is not shift-invariant, so
    # rounding the rolled-frame coordinate would flip ties), then shift by
    # the per-sample integer offset between the frames (p - xf = o - k).
    oxk = (ox - kx).astype(jnp.int32)[None, None, :]
    oyk = (oy - ky).astype(jnp.int32)[None, None, :]
    tnx = jnp.clip(jnp.round(xf).astype(jnp.int32) + oxk
                   - basex[:, :, None], 0, 2)
    tny = jnp.clip(jnp.round(yf).astype(jnp.int32) + oyk
                   - basey[:, :, None], 0, 2)
    ln = _sel3(tnx[..., None], taps[..., 0], taps[..., 1], taps[..., 2])
    ln = _sel3(tny, ln[..., 0], ln[..., 1], ln[..., 2])
    lbl = (ln >> 24).astype(jnp.int32)
    lbl_oob = (crop_oob | (jnp.round(xf) < 0) | (jnp.round(xf) > wB - 1.0)
               | (jnp.round(yf) < 0) | (jnp.round(yf) > hB - 1.0))
    lbl = jnp.where(lbl_oob, ignore_label, lbl)

    return (jnp.transpose(out, (2, 0, 1, 3)),
            jnp.transpose(lbl, (2, 0, 1)))


def geometric_pipeline(images: jnp.ndarray, labels: jnp.ndarray,
                       src_hw: jnp.ndarray, key: jax.Array,
                       aug: Optional[Dict], crop_hw: Tuple[int, int],
                       ignore_label: int = 255,
                       shared_linear: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample params + apply: the one-call training entry point.

    Composes with ops/photometric.photometric_pipeline (which expects [0,1]
    RGB) for the full aerial recipe fused into the train step.
    `shared_linear=True` selects the batch-shared-rotation fast path
    (apply_geometric_shared; `runtime.device_geometric=shared`).
    """
    params = sample_geometric_params(key, images.shape[0], aug or {}, src_hw,
                                     shared_linear=shared_linear)
    if shared_linear:
        return apply_geometric_shared(images, labels, src_hw, params,
                                      crop_hw, ignore_label)
    return apply_geometric(images, labels, src_hw, params, crop_hw,
                           ignore_label)
