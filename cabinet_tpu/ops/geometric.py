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
                            src_hw: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Draw per-sample augmentation parameters.

    Matches the host recipe's distributions (data/datasets.py
    _build_train_transforms): flips ~ Bernoulli(fliplr/flipud), translate
    ~ U(-t, t) * (w, h) pixels, angle ~ U(-degrees, degrees), scale
    ~ U(1-s, 1+s) continuous, crop offset uniform over the valid window.

    src_hw: (B, 2) int32 valid (h, w) per sample within the canvas.
    Returns a dict of (B,)-shaped arrays (crop offsets are resolved inside
    apply_geometric because they depend on the traced scaled size).
    """
    kf, kg, kt, ku, kr, ks, kc = jax.random.split(key, 7)
    h = src_hw[:, 0].astype(jnp.float32)
    w = src_hw[:, 1].astype(jnp.float32)
    t = float(aug.get("translate", 0.0))
    deg = float(aug.get("degrees", 0.0))
    s = float(aug.get("scale", 0.0))
    return {
        "flip_h": jax.random.uniform(kf, (batch,)) < float(aug.get("fliplr", 0.0)),
        "flip_v": jax.random.uniform(kg, (batch,)) < float(aug.get("flipud", 0.0)),
        "dx": jax.random.uniform(kt, (batch,), minval=-t, maxval=t) * w,
        "dy": jax.random.uniform(ku, (batch,), minval=-t, maxval=t) * h,
        "theta": jnp.deg2rad(
            jax.random.uniform(kr, (batch,), minval=-deg, maxval=deg)),
        "scale": jax.random.uniform(ks, (batch,), minval=1.0 - s,
                                    maxval=1.0 + s),
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
        return v.astype(jnp.float32)[:, None, None]

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
        #     sample point (fx/fy >= 0.5). Two documented augmentation-
        #     level approximations vs the host path: round-half-up instead
        #     of jnp.round's half-to-even at exact .5 fractions, and in
        #     the <=0.5 px crop-boundary sliver where the image's reflect
        #     padding is active but the crop is not out-of-bounds the
        #     label samples the reflected (<=1 px away) position. Neither
        #     affects the semantics guards (ignore-fill, class inventory,
        #     integer geometries, distribution parity).
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
        # over the size-4 minor dim would be another gather)
        t01 = jnp.where(fx[..., 0] >= 0.5, taps[..., 1], taps[..., 0])
        t23 = jnp.where(fx[..., 0] >= 0.5, taps[..., 3], taps[..., 2])
        near = jnp.where(fy[..., 0] >= 0.5, t23, t01)
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


def geometric_pipeline(images: jnp.ndarray, labels: jnp.ndarray,
                       src_hw: jnp.ndarray, key: jax.Array,
                       aug: Optional[Dict], crop_hw: Tuple[int, int],
                       ignore_label: int = 255
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample params + apply: the one-call training entry point.

    Composes with ops/photometric.photometric_pipeline (which expects [0,1]
    RGB) for the full aerial recipe fused into the train step.
    """
    params = sample_geometric_params(key, images.shape[0], aug or {}, src_hw)
    return apply_geometric(images, labels, src_hw, params, crop_hw,
                           ignore_label)
