"""On-device photometric augmentation (jit/XLA-fused).

The host pipeline (data/transforms.py) keeps exact PIL semantics for the
geometric ops; this module provides the photometric tail + mixup as pure
jittable functions over BATCHED uint8/float tensors, so pipelines that want
zero host-side photometric cost can fuse them into the train step (north
star: "augmentations fused into XLA"). Each op consumes explicit PRNG keys.

Formulas mirror data/transforms.py (and therefore Ultralytics/the reference):
HSV additive-wrapping hue + multiplicative sat/val, gamma on [0,1], gaussian
noise as a fraction of 255, zeroed cutout squares, Beta(32,32) mixup with the
dominant image's hard label.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> HSV [0,1], channel-last."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rang = maxc - minc
    s = jnp.where(maxc > 0, rang / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rang, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rang == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Branchless sector formula. The classic 6-sector select via
    ``jnp.choose`` lowers to an XLA GATHER, which TPU emulates at ~75M
    elem/s — measured 53.9 ms/img at batch-16 1024² (the entire photometric
    pipeline's cost). This arithmetic form is pure VPU elementwise
    (~0.1 ms/img) and matches the sector table to fp rounding."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]

    def chan(n):
        k = jnp.mod(n + h * 6.0, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def random_hsv(images: jnp.ndarray, key: jax.Array, hgain: float = 0.015,
               sgain: float = 0.4, vgain: float = 0.3) -> jnp.ndarray:
    """Per-sample HSV jitter on [0,1] RGB (B,H,W,3)."""
    B = images.shape[0]
    kh, ks, kv = jax.random.split(key, 3)
    r_h = jax.random.uniform(kh, (B, 1, 1), minval=-1, maxval=1) * hgain
    r_s = jax.random.uniform(ks, (B, 1, 1), minval=-1, maxval=1) * sgain
    r_v = jax.random.uniform(kv, (B, 1, 1), minval=-1, maxval=1) * vgain
    hsv = rgb_to_hsv(images)
    h = (hsv[..., 0] + r_h) % 1.0
    s = jnp.clip(hsv[..., 1] * (r_s + 1.0), 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * (r_v + 1.0), 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def random_gamma(images: jnp.ndarray, key: jax.Array,
                 gamma_range: Tuple[float, float] = (0.8, 1.2),
                 p: float = 0.3) -> jnp.ndarray:
    B = images.shape[0]
    kg, kp = jax.random.split(key)
    gamma = jax.random.uniform(kg, (B, 1, 1, 1), minval=gamma_range[0],
                               maxval=gamma_range[1])
    apply = jax.random.uniform(kp, (B, 1, 1, 1)) < p
    out = jnp.clip(images, 0.0, 1.0) ** gamma
    return jnp.where(apply, out, images)


def random_noise(images: jnp.ndarray, key: jax.Array, sigma: float = 0.03,
                 p: float = 0.3) -> jnp.ndarray:
    B = images.shape[0]
    kn, kp = jax.random.split(key)
    noise = jax.random.normal(kn, images.shape, images.dtype) * sigma
    apply = jax.random.uniform(kp, (B, 1, 1, 1)) < p
    return jnp.where(apply, jnp.clip(images + noise, 0.0, 1.0), images)


def random_contrast(images: jnp.ndarray, key: jax.Array,
                    strength: float = 0.5) -> jnp.ndarray:
    """ImageEnhance.Contrast semantics: blend with the grayscale mean."""
    B = images.shape[0]
    factor = jax.random.uniform(key, (B, 1, 1, 1),
                                minval=max(1 - strength, 0.0),
                                maxval=1 + strength)
    gray = (images[..., 0] * 0.299 + images[..., 1] * 0.587
            + images[..., 2] * 0.114)
    mean = gray.mean(axis=(1, 2), keepdims=True)[..., None]
    return jnp.clip(mean + (images - mean) * factor, 0.0, 1.0)


def _luma(images: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' conversion (ITU-R 601 luma), kept as a trailing channel dim."""
    return (images[..., 0] * 0.299 + images[..., 1] * 0.587
            + images[..., 2] * 0.114)[..., None]


def random_brightness(images: jnp.ndarray, key: jax.Array,
                      strength: float = 0.5) -> jnp.ndarray:
    """ImageEnhance.Brightness semantics: blend with black (scale)."""
    B = images.shape[0]
    factor = jax.random.uniform(key, (B, 1, 1, 1),
                                minval=max(1 - strength, 0.0),
                                maxval=1 + strength)
    return jnp.clip(images * factor, 0.0, 1.0)


def random_saturation(images: jnp.ndarray, key: jax.Array,
                      strength: float = 0.5) -> jnp.ndarray:
    """ImageEnhance.Color semantics: blend with the per-pixel grayscale."""
    B = images.shape[0]
    factor = jax.random.uniform(key, (B, 1, 1, 1),
                                minval=max(1 - strength, 0.0),
                                maxval=1 + strength)
    gray = _luma(images)
    return jnp.clip(gray + (images - gray) * factor, 0.0, 1.0)


def random_grayscale(images: jnp.ndarray, key: jax.Array,
                     p: float = 0.2) -> jnp.ndarray:
    """PIL convert('L').convert('RGB') with probability p per sample."""
    B = images.shape[0]
    apply = jax.random.uniform(key, (B, 1, 1, 1)) < p
    gray = jnp.broadcast_to(_luma(images), images.shape)
    return jnp.where(apply, gray, images)


def random_cutout(images: jnp.ndarray, key: jax.Array, size: int = 64,
                  p: float = 0.3) -> jnp.ndarray:
    B, H, W, _ = images.shape
    ky, kx, kp = jax.random.split(key, 3)
    y0 = jax.random.randint(ky, (B,), 0, max(H - size, 1))
    x0 = jax.random.randint(kx, (B,), 0, max(W - size, 1))
    apply = jax.random.uniform(kp, (B,)) < p
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    inside = ((yy >= y0[:, None, None]) & (yy < y0[:, None, None] + size)
              & (xx >= x0[:, None, None]) & (xx < x0[:, None, None] + size))
    mask = inside & apply[:, None, None]
    return jnp.where(mask[..., None], 0.0, images)


def mixup(images: jnp.ndarray, labels: jnp.ndarray, key: jax.Array,
          p: float = 0.1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-level mixup: blend each sample with a rolled partner with
    probability p; ratio ~ Beta(32,32); hard label from the dominant image
    (reference uavid.py:253-271)."""
    B = images.shape[0]
    kp, kr = jax.random.split(key)
    apply = jax.random.uniform(kp, (B,)) < p
    r = jax.random.beta(kr, 32.0, 32.0, (B,))
    partner_img = jnp.roll(images, 1, axis=0)
    partner_lbl = jnp.roll(labels, 1, axis=0)
    r_img = r[:, None, None, None]
    blended = images * r_img + partner_img * (1.0 - r_img)
    out_img = jnp.where(apply[:, None, None, None], blended, images)
    take_partner = apply & (r < 0.5)
    out_lbl = jnp.where(take_partner[:, None, None], partner_lbl, labels)
    return out_img, out_lbl


def normalize(images: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def photometric_pipeline(images: jnp.ndarray, labels: jnp.ndarray,
                         key: jax.Array, aug: Optional[Dict] = None,
                         mean=None, std=None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The aerial recipe's photometric tail, fused under one jit:
    HSV -> contrast -> gamma -> noise -> cutout -> mixup -> normalize.
    `images` are raw [0,1] RGB; output is normalized when mean/std given."""
    aug = aug or {}
    k = jax.random.split(key, 6)
    x = random_hsv(images, k[0], aug.get("hsv_h", 0.01),
                   aug.get("hsv_s", 0.4), aug.get("hsv_v", 0.3))
    x = random_contrast(x, k[1], 0.5)
    x = random_gamma(x, k[2], (0.8, 1.2), 0.3)
    x = random_noise(x, k[3], 0.03, 0.3)
    x = random_cutout(x, k[4], 64, 0.3)
    x, labels = mixup(x, labels, k[5], aug.get("mixup", 0.1))
    if mean is not None:
        x = normalize(x, mean, std)
    return x, labels


def street_photometric_pipeline(images: jnp.ndarray, labels: jnp.ndarray,
                                key: jax.Array, aug: Optional[Dict] = None,
                                mean=None, std=None
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The Cityscapes street recipe's photometric tail, fused under one jit
    (host recipe: data/datasets.py CityScapes._build_train_transforms,
    reference cityscapes.py:114-136): ColorJitter(brightness/contrast/
    saturation 0.5) -> grayscale p=.2 -> gamma -> noise -> cutout ->
    normalize. No HSV, no mixup (the street recipe has neither)."""
    del aug  # the street recipe is fixed (reference values)
    k = jax.random.split(key, 6)
    x = random_brightness(images, k[0], 0.5)
    x = random_contrast(x, k[1], 0.5)
    x = random_saturation(x, k[2], 0.5)
    x = random_grayscale(x, k[3], 0.2)
    x = random_gamma(x, k[4], (0.8, 1.2), 0.3)
    kn, kc = jax.random.split(k[5])
    x = random_noise(x, kn, 0.03, 0.3)
    x = random_cutout(x, kc, 64, 0.3)
    if mean is not None:
        x = normalize(x, mean, std)
    return x, labels
