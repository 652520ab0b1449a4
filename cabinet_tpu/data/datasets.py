"""Dataset loaders for the shared images/+masks/ layout + Cityscapes.

Capability parity with the reference's four loaders
(src/datasets/{uavid,aeroscapes,vdd,cityscapes}.py), consolidated into one
base class because they differ only in: extension, class count,
normalization stats, split availability, and resolution uniformity.

Contracts preserved exactly:
  - pair discovery with warn-and-skip for missing masks, error when empty
    (uavid.py:142-168),
  - train mode applies the aerial augmentation recipe (ResizeIfLarger ->
    flips -> translate -> rotate -> continuous scale -> crop(pad) -> HSV ->
    contrast jitter -> gamma -> noise -> cutout, uavid.py:192-229); val/test
    apply NO resize/crop (native-resolution eval),
  - per-dataset normalization constants (uavid.py:175-183,
    aeroscapes.py:162-170, vdd.py:162-170, cityscapes ImageNet),
  - MixUp: Beta(32,32) image blend, hard label from the dominant image
    (uavid.py:253-271),
  - AeroScapes has no test split (aeroscapes.py:67-70); UAVid/VDD val/test
    batching constraints surface via `uniform_resolution`,
  - Cityscapes remaps raw ids -> trainIds via a 256-entry LUT built from the
    palette table (cityscapes.py:53-61,165-173).

TPU-first output format: samples are returned as NHWC numpy arrays
(image float32 (H,W,3) normalized, label int64 (H,W)) ready for host->device
transfer without a transpose. Randomness is derived from (seed, epoch, index)
so multi-process loading replays deterministically.
"""

from __future__ import annotations

import os
import os.path as osp
import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from cabinet_tpu.core.exceptions import DatasetError
from cabinet_tpu.data import decode
from cabinet_tpu.data import transforms as T
from cabinet_tpu.data.palettes import CITYSCAPES_CLASSES, id_to_trainid_lut, load_labels_info

Array = np.ndarray

# Mirrors the YOLO pipeline's augmentation knobs (reference uavid.py:37-47).
DEFAULT_AUGMENTATION: Dict[str, float] = {
    "degrees": 10.0,
    "translate": 0.05,
    "scale": 0.3,
    "flipud": 0.2,
    "fliplr": 0.5,
    "hsv_h": 0.01,
    "hsv_s": 0.4,
    "hsv_v": 0.3,
    "mixup": 0.1,
}


class FolderSegDataset:
    """Base loader for the converted images/{split} + masks/{split} layout."""

    # Subclass contract ------------------------------------------------------
    NAME = "base"
    NUM_CLASSES = 0
    MEAN: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    STD: Tuple[float, float, float] = (0.25, 0.25, 0.25)
    IMG_EXT = ".png"
    SPLITS = ("train", "val", "test")
    UNIFORM_RESOLUTION = False  # True => val/test may batch >1
    RECIPE = "aerial"  # selects the device photometric chain in cli.train

    def __init__(
        self,
        ignore_lb: int,
        rootpth: str,
        cropsize: Sequence[int],
        mode: str = "train",
        augmentation: Optional[Dict[str, Any]] = None,
        seed: int = 15,
        photometric: str = "host",
        geometric: str = "host",
        decoder: str = "pil",
        reduced_decode: bool = False,
        decode_cache: Optional[str] = None,
    ) -> None:
        """photometric: "host" applies the full recipe here (PIL, exact
        reference semantics); "device" keeps only the geometric ops on the
        host and returns UN-normalized [0,1] images — the trainer then runs
        ops/photometric.photometric_pipeline (HSV/contrast/gamma/noise/
        cutout/mixup + normalize) fused under jit on the TPU.

        geometric: "device" (train mode, requires photometric="device")
        additionally moves flip/translate/rotate/scale/crop onto the TPU
        (ops/geometric.geometric_pipeline): the host keeps only decode +
        ResizeIfLarger + a memcpy into a fixed (2*max(cropsize))^2 canvas,
        and __getitem__ returns (canvas u8, label canvas u8 ignore-filled,
        (h, w) int32) — the measured cure for the host-PIL train wall
        (NOTES r3 "Input-pipeline throughput").

        decoder: "pil" | "cv2" — bit-equal decode backends (data/decode.py
        carries the A/B table; cv2 is 1.2-1.6x on 4K images). reduced_decode
        additionally DCT-downscales JPEG sources on the device-geometric
        canvas path only (the exact-recipe host path keeps full-resolution
        reference decode semantics). decode_cache: directory memoizing the
        (deterministic) canvas triples to disk — warm epochs skip decode."""
        if mode not in ("train", "val", "test"):
            raise ValueError(f"Mode '{mode}' not supported. "
                             "Choose 'train', 'val', or 'test'.")
        if mode not in self.SPLITS:
            raise DatasetError(f"{self.NAME} has no '{mode}' split")
        if not osp.exists(rootpth):
            raise FileNotFoundError(f"Dataset root does not exist: {rootpth}")

        self.mode = mode
        self.ignore_lb = ignore_lb
        self.rootpth = rootpth
        self.cropsize = tuple(int(c) for c in cropsize)
        self.aug = {**DEFAULT_AUGMENTATION, **(augmentation or {})}
        self.seed = seed
        self.epoch = 0
        if photometric not in ("host", "device"):
            raise ValueError(f"photometric must be host|device, got {photometric}")
        self.photometric = photometric
        if geometric not in ("host", "device"):
            raise ValueError(f"geometric must be host|device, got {geometric}")
        if geometric == "device" and mode == "train" and photometric != "device":
            raise ValueError("geometric='device' requires photometric='device' "
                             "(the device pipeline normalizes after cropping)")
        if geometric == "device" and not (0 <= ignore_lb <= 255):
            raise ValueError("geometric='device' ships labels as uint8; "
                             f"ignore_lb={ignore_lb} does not fit")
        self.geometric = geometric if mode == "train" else "host"
        self.decoder = decode.check_decoder(decoder)
        if reduced_decode and mode == "train" and self.geometric != "device":
            raise ValueError(
                "reduced_decode requires geometric='device' "
                "(runtime.device_geometric): the exact-recipe host path "
                "keeps full-resolution reference decode semantics")
        # eval/val stays exact-protocol: reduced decode is train-only
        self.reduced_decode = bool(reduced_decode) and self.geometric == "device"
        self._cache_dir = None
        if decode_cache and self.geometric == "device":
            from pathlib import Path

            self._cache_dir = Path(decode_cache) / f"{self.NAME}_{mode}"
            self._cache_dir.mkdir(parents=True, exist_ok=True)

        img_dir = osp.join(rootpth, "images", mode)
        mask_dir = osp.join(rootpth, "masks", mode)
        for d in (img_dir, mask_dir):
            if not osp.exists(d):
                raise FileNotFoundError(f"Directory not found: {d}")

        self.samples: List[Tuple[str, str]] = []
        skipped = []
        for fn in sorted(os.listdir(img_dir)):
            if not fn.lower().endswith(self.IMG_EXT):
                continue
            stem = osp.splitext(fn)[0]
            mask_path = osp.join(mask_dir, stem + ".png")
            if not osp.exists(mask_path):
                skipped.append(stem)
                continue
            self.samples.append((osp.join(img_dir, fn), mask_path))
        if skipped:
            warnings.warn(
                f"{len(skipped)} image(s) have no matching mask in {mask_dir} "
                f"and will be skipped: {sorted(skipped)[:5]}..."
            )
        if not self.samples:
            raise DatasetError(
                f"No valid image-mask pairs found for mode='{mode}' in {rootpth}."
            )

        if self.geometric == "device":
            # decode-only host path: cap resolution, defer all augs to device
            self.canvas = 2 * max(self.cropsize)
            self.trans_train = T.Compose(
                [T.ResizeIfLarger(max_size=self.canvas, fast=True)])
        else:
            self.trans_train = (self._build_train_transforms()
                                if mode == "train" else None)
        self.mixup_p = (float(self.aug["mixup"])
                        if mode == "train" and photometric == "host" else 0.0)

    # -------------------------------------------------------------------
    def _build_train_transforms(self) -> T.Compose:
        degrees = float(self.aug["degrees"])
        scale = float(self.aug["scale"])
        geometric = [
            T.ResizeIfLarger(max_size=2 * max(self.cropsize)),
            T.RandomHorizontalFlip(p=float(self.aug["fliplr"])),
            T.RandomVerticalFlip(p=float(self.aug["flipud"])),
            T.RandomTranslate(translate=float(self.aug["translate"]),
                              ignore_label=self.ignore_lb),
            T.RandomRotate(degrees=(-degrees, degrees),
                           ignore_label=self.ignore_lb),
            T.RandomScale((1.0 - scale, 1.0 + scale), continuous=True),
            T.RandomCrop(size=self.cropsize, pad_if_needed=True,
                         ignore_label=self.ignore_lb),
        ]
        if self.photometric == "device":
            return T.Compose(geometric)
        return T.Compose(geometric + [
            T.RandomHSV(hgain=float(self.aug["hsv_h"]),
                        sgain=float(self.aug["hsv_s"]),
                        vgain=float(self.aug["hsv_v"])),
            T.RandomColorJitter(contrast=0.5),
            T.RandomGamma(gamma_range=(0.8, 1.2), p=0.3),
            T.RandomNoise(mode="gaussian", sigma=0.03, p=0.3),
            T.RandomCutout(p=0.3, size=64),
        ])

    def set_epoch(self, epoch: int) -> None:
        """Advance the deterministic augmentation stream."""
        self.epoch = int(epoch)

    def _rng_for(self, idx: int) -> np.random.Generator:
        return np.random.default_rng([self.seed, self.epoch, idx])

    def _normalize(self, img: Image.Image) -> Array:
        from cabinet_tpu import native

        arr = np.asarray(img, dtype=np.uint8)
        if self.mode == "train" and self.photometric == "device":
            # raw [0,1]; the device pipeline normalizes
            return native.normalize_u8_f32(arr, (0.0, 0.0, 0.0),
                                           (1.0, 1.0, 1.0))
        # fused C kernel (bit-equal to the numpy expression; tests/unit/
        # test_native.py) — one pass instead of three numpy temporaries
        return native.normalize_u8_f32(arr, self.MEAN, self.STD)

    def _decode_label(self, label: Image.Image) -> Array:
        return np.asarray(label, dtype=np.int64)

    def _load_one(self, idx: int, rng: np.random.Generator) -> Tuple[Array, Array]:
        img_path, mask_path = self.samples[idx]
        img = decode.open_rgb(img_path, self.decoder)
        label = decode.open_mask(mask_path, self.decoder)
        if self.trans_train is not None:
            out = self.trans_train({"image": img, "label": label}, rng)
            img, label = out["image"], out["label"]
        return self._normalize(img), self._decode_label(label)

    def _canvas_label(self, label: Image.Image) -> Array:
        """Label decode for the u8 canvas path (subclass hook: CityScapes
        remaps raw ids -> trainIds here)."""
        return np.asarray(label, dtype=np.uint8)

    def _lut_sig(self) -> bytes:
        """Part of the decode-cache key for subclasses whose label decode
        depends on configuration (CityScapes id->trainId LUT)."""
        return b""

    def _cache_file(self, idx: int):
        """Cache path for one canvas triple, keyed on everything that can
        change its bytes: source file identity (name/mtime/size for both
        image and mask), canvas geometry, ignore fill, the reduced-decode
        flag (it changes image pixels), and the label LUT. The DECODER is
        deliberately excluded — its contract is bit-equality (decode.py,
        tests/unit/test_decode.py)."""
        import hashlib

        img_path, mask_path = self.samples[idx]
        st_i, st_m = os.stat(img_path), os.stat(mask_path)
        key = hashlib.sha1(repr((
            osp.basename(img_path), st_i.st_mtime_ns, st_i.st_size,
            osp.basename(mask_path), st_m.st_mtime_ns, st_m.st_size,
            self.canvas, self.ignore_lb, self.reduced_decode,
        )).encode() + self._lut_sig()).hexdigest()[:16]
        return self._cache_dir / f"{idx:06d}_{key}.npz"

    def _load_canvas(self, idx: int, rng: np.random.Generator
                     ) -> Tuple[Array, Array, Array]:
        """geometric='device' host path: decode + ResizeIfLarger + memcpy
        into a fixed canvas. Returns (image (S,S,3) u8, label (S,S) u8
        ignore-filled outside the valid region, (h, w) int32).

        With decode_cache set, the triple is memoized to disk: this path
        is deterministic (ResizeIfLarger reads no rng — every augmentation
        lives on the device), so the cache is EXACT, and warm epochs skip
        the decode wall entirely (measured 246 -> ~20 ms/img on 4K PNG,
        NOTES r5; the reference has no analog — its loader re-decodes
        every epoch, reference base_dataset.py __getitem__)."""
        if self._cache_dir is not None:
            f = self._cache_file(idx)
            if f.exists():
                try:
                    d = np.load(f)
                    return d["ci"], d["cl"], d["hw"]
                except Exception:
                    pass  # partial/corrupt write: fall through and redo
            ci, cl, hw = self._decode_canvas(idx, rng)
            tmp = f.with_name(f.name + f".tmp{os.getpid()}")
            try:
                with open(tmp, "wb") as fh:
                    np.savez(fh, ci=ci, cl=cl, hw=hw)
                os.replace(tmp, f)  # atomic: loader workers may race
            except OSError:
                tmp.unlink(missing_ok=True)  # disk full etc: serve uncached
            return ci, cl, hw
        return self._decode_canvas(idx, rng)

    def _decode_canvas(self, idx: int, rng: np.random.Generator
                       ) -> Tuple[Array, Array, Array]:
        img_path, mask_path = self.samples[idx]
        img = decode.open_rgb(img_path, self.decoder,
                              reduce_to=self.canvas if self.reduced_decode
                              else 0)
        label = decode.open_mask(mask_path, self.decoder)
        out = self.trans_train({"image": img, "label": label}, rng)
        img, label = out["image"], out["label"]
        if label.size != img.size:
            # reduced JPEG decode landed the image at/under the cap, so
            # ResizeIfLarger no-opped; align the label the same way it
            # would have (NEAREST to the image's size).
            label = label.resize(img.size, Image.NEAREST)
        arr = np.asarray(img, dtype=np.uint8)
        lb = self._canvas_label(label)
        h, w = arr.shape[:2]
        s = self.canvas
        ci = np.zeros((s, s, 3), np.uint8)
        cl = np.full((s, s), self.ignore_lb, np.uint8)
        ci[:h, :w] = arr
        cl[:h, :w] = lb
        return ci, cl, np.array([h, w], np.int32)

    def __getitem__(self, idx: int) -> Tuple[Array, ...]:
        rng = self._rng_for(idx)
        if self.geometric == "device":
            return self._load_canvas(idx, rng)
        img, label = self._load_one(idx, rng)
        if self.mode == "train" and self.mixup_p > 0 and rng.random() < self.mixup_p:
            other = int(rng.integers(0, len(self.samples)))
            img2, label2 = self._load_one(other, rng)
            r = float(rng.beta(32.0, 32.0))
            img = img * r + img2 * (1.0 - r)
            label = label if r >= 0.5 else label2
        return img, label

    def __len__(self) -> int:
        return len(self.samples)


class UAVid(FolderSegDataset):
    """UAVid: 8 classes, mixed native resolutions (3840x2160 & 4096x2160) =>
    val/test batch must be 1 (reference uavid.py:105-110)."""

    NAME = "uavid"
    NUM_CLASSES = 8
    MEAN = (0.480, 0.499, 0.457)
    STD = (0.225, 0.208, 0.228)
    IMG_EXT = ".png"
    UNIFORM_RESOLUTION = False


class AeroScapes(FolderSegDataset):
    """AeroScapes: 12 classes, uniform 1280x720, .jpg images, NO test split."""

    NAME = "aeroscapes"
    NUM_CLASSES = 12
    MEAN = (0.439, 0.508, 0.460)
    STD = (0.176, 0.157, 0.194)
    IMG_EXT = ".jpg"
    SPLITS = ("train", "val")
    UNIFORM_RESOLUTION = True


class VDD(FolderSegDataset):
    """VDD: 7 classes, uniform 4000x3000, .jpg images, real train/val/test."""

    NAME = "vdd"
    NUM_CLASSES = 7
    MEAN = (0.486, 0.487, 0.441)
    STD = (0.190, 0.178, 0.214)
    IMG_EXT = ".jpg"
    UNIFORM_RESOLUTION = True


class CityScapes(FolderSegDataset):
    """Cityscapes: leftImg8bit/gtFine layout, raw-id -> trainId LUT remap,
    ImageNet normalization, street-scene augmentation recipe."""

    NAME = "cityscapes"
    NUM_CLASSES = 19
    MEAN = (0.485, 0.456, 0.406)
    STD = (0.229, 0.224, 0.225)
    UNIFORM_RESOLUTION = True  # all 2048x1024
    RECIPE = "street"
    # discrete RandomScale list (reference cityscapes.py:119) — consumed by
    # sample_geometric_params as `scale_choices` on the device path
    SCALE_CHOICES = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)

    def __init__(
        self,
        ignore_lb: int,
        rootpth: str,
        cropsize: Sequence[int],
        mode: str = "train",
        config_file: Optional[str] = None,
        seed: int = 15,
        photometric: str = "host",
        geometric: str = "host",
        decoder: str = "pil",
        reduced_decode: bool = False,
        decode_cache: Optional[str] = None,
    ) -> None:
        if mode not in ("train", "val", "test"):
            raise ValueError(f"Mode '{mode}' not supported.")
        if not osp.exists(rootpth):
            raise FileNotFoundError(f"Dataset root does not exist: {rootpth}")
        if photometric not in ("host", "device"):
            raise ValueError(f"photometric must be host|device, got {photometric}")
        if geometric not in ("host", "device"):
            raise ValueError(f"geometric must be host|device, got {geometric}")
        if geometric == "device" and mode == "train" and photometric != "device":
            raise ValueError("geometric='device' requires photometric='device' "
                             "(the device pipeline normalizes after cropping)")
        if geometric == "device" and not (0 <= ignore_lb <= 255):
            raise ValueError("geometric='device' ships labels as uint8; "
                             f"ignore_lb={ignore_lb} does not fit")

        self.mode = mode
        self.ignore_lb = ignore_lb
        self.rootpth = rootpth
        self.cropsize = tuple(int(c) for c in cropsize)
        self.seed = seed
        self.epoch = 0
        # street geometric params for the device warp: flip + discrete
        # scale + crop only (no rotate/translate/vflip, no mixup)
        self.aug = {"fliplr": 0.5, "flipud": 0.0, "degrees": 0.0,
                    "translate": 0.0, "scale_choices": self.SCALE_CHOICES,
                    "mixup": 0.0}
        self.mixup_p = 0.0
        self.photometric = photometric
        self.geometric = geometric if mode == "train" else "host"
        self.decoder = decode.check_decoder(decoder)
        # Cityscapes ships PNG; reduced (JPEG DCT) decode can never engage,
        # but the flag is validated the same way for config uniformity.
        if reduced_decode and mode == "train" and self.geometric != "device":
            raise ValueError(
                "reduced_decode requires geometric='device' "
                "(runtime.device_geometric)")
        self.reduced_decode = bool(reduced_decode) and self.geometric == "device"
        self._cache_dir = None
        if decode_cache and self.geometric == "device":
            from pathlib import Path

            self._cache_dir = Path(decode_cache) / f"{self.NAME}_{mode}"
            self._cache_dir.mkdir(parents=True, exist_ok=True)

        classes = (load_labels_info(config_file) if config_file
                   else CITYSCAPES_CLASSES)
        self._lut = id_to_trainid_lut(classes, ignore_lb)

        impth = osp.join(rootpth, "leftImg8bit", mode)
        gtpth = osp.join(rootpth, "gtFine", mode)
        for d in (impth, gtpth):
            if not osp.exists(d):
                raise FileNotFoundError(f"Directory not found: {d}")

        self.samples = []
        for city in sorted(os.listdir(impth)):
            im_folder = osp.join(impth, city)
            gt_folder = osp.join(gtpth, city)
            for im_name in sorted(os.listdir(im_folder)):
                if not im_name.endswith("_leftImg8bit.png"):
                    continue
                base = im_name[: -len("_leftImg8bit.png")]
                lb_path = osp.join(gt_folder, f"{base}_gtFine_labelIds.png")
                if not osp.exists(lb_path):
                    warnings.warn(f"Missing label for {base}, skipping.")
                    continue
                self.samples.append((osp.join(im_folder, im_name), lb_path))
        if not self.samples:
            raise DatasetError(f"No valid image-label pairs found in {mode} set.")

        if self.geometric == "device":
            # decode-only host path, street recipe deferred to device. The
            # host street recipe never resizes, so the canvas must hold the
            # NATIVE resolution even for small crops — a bare 2*cropsize
            # canvas would silently downscale every frame (ResizeIfLarger
            # box-reduce) before the on-device RandomScale whenever
            # max(cropsize) < native/2. Cityscapes is uniform-resolution;
            # PIL reads only the header here.
            with Image.open(self.samples[0][0]) as im0:
                native = max(im0.size)
            self.canvas = max(2 * max(self.cropsize), native)
            self.trans_train = T.Compose(
                [T.ResizeIfLarger(max_size=self.canvas, fast=True)])
        else:
            self.trans_train = (self._build_train_transforms()
                                if mode == "train" else None)

    def _build_train_transforms(self) -> T.Compose:
        # Street-scene recipe (reference cityscapes.py:114-136).
        geometric = [
            T.RandomHorizontalFlip(p=0.5),
            T.RandomScale(self.SCALE_CHOICES),
            T.RandomCrop(size=self.cropsize, pad_if_needed=True,
                         ignore_label=self.ignore_lb),
        ]
        if self.photometric == "device":
            # ops/photometric.street_photometric_pipeline runs the rest
            return T.Compose(geometric)
        return T.Compose(geometric + [
            T.RandomColorJitter(brightness=0.5, contrast=0.5, saturation=0.5),
            T.RandomGrayscale(p=0.2),
            T.RandomGamma(gamma_range=(0.8, 1.2), p=0.3),
            T.RandomNoise(mode="gaussian", sigma=0.03, p=0.3),
            T.RandomCutout(p=0.3, size=64),
        ])

    def _decode_label(self, label: Image.Image) -> Array:
        raw = np.asarray(label, dtype=np.int64)
        return self._lut[np.clip(raw, 0, 255)]

    def _canvas_label(self, label: Image.Image) -> Array:
        # raw ids -> trainIds for the u8 canvas (trainIds are 0..18 + 255)
        raw = np.asarray(label, dtype=np.int64)
        return self._lut[np.clip(raw, 0, 255)].astype(np.uint8)

    def _lut_sig(self) -> bytes:
        # cached canvases bake the id->trainId remap in; key on the LUT
        return np.ascontiguousarray(self._lut).tobytes()


# ---------------------------------------------------------------------------
# Registry (reference src/datasets/registry.py:13-50)
# ---------------------------------------------------------------------------

DATASET_REGISTRY: Dict[str, type] = {
    "cityscapes": CityScapes,
    "uavid": UAVid,
    "aeroscapes": AeroScapes,
    "vdd": VDD,
}


def _aerial_kwargs(cfg: Any, mode: str) -> Dict[str, Any]:
    d = cfg.dataset
    device_geom = bool(cfg.select("runtime.device_geometric", False))
    # device geometric implies device photometric: the device pipeline owns
    # normalization once crops are produced on-chip
    device_augs = device_geom or bool(cfg.select("runtime.device_augs", False))
    return {
        "geometric": "device" if (device_geom and mode == "train") else "host",
        "ignore_lb": d.ignore_idx,
        "rootpth": d.dataset_path,
        "cropsize": list(d.cropsize),
        "mode": mode,
        "augmentation": d.get("augmentation").to_dict()
        if d.get("augmentation") is not None else None,
        "seed": d.get("seed", 15),
        "photometric": "device" if (device_augs and mode == "train") else "host",
        "decoder": str(cfg.select("runtime.decoder", "pil")),
        "reduced_decode": bool(cfg.select("runtime.reduced_decode", False))
        and mode == "train",
        "decode_cache": cfg.select("runtime.decode_cache", None) or None,
    }


def _cityscapes_kwargs(cfg: Any, mode: str) -> Dict[str, Any]:
    d = cfg.dataset
    device_geom = bool(cfg.select("runtime.device_geometric", False))
    device_augs = device_geom or bool(cfg.select("runtime.device_augs", False))
    return {
        "ignore_lb": d.ignore_idx,
        "rootpth": d.dataset_path,
        "cropsize": list(d.cropsize),
        "mode": mode,
        "config_file": d.get("config_file"),
        "seed": d.get("seed", 15),
        "geometric": "device" if (device_geom and mode == "train") else "host",
        "photometric": "device" if (device_augs and mode == "train") else "host",
        "decoder": str(cfg.select("runtime.decoder", "pil")),
        "reduced_decode": bool(cfg.select("runtime.reduced_decode", False))
        and mode == "train",
        "decode_cache": cfg.select("runtime.decode_cache", None) or None,
    }


DATASET_KWARGS_BUILDERS = {
    "cityscapes": _cityscapes_kwargs,
    "uavid": _aerial_kwargs,
    "aeroscapes": _aerial_kwargs,
    "vdd": _aerial_kwargs,
}
