"""One-time dataset converters to the shared images/+masks/ layout.

Capability parity with the reference's three converter scripts:

- UAVid (convert_uavid_to_yolo.py): RGB colour-coded Labels/ -> single-channel
  class-ID masks via a (256,256,256) LUT (unknown colours -> 255), sequence
  discovery (<split>/<seq>/{Images,Labels}), image symlinks (or copies) named
  {seq}_{stem}.png, process-pool fan-out, --dry-run.
- AeroScapes (convert_aeroscapes_to_yolo.py): split membership from
  ImageSets/{trn,val}.txt, masks already class IDs (validated to
  {0..11, 255}), files COPIED (redistributable), no test split.
- VDD (convert_vdd_to_yolo.py): stems common to <split>/src/*.JPG and
  <split>/gt/*.png, pixel validation {0..6, 255}, symlinks with .JPG->.jpg
  rename, train/val/test.
"""

from __future__ import annotations

import shutil
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np
from PIL import Image

from cabinet_tpu.core.constants import DEFAULT_IGNORE_LABEL

IGNORE_LABEL = DEFAULT_IGNORE_LABEL


# ---------------------------------------------------------------------------
# RGB -> class-ID LUT machinery (UAVid)
# ---------------------------------------------------------------------------


def build_colour_map(classes: Sequence[dict]) -> Dict[Tuple[int, int, int], int]:
    """RGB -> class ID; ignoreInEval colours map to IGNORE_LABEL, the rest get
    consecutive IDs ordered by trainId."""
    colour_map: Dict[Tuple[int, int, int], int] = {}
    kept = sorted((c for c in classes if not c["ignoreInEval"]),
                  key=lambda c: c["trainId"])
    for new_id, cls in enumerate(kept):
        colour_map[tuple(cls["color"])] = new_id
    for cls in classes:
        if cls["ignoreInEval"]:
            colour_map[tuple(cls["color"])] = IGNORE_LABEL
    return colour_map


def build_rgb_lut(colour_map: Dict[Tuple[int, int, int], int]) -> np.ndarray:
    """(256,256,256) uint8 LUT; unknown colours -> IGNORE_LABEL."""
    lut = np.full((256, 256, 256), IGNORE_LABEL, dtype=np.uint8)
    for (r, g, b), cid in colour_map.items():
        lut[r, g, b] = cid
    return lut


def convert_rgb_mask(src: Path, dst: Path, lut: np.ndarray,
                     dry_run: bool = False) -> str:
    arr = np.asarray(Image.open(src).convert("RGB"))
    from cabinet_tpu import native

    ids = native.lut_remap_rgb(arr, lut)
    if not dry_run:
        dst.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(ids, mode="L").save(dst)
    return src.name


def _rgb_worker(args: Tuple[Path, Path, np.ndarray, bool]) -> str:
    return convert_rgb_mask(*args)


def validate_id_mask(path: Path, num_classes: int) -> Tuple[bool, str]:
    """Every pixel must be a valid class ID or IGNORE_LABEL."""
    vals = np.unique(np.asarray(Image.open(path)))
    bad = [int(v) for v in vals if v >= num_classes and v != IGNORE_LABEL]
    if bad:
        return False, f"{path.name}: invalid pixel values {bad}"
    return True, ""


def _place(src: Path, dst: Path, copy: bool, dry_run: bool) -> None:
    if dry_run:
        return
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.exists() or dst.is_symlink():
        dst.unlink()
    if copy:
        shutil.copy2(src, dst)
    else:
        dst.symlink_to(src.resolve())


# ---------------------------------------------------------------------------
# UAVid
# ---------------------------------------------------------------------------


def discover_uavid_sequences(split_root: Path) -> List[str]:
    return sorted(d.name for d in split_root.iterdir()
                  if d.is_dir() and (d / "Images").exists())


def convert_uavid(src: Path, dst: Path, classes: Sequence[dict],
                  workers: int = 4, copy_images: bool = False,
                  dry_run: bool = False,
                  splits: Iterable[str] = ("train", "val", "test")) -> int:
    """Convert raw UAVid (<src>/<split>/<seq>/{Images,Labels}) to
    <dst>/{images,masks}/<split>/{seq}_{stem}.png. Returns masks written."""
    lut = build_rgb_lut(build_colour_map(classes))
    total = 0
    for split in splits:
        split_root = src / split
        if not split_root.exists():
            print(f"[WARN] Missing split directory, skipping: {split_root}")
            continue
        seqs = discover_uavid_sequences(split_root)
        if not seqs:
            print(f"[WARN] No sequences under {split_root}, skipping.")
            continue

        jobs = []
        for seq in seqs:
            for img in sorted((split_root / seq / "Images").glob("*.png")):
                label = split_root / seq / "Labels" / img.name
                if not label.exists():
                    print(f"[WARN] No Labels/ mask for {seq}/{img.name} — skipping")
                    continue
                mask_dst = dst / "masks" / split / f"{seq}_{img.stem}.png"
                img_dst = dst / "images" / split / f"{seq}_{img.stem}.png"
                _place(img, img_dst, copy_images, dry_run)
                jobs.append((label, mask_dst, lut, dry_run))

        if workers > 1 and not dry_run:
            with ProcessPoolExecutor(max_workers=workers) as pool:
                list(pool.map(_rgb_worker, jobs))
        else:
            for job in jobs:
                _rgb_worker(job)
        total += len(jobs)
        print(f"[INFO] {split}: {'would convert' if dry_run else 'converted'} "
              f"{len(jobs)} masks")
    return total


# ---------------------------------------------------------------------------
# AeroScapes
# ---------------------------------------------------------------------------

AEROSCAPES_SPLIT_FILES = {"train": "trn.txt", "val": "val.txt"}


def convert_aeroscapes(src: Path, dst: Path, num_classes: int = 12,
                       workers: int = 4, dry_run: bool = False) -> int:
    """Copy JPEGImages/SegmentationClass pairs into images/+masks/ by the
    ImageSets split lists; masks validated as class IDs. No test split."""
    total = 0
    for split, list_name in AEROSCAPES_SPLIT_FILES.items():
        list_path = src / "ImageSets" / list_name
        if not list_path.exists():
            print(f"[WARN] Missing split list, skipping: {list_path}")
            continue
        stems = sorted(s.strip() for s in list_path.read_text().splitlines()
                       if s.strip())
        n = 0
        for stem in stems:
            img = src / "JPEGImages" / f"{stem}.jpg"
            mask = src / "SegmentationClass" / f"{stem}.png"
            if not img.exists() or not mask.exists():
                print(f"[WARN] Missing pair for stem '{stem}' — skipping")
                continue
            ok, msg = validate_id_mask(mask, num_classes)
            if not ok:
                print(f"[WARN] {msg} — skipping")
                continue
            _place(img, dst / "images" / split / f"{stem}.jpg", copy=True,
                   dry_run=dry_run)
            _place(mask, dst / "masks" / split / f"{stem}.png", copy=True,
                   dry_run=dry_run)
            n += 1
        total += n
        print(f"[INFO] {split}: {'would copy' if dry_run else 'copied'} {n} pairs")
    return total


# ---------------------------------------------------------------------------
# VDD
# ---------------------------------------------------------------------------


def discover_vdd_stems(split_dir: Path) -> List[str]:
    src_dir, gt_dir = split_dir / "src", split_dir / "gt"
    if not src_dir.exists() or not gt_dir.exists():
        return []
    imgs = {p.stem: p for p in src_dir.iterdir() if p.suffix.lower() == ".jpg"}
    gts = {p.stem for p in gt_dir.iterdir() if p.suffix == ".png"}
    return sorted(set(imgs) & gts)


def convert_vdd(src: Path, dst: Path, num_classes: int = 7,
                dry_run: bool = False,
                splits: Iterable[str] = ("train", "val", "test")) -> int:
    """Symlink <split>/src/*.JPG (renamed .jpg) + <split>/gt/*.png into
    images/+masks/; masks validated as class IDs {0..6, 255}."""
    total = 0
    for split in splits:
        split_dir = src / split
        stems = discover_vdd_stems(split_dir)
        if not stems:
            print(f"[WARN] No pairs under {split_dir}, skipping.")
            continue
        n = 0
        for stem in stems:
            img = next(p for p in (split_dir / "src").iterdir()
                       if p.stem == stem and p.suffix.lower() == ".jpg")
            mask = split_dir / "gt" / f"{stem}.png"
            ok, msg = validate_id_mask(mask, num_classes)
            if not ok:
                print(f"[WARN] {msg} — skipping")
                continue
            _place(img, dst / "images" / split / f"{stem}.jpg", copy=False,
                   dry_run=dry_run)
            _place(mask, dst / "masks" / split / f"{stem}.png", copy=False,
                   dry_run=dry_run)
            n += 1
        total += n
        print(f"[INFO] {split}: {'would link' if dry_run else 'linked'} {n} pairs")
    return total
