"""Inference / showcase CLI (reference src/scripts/infer_yolo.py:86-374,
re-targeted at CABiNet checkpoints — the reference shells out to the external
ultralytics package; here the in-repo model serves the same role).

Routes by path type/extension:
  - image (.png/.jpg/...): writes <stem>_mask.png + <stem>_overlay.png
  - folder: every image inside
  - video (.mp4/.avi/...): writes <stem>_mask.mp4 + <stem>_overlay.mp4,
    streaming batch-1 at a fixed jitted resolution (low-latency path) or
    chunked frames with --batch N (throughput path; N >= 8 engages the
    fused Pallas early stage, 1.41x at batch 16 on v5e)

Usage:
    python -m cabinet_tpu.cli.infer --checkpoint ck --dataset uavid \
        --source img.png [--out-dir out] [--alpha 0.5] [--imgsz 1024]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv"}


class Segmenter:
    """Fixed-resolution jitted CABiNet inference engine.

    batch=1 is the low-latency streaming path; batch>=8 (video/folder
    throughput) also engages the fused Pallas early-stage kernel where
    supported — measured 1.41x over the XLA path at batch 16 on v5e
    (ops/early_stage.py STATUS)."""

    def __init__(self, checkpoint: str, dataset: str, mode: str = "large",
                 imgsz: int = 1024, dtype_name: str = "bfloat16",
                 batch: int = 1, pallas_attn: bool = True):
        import jax
        import jax.numpy as jnp

        from cabinet_tpu.data.datasets import DATASET_REGISTRY
        from cabinet_tpu.models import CABiNet
        from cabinet_tpu.train.checkpoint import load_any_checkpoint

        ds_cls = DATASET_REGISTRY[dataset]
        self.n_classes = ds_cls.NUM_CLASSES
        self.mean = np.asarray(ds_cls.MEAN, np.float32)
        self.std = np.asarray(ds_cls.STD, np.float32)
        self.imgsz = imgsz
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]

        # use_pallas: fused CAB attention kernel (+2.8% at batch 128,
        # NOTES.md) — inference-only CLI; the op falls back to the identical
        # einsum path off-TPU and past its VMEM budget (ops/attention.py).
        # --no-pallas-attn opts out entirely.
        self.model = CABiNet(n_classes=self.n_classes, mode=mode, dtype=dtype,
                             use_pallas=pallas_attn)
        init_x = jnp.zeros((1, imgsz, imgsz, 3), dtype)
        template = jax.jit(lambda: self.model.init(jax.random.PRNGKey(0),
                                                   init_x, train=False))()
        loaded = load_any_checkpoint(checkpoint, template)
        self.variables = {"params": loaded["params"],
                          "batch_stats": loaded.get("batch_stats", {})}

        self.batch = max(1, int(batch))
        fused_fwd = None
        if mode == "large" and jax.default_backend() == "tpu":
            from cabinet_tpu.models.fused import (
                fused_early_supported,
                make_fused_tail_apply,
            )
            from cabinet_tpu.ops.decoder_tail import fused_tail_supported

            s8 = imgsz // 8
            # Fused decoder tail: wins at every batch size (+7.3%).
            # Fused early stage: only pays at batch >= 8 (NOTES.md sweep).
            if (fused_tail_supported(s8, s8, self.n_classes)
                    and dtype == jnp.bfloat16):
                use_early = (self.batch >= 8
                             and fused_early_supported((1, imgsz, imgsz, 3)))
                fused_fwd = make_fused_tail_apply(
                    self.model, self.variables, interpret=False,
                    use_early=use_early)
            elif (self.batch >= 8
                  and fused_early_supported((1, imgsz, imgsz, 3))):
                from cabinet_tpu.models.fused import make_fused_apply

                fused_fwd = make_fused_apply(self.model, self.variables,
                                             interpret=False)

        @jax.jit
        def _forward(v, x):
            if fused_fwd is not None:
                logits, _ = fused_fwd(x)
            else:
                logits, _ = self.model.apply(v, x, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._forward = _forward
        self._jnp = jnp

    def _preprocess(self, rgb: np.ndarray) -> np.ndarray:
        im = Image.fromarray(rgb).resize((self.imgsz, self.imgsz),
                                         Image.BILINEAR)
        return (np.asarray(im, np.float32) / 255.0 - self.mean) / self.std

    @staticmethod
    def _postprocess(pred: np.ndarray, hw) -> np.ndarray:
        if tuple(hw) != pred.shape:
            pred = np.asarray(Image.fromarray(pred.astype(np.uint8)).resize(
                (hw[1], hw[0]), Image.NEAREST))
        return pred

    def predict(self, rgb: np.ndarray) -> np.ndarray:
        """RGB uint8 (H,W,3) -> class-ID mask (H,W). Resizes through the
        fixed jitted resolution and back (one program for any input size)."""
        x = self._preprocess(rgb)
        pred = np.asarray(self._forward(self.variables,
                                        self._jnp.asarray(x[None])))[0]
        return self._postprocess(pred, rgb.shape[:2])

    def predict_batch(self, rgbs) -> list:
        """List of RGB uint8 frames -> list of class-ID masks. Frames are
        padded up to the engine batch (ONE compiled program regardless of
        chunk size); the fused early stage engages when batch >= 8."""
        xs = np.stack([self._preprocess(r) for r in rgbs])
        n = len(rgbs)
        if n < self.batch:
            xs = np.pad(xs, ((0, self.batch - n), (0, 0), (0, 0), (0, 0)))
        preds = np.asarray(self._forward(self.variables,
                                         self._jnp.asarray(xs)))
        return [self._postprocess(preds[i], rgbs[i].shape[:2])
                for i in range(n)]


def _overlay(rgb: np.ndarray, mask_rgb: np.ndarray, alpha: float) -> np.ndarray:
    return ((1 - alpha) * rgb + alpha * mask_rgb).astype(np.uint8)


def infer_image(seg: Segmenter, classes, path: Path, out_dir: Path,
                alpha: float) -> None:
    from cabinet_tpu.data.palettes import colorize_mask

    rgb = np.asarray(Image.open(path).convert("RGB"))
    pred = seg.predict(rgb)
    mask_rgb = colorize_mask(pred, classes)
    out_dir.mkdir(parents=True, exist_ok=True)
    Image.fromarray(mask_rgb).save(out_dir / f"{path.stem}_mask.png")
    Image.fromarray(_overlay(rgb, mask_rgb, alpha)).save(
        out_dir / f"{path.stem}_overlay.png")


def infer_video(seg: Segmenter, classes, path: Path, out_dir: Path,
                alpha: float) -> None:
    import cv2

    from cabinet_tpu.data.palettes import colorize_mask

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out_dir.mkdir(parents=True, exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    mask_w = cv2.VideoWriter(str(out_dir / f"{path.stem}_mask.mp4"), fourcc,
                             fps, (w, h))
    over_w = cv2.VideoWriter(str(out_dir / f"{path.stem}_overlay.mp4"), fourcc,
                             fps, (w, h))
    n = 0

    def flush(chunk):
        nonlocal n
        if not chunk:
            return
        preds = (seg.predict_batch(chunk) if seg.batch > 1
                 else [seg.predict(chunk[0])])
        for rgb, pred in zip(chunk, preds):
            mask_rgb = colorize_mask(pred, classes)
            mask_w.write(cv2.cvtColor(mask_rgb, cv2.COLOR_RGB2BGR))
            over_w.write(cv2.cvtColor(_overlay(rgb, mask_rgb, alpha),
                                      cv2.COLOR_RGB2BGR))
            n += 1

    chunk = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        chunk.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if len(chunk) == seg.batch:
            flush(chunk)
            chunk = []
    flush(chunk)
    cap.release()
    mask_w.release()
    over_w.release()
    print(f"[INFO] {path.name}: {n} frames")


def infer_showcase(seg: Segmenter, classes, paths, out_dir: Path,
                   alpha: float, tile_size: Tuple[int, int] = (640, 360)
                   ) -> None:
    """2x2 showcase mosaic of up to 4 clips with a per-clip temporal
    raw -> mask reveal ramp (reference infer_yolo.py:288-374): each tile
    starts as raw footage and blends toward the segmentation overlay over
    the clip, with staggered ramp offsets so tiles reveal one by one."""
    import cv2

    from cabinet_tpu.data.palettes import colorize_mask

    paths = list(paths)[:4]
    caps = [cv2.VideoCapture(str(p)) for p in paths]
    if not caps or not all(c.isOpened() for c in caps):
        raise FileNotFoundError(f"Cannot open showcase clips: {paths}")
    fps = caps[0].get(cv2.CAP_PROP_FPS) or 25
    n_frames = min(int(c.get(cv2.CAP_PROP_FRAME_COUNT)) or 1 for c in caps)
    tw, th = tile_size

    out_dir.mkdir(parents=True, exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(str(out_dir / "showcase.mp4"), fourcc, fps,
                             (2 * tw, 2 * th))
    for f in range(n_frames):
        mosaic = np.zeros((2 * th, 2 * tw, 3), np.uint8)
        for i, cap in enumerate(caps):
            ok, frame = cap.read()
            if not ok:
                continue
            rgb = cv2.cvtColor(cv2.resize(frame, (tw, th)), cv2.COLOR_BGR2RGB)
            pred = seg.predict(rgb)
            mask_rgb = colorize_mask(pred, classes)
            # staggered ramp: tile i reveals over [i/4, (i+1)/4 + 1/4] of the clip
            t = f / max(n_frames - 1, 1)
            ramp = np.clip((t - i * 0.2) / 0.4, 0.0, 1.0)
            blended = ((1 - ramp * alpha) * rgb + ramp * alpha * mask_rgb
                       ).astype(np.uint8)
            r, c = divmod(i, 2)
            mosaic[r * th:(r + 1) * th, c * tw:(c + 1) * tw] = blended
        writer.write(cv2.cvtColor(mosaic, cv2.COLOR_RGB2BGR))
    for c in caps:
        c.release()
    writer.release()
    print(f"[INFO] showcase: {n_frames} frames, {len(caps)} clips")


def main(argv: Optional[Sequence[str]] = None) -> None:
    from cabinet_tpu.data.palettes import PALETTES

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dataset", required=True, choices=sorted(PALETTES))
    p.add_argument("--source", required=True, type=Path)
    p.add_argument("--mode", default="large", choices=["large", "small"])
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--out-dir", type=Path, default=Path("inference_out"))
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--batch", type=int, default=1,
                   help="frames per forward for video/folder throughput; "
                        ">=8 engages the fused Pallas early stage (1.41x)")
    p.add_argument("--showcase", action="store_true",
                   help="build a 2x2 mosaic showcase video from the first 4 "
                        "clips in --source (a directory of videos)")
    p.add_argument("--no-pallas-attn", action="store_true",
                   help="disable the fused Pallas CAB attention kernel "
                        "(serves the XLA einsum path instead)")
    args = p.parse_args(argv)

    classes = PALETTES[args.dataset]
    seg = Segmenter(args.checkpoint, args.dataset, args.mode, args.imgsz,
                    args.dtype, batch=args.batch,
                    pallas_attn=not args.no_pallas_attn)

    src = args.source
    if args.showcase:
        clips = ([f for f in sorted(src.iterdir())
                  if f.suffix.lower() in VIDEO_EXTS] if src.is_dir() else [src])
        infer_showcase(seg, classes, clips, args.out_dir, args.alpha)
    elif src.is_dir():
        for f in sorted(src.iterdir()):
            if f.suffix.lower() in IMAGE_EXTS:
                infer_image(seg, classes, f, args.out_dir, args.alpha)
    elif src.suffix.lower() in IMAGE_EXTS:
        infer_image(seg, classes, src, args.out_dir, args.alpha)
    elif src.suffix.lower() in VIDEO_EXTS:
        infer_video(seg, classes, src, args.out_dir, args.alpha)
    else:
        raise ValueError(f"Unsupported source: {src}")
    print(f"[DONE] Output: {args.out_dir}")


if __name__ == "__main__":
    main()
