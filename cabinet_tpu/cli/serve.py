"""Minimal HTTP inference server over an exported artifact or a checkpoint.

The reference's serving story stops at a Python API; this closes the loop
for deployment: load either a `cli.export` artifact (preferred — weights,
normalization, and argmax already fused into one program) or a raw
checkpoint (falls back to cli.infer's Segmenter), and serve masks over
plain HTTP with zero dependencies beyond the standard library.

Endpoints:
  GET  /healthz            -> JSON {"status": "ok", ...artifact metadata}
  POST /segment            -> body: PNG/JPEG bytes
       ?format=mask_png    -> grayscale class-ID PNG (default)
       ?format=color_png   -> palette-colorized PNG (artifact palette or
                              dataset palette)
       response headers: X-Classes, X-Infer-Millis

Device calls are serialized with a lock (one accelerator, one program);
the HTTP layer is threaded so health checks never queue behind inference.

Usage:
    python -m cabinet_tpu.cli.serve --artifact artifacts/uavid_large
    python -m cabinet_tpu.cli.serve --checkpoint ck --dataset uavid
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np
from PIL import Image

# request-body ceiling: a lossless 8K PNG is ~100 MB; anything larger is
# not a plausible single image for a segmentation request
MAX_BODY_BYTES = 128 << 20


class _Engine:
    """predict(rgb uint8 HxWx3) -> (mask HxW uint8, palette or None)."""

    def __init__(self, artifact: Optional[str], checkpoint: Optional[str],
                 dataset: Optional[str], mode: str, imgsz: int,
                 dtype: str):
        self._lock = threading.Lock()
        self.palette = None
        if artifact:
            import jax.numpy as jnp

            from cabinet_tpu.export import load_artifact

            serve, meta = load_artifact(artifact)
            if "imgsz" not in meta:
                # without metadata the CLI default imgsz would be applied to
                # an artifact exported at another size — every request would
                # then die on a cryptic shape mismatch. Fail at startup.
                raise SystemExit(
                    f"artifact {artifact} has no metadata.json (bare file "
                    "moved away from its export directory?) — serve needs "
                    "the exported imgsz/batch; point --artifact at the "
                    "cli.export output directory")
            self.meta = meta
            self.imgsz = int(meta["imgsz"])
            batch = str(meta.get("batch", "1"))
            if batch.isdigit() and int(batch) != 1:
                # fixed-batch artifacts other than 1 would reject every
                # single-image request — fail at startup, not per request
                raise SystemExit(
                    f"artifact was exported with fixed batch {batch}; serve "
                    "needs batch 1 (or a symbolic batch, e.g. --batch b)")
            if meta.get("palette"):
                self.palette = np.asarray(meta["palette"], np.uint8)

            def predict(rgb: np.ndarray) -> np.ndarray:
                # pure-CPU preprocessing stays OUTSIDE the accelerator lock
                # so concurrent requests' decode/resize work overlaps
                im = Image.fromarray(rgb).resize((self.imgsz, self.imgsz),
                                                 Image.BILINEAR)
                x = jnp.asarray(np.asarray(im, np.uint8)[None])
                with self._lock:  # one accelerator; serialize device calls
                    return np.asarray(serve(x))[0].astype(np.uint8)

            self._predict = predict
        else:
            from cabinet_tpu.cli.infer import Segmenter
            from cabinet_tpu.data.palettes import PALETTES, trainid_palette

            seg = Segmenter(checkpoint, dataset, mode=mode, imgsz=imgsz,
                            dtype_name=dtype)
            self.meta = {"dataset": dataset, "imgsz": imgsz,
                         "n_classes": seg.n_classes}
            self.imgsz = imgsz
            if dataset in PALETTES:
                self.palette = trainid_palette(PALETTES[dataset])

            def predict(rgb: np.ndarray) -> np.ndarray:
                # Segmenter.predict mixes host prep and the device call;
                # serialize it whole (one accelerator, one program)
                with self._lock:
                    return seg.predict(rgb).astype(np.uint8)

            self._predict = predict

    def predict(self, rgb: np.ndarray) -> np.ndarray:
        return self._predict(rgb)


def make_handler(engine: _Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] == "/healthz":
                self._json(200, {"status": "ok", **{
                    k: v for k, v in engine.meta.items()
                    if isinstance(v, (str, int, float, type(None)))}})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/segment":
                return self._json(404, {"error": "unknown path"})
            fmt = "mask_png"
            for part in query.split("&"):
                if part.startswith("format="):
                    fmt = part.split("=", 1)[1]
            # validate BEFORE spending serialized accelerator time
            if fmt not in ("mask_png", "color_png"):
                return self._json(400, {"error": f"unknown format {fmt}"})
            if fmt == "color_png" and engine.palette is None:
                return self._json(400, {
                    "error": "artifact/dataset has no palette; "
                             "use format=mask_png"})
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                return self._json(400, {"error": "bad Content-Length"})
            if n > MAX_BODY_BYTES:
                # the client-declared length is buffered whole before PIL
                # validation — cap it so one request can't exhaust host RAM
                return self._json(413, {
                    "error": f"body {n} bytes exceeds the "
                             f"{MAX_BODY_BYTES >> 20} MiB limit"})
            try:
                rgb = np.asarray(
                    Image.open(io.BytesIO(self.rfile.read(n))).convert("RGB"))
            except Exception as e:
                return self._json(400, {"error": f"bad image: {e}"})
            t0 = time.perf_counter()
            mask = engine.predict(rgb)
            ms = (time.perf_counter() - t0) * 1e3
            mask_native = np.asarray(
                Image.fromarray(mask).resize((rgb.shape[1], rgb.shape[0]),
                                             Image.NEAREST))
            if fmt == "color_png":
                out_img = Image.fromarray(engine.palette[mask_native])
            else:
                out_img = Image.fromarray(mask_native)
            buf = io.BytesIO()
            out_img.save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Classes",
                             str(int(mask_native.max()) + 1))
            self.send_header("X-Infer-Millis", f"{ms:.1f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def make_server(engine: _Engine, host: str = "127.0.0.1",
                port: int = 8651) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(engine))


def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", help="cli.export artifact directory")
    src.add_argument("--checkpoint", help="orbax dir or torch .pth")
    p.add_argument("--dataset", default=None,
                   help="dataset name (required with --checkpoint)")
    p.add_argument("--mode", default="large", choices=("large", "small"))
    p.add_argument("--imgsz", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8651)
    args = p.parse_args(argv)
    if args.checkpoint and not args.dataset:
        raise SystemExit("--checkpoint requires --dataset")

    engine = _Engine(args.artifact, args.checkpoint, args.dataset,
                     args.mode, args.imgsz, args.dtype)
    server = make_server(engine, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(meta: {engine.meta.get('dataset')}, {engine.imgsz}^2)",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
