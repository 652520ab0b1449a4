"""Minimal HTTP inference server over an exported artifact or a checkpoint.

The reference's serving story stops at a Python API; this closes the loop
for deployment: load either a `cli.export` artifact (preferred — weights,
normalization, and argmax already fused into one program) or a raw
checkpoint (falls back to cli.infer's Segmenter), and serve masks over
plain HTTP with zero dependencies beyond the standard library.

Endpoints:
  GET  /healthz            -> JSON {"status": "ok", ...artifact metadata}
  GET  /metrics            -> JSON serving stats (req/s inputs, p50/p99
                              latency ms, mean batch size, queue depth)
  POST /segment            -> body: PNG/JPEG bytes
       ?format=mask_png    -> grayscale class-ID PNG (default)
       ?format=color_png   -> palette-colorized PNG (artifact palette or
                              dataset palette)
       response headers: X-Classes, X-Infer-Millis

Concurrent requests are DYNAMICALLY MICRO-BATCHED: one worker thread owns
the device, coalescing whatever requests arrive within --batch-deadline-ms
(up to --max-batch) into one padded power-of-two-regime forward — the same
batch-regime kernel composition cli.infer uses, so a loaded server rides
the chip's batched throughput (1130 img/s at batch 128 on v5e) instead of
serializing batch-1 programs. Preprocessing (decode/resize) runs on the
HTTP threads and overlaps freely; a bounded queue gives backpressure (503)
instead of unbounded memory growth.

Usage:
    python -m cabinet_tpu.cli.serve --artifact artifacts/uavid_large
    python -m cabinet_tpu.cli.serve --checkpoint ck --dataset uavid
"""

from __future__ import annotations

import argparse
import collections
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np
from PIL import Image

# request-body ceiling: a lossless 8K PNG is ~100 MB; anything larger is
# not a plausible single image for a segmentation request
MAX_BODY_BYTES = 128 << 20


class ServerBusy(RuntimeError):
    """Bounded request queue stayed full past the submit timeout."""


class _Item:
    __slots__ = ("x", "event", "result", "error")

    def __init__(self, x):
        self.x = x
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class _MicroBatcher:
    """Dynamic micro-batching: one worker thread owns the accelerator.

    submit() enqueues a preprocessed input and blocks until its result is
    ready. The worker coalesces requests that arrive within `deadline_ms`
    of the first one (up to `max_batch`) and runs ONE forward at the next
    power-of-two regime (bounds XLA specializations to log2(max_batch)+1
    programs). infer_batch(xs, regime) receives only the real rows and is
    responsible for padding to the regime ON DEVICE and returning exactly
    xs.shape[0] results — padding on the host would double H2D/D2H bytes.
    A solo request under no load pays at most the deadline in extra
    latency; under load the deadline never waits — the queue is already
    non-empty when a batch completes.
    """

    def __init__(self,
                 infer_batch: Callable[[np.ndarray, int], np.ndarray],
                 max_batch: int = 8, deadline_ms: float = 3.0,
                 queue_depth: int = 64, submit_timeout_s: float = 30.0):
        self.infer_batch = infer_batch
        self.max_batch = max(1, int(max_batch))
        self.deadline_s = max(0.0, float(deadline_ms)) / 1e3
        self.submit_timeout_s = float(submit_timeout_s)
        self._q: "queue.Queue[Optional[_Item]]" = queue.Queue(
            maxsize=max(1, int(queue_depth)))
        self._closing = threading.Event()
        self._stats_lock = threading.Lock()
        self._lat_ms: collections.deque = collections.deque(maxlen=4096)
        self.n_requests = 0
        self.n_errors = 0
        self.n_batches = 0
        self.n_coalesced_inputs = 0
        self._started = time.perf_counter()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serve-microbatch")
        self._thread.start()

    def submit(self, x: np.ndarray) -> np.ndarray:
        if self._closing.is_set():
            raise ServerBusy("server is shutting down")
        item = _Item(x)
        t0 = time.perf_counter()
        try:
            self._q.put(item, timeout=self.submit_timeout_s)
        except queue.Full:
            raise ServerBusy(
                f"request queue full ({self._q.maxsize}) for "
                f"{self.submit_timeout_s:.0f}s") from None
        # Bounded wait: a put() can land AFTER close() drained the queue
        # (producer blocked on a full queue wins the race against the
        # drain) — once the worker thread is dead nobody will ever set
        # that item's event, so detect it instead of hanging forever.
        while not item.event.wait(timeout=0.5):
            if self._closing.is_set() and not self._thread.is_alive():
                self._drain("server closed")  # release any same-race peers
                if item.event.is_set():
                    break
                raise ServerBusy("server closed")
        if item.error is not None:
            # errored requests are NOT served throughput: count them
            # separately and keep their latencies out of the percentiles
            with self._stats_lock:
                self.n_errors += 1
            raise item.error
        lat_ms = (time.perf_counter() - t0) * 1e3
        with self._stats_lock:
            self._lat_ms.append(lat_ms)
            self.n_requests += 1
        return item.result

    def close(self) -> None:
        """Signal shutdown and release every waiter. The flag (not a
        blocking sentinel put) is the shutdown channel: a blocking put on
        the bounded queue could deadlock against producers that keep it
        full while the worker (the only consumer) is the one blocked."""
        self._closing.set()
        try:
            self._q.put_nowait(None)  # wake a worker idle on q.get()
        except queue.Full:
            pass  # worker is busy; it checks the flag between batches
        self._thread.join(timeout=5)
        self._drain("server closed")

    def _drain(self, reason: str) -> None:
        """Error out anything still queued so no submit() waits forever."""
        while True:
            try:
                it = self._q.get_nowait()
            except queue.Empty:
                return
            if it is not None:
                it.error = ServerBusy(reason)
                it.event.set()

    def reset_stats(self) -> None:
        """Zero counters/latencies (bench warmup exclusion)."""
        with self._stats_lock:
            self._lat_ms.clear()
            self.n_requests = self.n_batches = self.n_coalesced_inputs = 0
            self.n_errors = 0
            self._started = time.perf_counter()

    def stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._lat_ms)
            n_req, n_b = self.n_requests, self.n_batches
            n_co = self.n_coalesced_inputs

        def pct(p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))], 2) \
                if lat else None

        elapsed = time.perf_counter() - self._started
        return {
            "requests": n_req,
            "errors": self.n_errors,
            "batches": n_b,
            "mean_batch_size": round(n_co / n_b, 3) if n_b else None,
            "max_batch": self.max_batch,
            "deadline_ms": self.deadline_s * 1e3,
            "queue_depth": self._q.qsize(),
            "latency_ms_p50": pct(0.50),
            "latency_ms_p99": pct(0.99),
            "requests_per_s": round(n_req / elapsed, 2) if elapsed else None,
        }

    def _loop(self) -> None:
        while not self._closing.is_set():
            try:  # bounded get so the flag is re-checked while idle
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            if first is None:
                break
            items = [first]
            deadline = time.perf_counter() + self.deadline_s
            while len(items) < self.max_batch:
                remaining = deadline - time.perf_counter()
                try:
                    nxt = (self._q.get_nowait() if remaining <= 0
                           else self._q.get(timeout=remaining))
                except queue.Empty:
                    break
                if nxt is None:  # close() raced a live batch: finish it
                    break
                items.append(nxt)
            n = len(items)
            regime = min(1 << (n - 1).bit_length(), self.max_batch)
            # H2D is per-byte: ship only the n REAL rows and let infer_batch
            # pad to the regime on DEVICE (and fetch only n rows back) —
            # host-side np.pad would transfer and fetch up to 2x dead rows
            xs = np.stack([it.x for it in items])
            try:
                preds = self.infer_batch(xs, regime)
                for i, it in enumerate(items):
                    it.result = np.asarray(preds[i]).astype(np.uint8)
            except BaseException as e:  # propagate to every waiter
                for it in items:
                    it.error = e
            with self._stats_lock:
                self.n_batches += 1
                self.n_coalesced_inputs += n
            for it in items:
                it.event.set()
        self._drain("server closed")


def _pad_to_regime(forward):
    """Micro-batcher contract shared by both engine paths: pad the real
    rows to the regime ON DEVICE (host-side padding would ship dead rows
    H2D) and slice back BEFORE the fetch (padded rows never cross D2H)."""
    import jax.numpy as jnp

    def infer_batch(xs: np.ndarray, regime: int) -> np.ndarray:
        x = jnp.asarray(xs)
        if regime > xs.shape[0]:
            x = jnp.concatenate(
                [x, jnp.zeros((regime - xs.shape[0],) + xs.shape[1:],
                              x.dtype)])
        return np.asarray(forward(x)[:xs.shape[0]])

    return infer_batch


class _Engine:
    """predict(rgb uint8 HxWx3) -> mask (imgsz, imgsz) uint8."""

    def __init__(self, artifact: Optional[str], checkpoint: Optional[str],
                 dataset: Optional[str], mode: str, imgsz: int,
                 dtype: str, max_batch: int = 8, deadline_ms: float = 3.0,
                 queue_depth: int = 64, submit_timeout_s: float = 30.0):
        self.palette = None
        if artifact:
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
            if batch.isdigit():
                if int(batch) != 1:
                    # fixed-batch artifacts other than 1 would reject every
                    # single-image request — fail at startup, not per request
                    raise SystemExit(
                        f"artifact was exported with fixed batch {batch}; "
                        "serve needs batch 1 (solo) or a symbolic batch "
                        "(--batch b at export) for micro-batching")
                # a fixed batch-1 program cannot coalesce
                max_batch = 1
            if meta.get("palette"):
                self.palette = np.asarray(meta["palette"], np.uint8)

            def preprocess(rgb: np.ndarray) -> np.ndarray:
                im = Image.fromarray(rgb).resize((self.imgsz, self.imgsz),
                                                 Image.BILINEAR)
                return np.asarray(im, np.uint8)

            infer_batch = _pad_to_regime(serve)

        else:
            from cabinet_tpu.cli.infer import Segmenter
            from cabinet_tpu.data.palettes import PALETTES, trainid_palette

            # batch=max_batch picks the batched kernel composition (fused
            # early stage engages at >= 8); jit re-specializes per regime
            seg = Segmenter(checkpoint, dataset, mode=mode, imgsz=imgsz,
                            dtype_name=dtype, batch=max_batch)
            self.meta = {"dataset": dataset, "imgsz": imgsz,
                         "n_classes": seg.n_classes}
            self.imgsz = imgsz
            if dataset in PALETTES:
                self.palette = trainid_palette(PALETTES[dataset])

            def preprocess(rgb: np.ndarray) -> np.ndarray:
                return seg._preprocess(rgb)

            infer_batch = _pad_to_regime(
                lambda x: seg._forward(seg.variables, x))

        self._preprocess = preprocess
        self.batcher = _MicroBatcher(infer_batch, max_batch=max_batch,
                                     deadline_ms=deadline_ms,
                                     queue_depth=queue_depth,
                                     submit_timeout_s=submit_timeout_s)

    def predict(self, rgb: np.ndarray) -> np.ndarray:
        # preprocessing runs on the HTTP thread — concurrent requests'
        # decode/resize overlaps; only the forward is single-flight
        return self.batcher.submit(self._preprocess(rgb))

    def stats(self) -> dict:
        return self.batcher.stats()


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
            path = self.path.split("?")[0]
            if path == "/healthz":
                self._json(200, {"status": "ok", **{
                    k: v for k, v in engine.meta.items()
                    if isinstance(v, (str, int, float, type(None)))}})
            elif path == "/metrics":
                self._json(200, engine.stats())
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
            try:
                mask = engine.predict(rgb)
            except ServerBusy as e:
                return self._json(503, {"error": str(e)})
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
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batching ceiling (1 disables coalescing)")
    p.add_argument("--batch-deadline-ms", type=float, default=3.0,
                   help="how long the first queued request waits for "
                        "company before the forward launches")
    p.add_argument("--queue-depth", type=int, default=64,
                   help="bounded request queue; once full, submits wait up "
                        "to --submit-timeout-s before the 503")
    p.add_argument("--submit-timeout-s", type=float, default=30.0,
                   help="how long a request may wait on a full queue before "
                        "503 backpressure (lower = shed load sooner)")
    args = p.parse_args(argv)
    if args.checkpoint and not args.dataset:
        raise SystemExit("--checkpoint requires --dataset")

    engine = _Engine(args.artifact, args.checkpoint, args.dataset,
                     args.mode, args.imgsz, args.dtype,
                     max_batch=args.max_batch,
                     deadline_ms=args.batch_deadline_ms,
                     queue_depth=args.queue_depth,
                     submit_timeout_s=args.submit_timeout_s)
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
