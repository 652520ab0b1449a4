"""HTTP inference server (cli/serve.py) over an exported artifact."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cabinet_tpu.export import export_serving, save_artifact
from cabinet_tpu.models import CABiNet

IMGSZ = 64
CFGS = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
        [5, 6, 96, 1, 1, 2]]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    model = CABiNet(n_classes=4, mode="small", cfgs=CFGS, dtype=jnp.float32)
    x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    exported = export_serving(model, variables, mean=(0.5,) * 3,
                              std=(0.25,) * 3, imgsz=IMGSZ, batch=1)
    art = save_artifact(exported, tmp_path_factory.mktemp("art"), {
        "dataset": "test", "imgsz": IMGSZ, "n_classes": 4,
        "palette": [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
    })

    from cabinet_tpu.cli.serve import _Engine, make_server

    engine = _Engine(str(art), None, None, "small", IMGSZ, "float32")
    srv = make_server(engine, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["status"] == "ok" and meta["dataset"] == "test"


def test_metadataless_artifact_fails_at_startup(tmp_path):
    """A bare artifact file with no metadata.json anywhere must fail at
    startup with a clear message — not accept requests and die per-request
    on a shape mismatch against the CLI-default imgsz."""
    import shutil

    import pytest

    from cabinet_tpu.cli.serve import _Engine
    from cabinet_tpu.export import ARTIFACT_NAME, METADATA_NAME

    # reuse the artifact the module fixture wrote: copy the .stablehlo out
    # alone (the 'moved away from its export directory' scenario)
    src = None
    for p in tmp_path.parent.rglob(ARTIFACT_NAME):
        if (p.parent / METADATA_NAME).exists():
            src = p
            break
    if src is None:
        pytest.skip("no artifact from the module fixture to copy")
    bare = tmp_path / ARTIFACT_NAME
    shutil.copy(src, bare)
    with pytest.raises(SystemExit, match="metadata.json"):
        _Engine(str(bare), None, None, "small", 64, "float32")


def _post_png(url, rgb):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST",
                                 headers={"Content-Type": "image/png"})
    return urllib.request.urlopen(req, timeout=120)


def test_segment_mask(server):
    rng = np.random.default_rng(0)
    rgb = (rng.random((80, 120, 3)) * 255).astype(np.uint8)
    with _post_png(f"{server}/segment", rgb) as r:
        assert r.headers["Content-Type"] == "image/png"
        n_classes = int(r.headers["X-Classes"])
        mask = np.asarray(Image.open(io.BytesIO(r.read())))
    # mask comes back at the INPUT resolution with valid class IDs
    assert mask.shape == (80, 120)
    assert 1 <= n_classes <= 4 and mask.max() < 4


def test_segment_color(server):
    rng = np.random.default_rng(1)
    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    with _post_png(f"{server}/segment?format=color_png", rgb) as r:
        img = np.asarray(Image.open(io.BytesIO(r.read())))
    assert img.shape == (64, 64, 3)


def test_bad_body_is_400(server):
    req = urllib.request.Request(f"{server}/segment", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_oversized_body_rejected_413(server):
    """A client-declared Content-Length past MAX_BODY_BYTES must be
    rejected up front (413) — not buffered whole into host RAM."""
    import urllib.error

    from cabinet_tpu.cli.serve import MAX_BODY_BYTES

    req = urllib.request.Request(
        f"{server}/segment", data=b"x",
        headers={"Content-Length": str(MAX_BODY_BYTES + 1)},
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 413


# ---------------------------------------------------------------------------
# Dynamic micro-batching
# ---------------------------------------------------------------------------

def test_microbatcher_coalesces_and_routes():
    """Direct _MicroBatcher contract: concurrent submits coalesce into one
    padded power-of-two-regime forward; each result routes to its own
    waiter;
    errors propagate to every member of the failed batch."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from cabinet_tpu.cli.serve import _MicroBatcher

    seen_batches = []

    def infer(xs, regime):
        seen_batches.append((xs.shape[0], regime))
        _time.sleep(0.02)  # let the queue fill while a batch runs
        return xs[:, 0, 0] + 1  # distinct per input -> routing check

    mb = _MicroBatcher(infer, max_batch=4, deadline_ms=50, queue_depth=16)
    try:
        with ThreadPoolExecutor(8) as pool:
            futs = [pool.submit(mb.submit,
                                np.full((2, 2), i, np.uint8)) for i in range(8)]
            results = [f.result(timeout=30) for f in futs]
        for i, r in enumerate(results):
            assert int(r) == i + 1  # each waiter got ITS result
        st = mb.stats()
        assert st["requests"] == 8
        assert st["batches"] < 8, "no coalescing happened"
        assert st["mean_batch_size"] > 1
        for n, regime in seen_batches:
            assert regime in (1, 2, 4)  # pow2 regimes, capped at max_batch
            # only REAL rows cross the host->device boundary
            assert n <= regime

        def boom(xs, regime):
            raise RuntimeError("kaboom")

        mb2 = _MicroBatcher(boom, max_batch=2, deadline_ms=5)
        with pytest.raises(RuntimeError, match="kaboom"):
            mb2.submit(np.zeros((2, 2), np.uint8))
        # errored requests stay out of the served-throughput stats
        assert mb2.stats()["requests"] == 0
        assert mb2.stats()["errors"] == 1
        mb2.close()
    finally:
        mb.close()


def test_microbatcher_close_under_load_releases_all_waiters():
    """close() while producers keep a TINY queue full must terminate within
    the join timeout and release every waiter (result or ServerBusy) — the
    old blocking sentinel re-put could deadlock the worker against
    producers on a full queue."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from cabinet_tpu.cli.serve import ServerBusy, _MicroBatcher

    def slow_infer(xs, regime):
        _time.sleep(0.05)  # keep the queue saturated
        return xs[:, 0, 0]

    mb = _MicroBatcher(slow_infer, max_batch=2, deadline_ms=1,
                       queue_depth=2, submit_timeout_s=2.0)

    def one(i):
        try:
            return ("ok", mb.submit(np.full((2, 2), i, np.uint8)))
        except ServerBusy as e:
            return ("busy", str(e))

    with ThreadPoolExecutor(12) as pool:
        futs = [pool.submit(one, i) for i in range(24)]
        _time.sleep(0.1)  # mid-flight, queue full
        t0 = _time.perf_counter()
        mb.close()
        close_s = _time.perf_counter() - t0
        outcomes = [f.result(timeout=10) for f in futs]  # nobody hangs
    assert close_s < 6.0, f"close() blocked {close_s:.1f}s"
    assert all(kind in ("ok", "busy") for kind, _ in outcomes)
    assert any(kind == "ok" for kind, _ in outcomes)


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory):
    """Server over a SYMBOLIC-batch artifact with micro-batching enabled."""
    model = CABiNet(n_classes=4, mode="small", cfgs=CFGS, dtype=jnp.float32)
    x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    exported = export_serving(model, variables, mean=(0.5,) * 3,
                              std=(0.25,) * 3, imgsz=IMGSZ, batch="b")
    art = save_artifact(exported, tmp_path_factory.mktemp("art_b"), {
        "dataset": "test", "imgsz": IMGSZ, "n_classes": 4, "batch": "b",
    })

    from cabinet_tpu.cli.serve import _Engine, make_server

    engine = _Engine(str(art), None, None, "small", IMGSZ, "float32",
                     max_batch=4, deadline_ms=50.0, queue_depth=32)
    srv = make_server(engine, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", engine
    srv.shutdown()
    engine.batcher.close()


def test_concurrent_clients_microbatch(batched_server):
    """N concurrent clients all get correct responses, the server coalesces
    them into fewer device batches, and /metrics reports the batching."""
    from concurrent.futures import ThreadPoolExecutor

    url, _ = batched_server
    rng = np.random.default_rng(7)
    rgb = (rng.random((48, 72, 3)) * 255).astype(np.uint8)

    # single-flight reference answer first (its own batch)
    with _post_png(f"{url}/segment", rgb) as r:
        ref = np.asarray(Image.open(io.BytesIO(r.read())))

    def one(_):
        with _post_png(f"{url}/segment", rgb) as r:
            return np.asarray(Image.open(io.BytesIO(r.read())))

    with ThreadPoolExecutor(8) as pool:
        masks = list(pool.map(one, range(12)))
    for m in masks:
        np.testing.assert_array_equal(m, ref)  # batching never changes math

    with urllib.request.urlopen(f"{url}/metrics", timeout=30) as r:
        st = json.loads(r.read())
    assert st["requests"] >= 13
    assert st["batches"] < st["requests"], "no coalescing under load"
    assert st["mean_batch_size"] > 1
    assert st["latency_ms_p50"] is not None and st["latency_ms_p99"] is not None
