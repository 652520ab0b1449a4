"""Benchmark: CABiNet-Large at 1024x1024 on one chip.

Default mode prints ONE JSON line (the driver contract):
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/500}

Extra modes (one JSON line each, for NOTES/regression tracking):
  python bench.py train [batch ...]   — jitted train step (dual OHEM + EMA +
                                        clipping), optionally with remat
  python bench.py train-remat [batch ...]
  python bench.py latency             — batch-1 serving latency (ms/frame,
                                        fused-tail path cli.infer ships)
  python bench.py serve [conc] [maxb] [imgsz]
                                      — live cli.serve HTTP req/s + p50/p99
                                        with dynamic micro-batching, vs the
                                        same server single-flight
  python bench.py aug [batch] [crop]  — on-device full-recipe augmentation
                                        ms/img (ops/geometric+photometric)
  python bench.py aug-shared [...]    — same, batch-shared-rotation warp
                                        (runtime.device_geometric=shared)
  python bench.py train-aug [batch]   — END-TO-END train step INCLUDING the
                                        on-device aug recipe from raw u8
                                        canvases (shared warp)
  python bench.py train-aug-exact     — same with the exact per-sample warp
  python bench.py eval4k-scan         — 4K eval through the scan+DUS engine
                                        (measured-retired A/B, NOTES r4)
  python bench.py yolo [n s m ...]    — YOLO-sem inference img/s by variant
  python bench.py yolo-train [...]    — YOLO-sem train-step img/s
  python bench.py eval4k              — full-protocol 4K eval s/img
  python bench.py eval4k-agree        — bf16 fast chain vs f32 chain argmax
                                        agreement at 4K (quality guard)
  python bench.py infer-int8          — int8 PTQ serving path (quant.py)
  python bench.py infer-fused-tail    — fused FFM+head decoder tail kernels
  python bench.py infer-xla           — force the pure-XLA inference path
  python bench.py infer-fused         — force the fused Pallas early stage
  python bench.py infer-small         — CABiNet-Small on the serving path

Baseline: the BASELINE.json north star of >=500 img/s/chip on TPU v5e (the
reference publishes no latency numbers at all — SURVEY §6).

Measurement: under the remote-tunnel runtime, block_until_ready returns
before device execution finishes and D2H rides a slow relay, so wall-clock
loops mis-measure. Instead we time a DEPENDENT on-device chain of K forwards
(each iteration consumes the previous output) ending in a scalar fetch, and
difference out the fixed overhead: per_step = (t(K) - t(1)) / (K - 1).
"""

import json
import sys
import time

import numpy as np

BASELINE_IMG_S = 500.0
K = 9  # chain length (K-1 differenced iterations)
H = W = 1024
# TPU v5e bf16 peak (NOTES "FLOP speed-of-light at 197 TFLOPs"). The MFU
# keys keep the utilization split (infer ~31% vs train ~10%, VERDICT r4
# weak #3) a recorded, regression-visible number instead of NOTES folklore.
PEAK_TFLOPS_BF16 = 197.0


def _mfu(jitted, args, img_per_s: float, batch: int):
    """Model FLOPs utilization: XLA cost_analysis FLOPs of the ALREADY-
    BENCHED program (lowered at the winning operands, so the count matches
    what ran) x measured rate / peak. Returns None when the backend offers
    no cost model (e.g. forced-host runs)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float((cost or {}).get("flops", float("nan")))
    except Exception:
        return None
    if not np.isfinite(flops) or flops <= 0:
        return None
    return round(flops / batch * img_per_s / (PEAK_TFLOPS_BF16 * 1e12), 4)


def _build(dtype=None, remat=False, use_pallas=False, mode="large"):
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.models import CABiNet

    dtype = dtype or jnp.bfloat16
    model = CABiNet(n_classes=8, mode=mode, dtype=dtype, remat=remat,
                    use_pallas=use_pallas)
    init_x = jnp.zeros((1, H, W, 3), dtype)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), init_x,
                                           train=False))()
    return model, variables


def _min_time(f, n=2):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_infer(fused: bool, use_pallas: bool = True,
                mode: str = "large") -> dict:
    """Inference throughput. use_pallas selects the fused Pallas CAB
    attention (measured 2.8% over the XLA einsum at batch 128: 0.951 vs
    0.977 ms/img, interleaved A/B reps); `fused` selects the Pallas
    early-stage kernel (wins only at batch <= 32, see NOTES.md); `mode`
    picks the CABiNet variant (the published table's second flagship
    config is MobileNetV3-Small, reference README.md:55)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    model, variables = _build(use_pallas=use_pallas, mode=mode)
    if fused in ("int8", "int8dw"):
        from cabinet_tpu.quant import collect_act_scales, make_quantized_apply

        calib = jnp.asarray(np.random.default_rng(1).normal(size=(8, H, W, 3)),
                            jnp.bfloat16)
        scales = collect_act_scales(model, variables, [calib],
                                    quantize_depthwise=(fused == "int8dw"))
        q_apply = make_quantized_apply(model, scales)

        def forward(img):
            return q_apply(variables, img, train=False)
    elif fused in ("tail-int8", "tail-int8dw"):
        from cabinet_tpu.models import make_fused_tail_apply
        from cabinet_tpu.quant import collect_act_scales, make_quantized_apply

        calib = jnp.asarray(np.random.default_rng(1).normal(size=(8, H, W, 3)),
                            jnp.bfloat16)
        scales = collect_act_scales(
            model, variables, [calib],
            quantize_depthwise=(fused == "tail-int8dw"))
        forward = make_fused_tail_apply(
            model, variables, apply_fn=make_quantized_apply(model, scales))
    elif fused == "tail":
        from cabinet_tpu.models import make_fused_tail_apply

        forward = make_fused_tail_apply(model, variables)
    elif fused:
        from cabinet_tpu.models import make_fused_apply

        forward = make_fused_apply(model, variables)
    else:
        def forward(img):
            return model.apply(variables, img, train=False)

    @partial(jax.jit, static_argnums=(1,))
    def chain(images, k):
        def body(i, img):
            logits, _ = forward(img)
            return logits[..., :3].astype(img.dtype)

        out = jax.lax.fori_loop(0, k, body, images)
        return jnp.sum(out.astype(jnp.float32))

    best, best_batch, best_x = 0.0, 0, None
    for batch in (96, 128):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, H, W, 3)),
                        jnp.bfloat16)
        try:
            float(chain(x, 1))
            float(chain(x, K))
        except Exception:
            break  # OOM at this batch size
        per_fwd = (_min_time(lambda: float(chain(x, K)))
                   - _min_time(lambda: float(chain(x, 1)))) / (K - 1)
        ips = batch / per_fwd
        if ips > best:
            best, best_batch, best_x = ips, batch, x

    tag = ("fused-tail+int8dw-branches" if fused == "tail-int8dw"
           else "fused-tail+int8-branches" if fused == "tail-int8"
           else "int8-PTQ+dw-chain" if fused == "int8dw"
           else "int8-PTQ" if fused == "int8"
           else "fused-tail+pallas-attn" if fused == "tail"
           else "fused-early" if fused
           else ("XLA+pallas-attn" if use_pallas else "XLA"))
    name = "CABiNet-Large" if mode == "large" else "CABiNet-Small"
    return {
        "metric": f"{name} 1024x1024 bf16 inference ({tag}, batch {best_batch})",
        "value": round(best, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(best / BASELINE_IMG_S, 4),
        "mfu": _mfu(chain, (best_x, 1), best, best_batch),
    }


def bench_train(batches, remat: bool) -> dict:
    """Jitted train step throughput: dual OHEM + EMA + clipping, bf16 compute
    (the reference hot loop, src/scripts/train.py:411-441)."""
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.trainer import create_train_state, make_train_step

    model, variables = _build(remat=remat)

    results = {}
    best, best_batch, best_prog = 0.0, 0, None
    for batch in batches:
        tx = build_optimizer(variables["params"], lr0=5e-3, max_iter=1000,
                             warmup_steps=10, max_grad_norm=1.0)
        state = create_train_state(variables, tx)
        step = make_train_step(model.apply, tx, n_min=batch * H * W // 16,
                               compute_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(batch, H, W, 3)), jnp.bfloat16)
        y = jnp.asarray(rng.integers(0, 8, (batch, H, W)), jnp.int32)

        def run(n, state=state):
            # donation invalidates the incoming state; thread it through and
            # fetch the final loss (dependent chain => real device time).
            for _ in range(n):
                state, loss = step(state, x, y)
            return float(loss)

        try:
            state0 = jax.tree_util.tree_map(jnp.copy, state)
            run(1, jax.tree_util.tree_map(jnp.copy, state0))  # compile
        except Exception:
            break  # OOM
        t_k = _min_time(lambda: run(K, jax.tree_util.tree_map(jnp.copy, state0)))
        t_1 = _min_time(lambda: run(1, jax.tree_util.tree_map(jnp.copy, state0)))
        per_step = (t_k - t_1) / (K - 1)
        ips = batch / per_step
        results[batch] = round(ips, 2)
        if ips > best:
            best, best_batch = ips, batch
            best_prog = (step, (state0, x, y))

    tag = "remat" if remat else "no-remat"
    return {
        "metric": (f"CABiNet-Large 1024x1024 bf16 train step ({tag}, "
                   f"batch {best_batch}; all: {results})"),
        "value": round(best, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(best / BASELINE_IMG_S, 4),
        "mfu": (_mfu(best_prog[0], best_prog[1], best, best_batch)
                if best_prog else None),
    }


def bench_train_aug(batch: int = 16, shared: bool = True) -> dict:
    """END-TO-END device train rate with the full aug recipe fused on-chip:
    per step, the aug program (geometric warp + photometric from raw u8
    canvases — what `runtime.device_geometric` ships) feeds the jitted
    train step. This is the number the device-aug feed-rate claims rest on
    (NOTES r4 gather economics): chip time = aug + step, so the aug tax is
    visible here, not hidden behind a loader."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cabinet_tpu.ops.geometric import geometric_pipeline
    from cabinet_tpu.ops.photometric import photometric_pipeline
    from cabinet_tpu.train.optimizer import build_optimizer
    from cabinet_tpu.train.trainer import create_train_state, make_train_step

    model, variables = _build()
    tx = build_optimizer(variables["params"], lr0=5e-3, max_iter=1000,
                         warmup_steps=10, max_grad_norm=1.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=batch * H * W // 16,
                           compute_dtype=jnp.bfloat16)
    aug = {"degrees": 10, "translate": 0.05, "scale": 0.3, "fliplr": 0.5,
           "flipud": 0.2, "hsv_s": 0.4, "hsv_v": 0.3, "mixup": 0.1}
    S = 2 * H
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 256, (batch, S, S, 3)
                                      ).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 8, (batch, S, S)).astype(np.uint8))
    hw = jnp.tile(jnp.asarray([[S, S - 64]], jnp.int32), (batch, 1))

    @partial(jax.jit, donate_argnums=(0,))
    def aug_and_step(state, canvas, labels, hw, key):
        kg, kp = jax.random.split(key)
        im, lb = geometric_pipeline(canvas, labels, hw, kg, aug, (H, W),
                                    shared_linear=shared)
        im, lb = photometric_pipeline(im, lb, kp, aug,
                                      mean=(0.48, 0.5, 0.46),
                                      std=(0.22, 0.21, 0.23))
        return step(state, im.astype(jnp.bfloat16), lb)

    def run(n, st):
        for i in range(n):
            st, loss = aug_and_step(st, canvas, labels, hw,
                                    jax.random.fold_in(jax.random.PRNGKey(0),
                                                       i))
        return float(loss)

    import jax.tree_util as jtu
    state0 = jtu.tree_map(jnp.copy, state)
    run(1, jtu.tree_map(jnp.copy, state0))  # compile
    t_k = _min_time(lambda: run(K, jtu.tree_map(jnp.copy, state0)))
    t_1 = _min_time(lambda: run(1, jtu.tree_map(jnp.copy, state0)))
    ips = batch / ((t_k - t_1) / (K - 1))
    mode = "shared" if shared else "exact"
    return {
        "metric": (f"CABiNet-Large 1024x1024 bf16 train step INCLUDING the "
                   f"fused on-device aug recipe ({mode} warp, batch "
                   f"{batch}, raw u8 2048² canvases in)"),
        "value": round(ips, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / BASELINE_IMG_S, 4),
        # the lowered program is aug + train step, so this MFU is the
        # chip's utilization for the WHOLE device-aug training step (the
        # aug's gather flops are part of the numerator)
        "mfu": _mfu(aug_and_step,
                    (state0, canvas, labels, hw,
                     jax.random.fold_in(jax.random.PRNGKey(0), 0)),
                    ips, batch),
    }


def bench_latency(int8dw: bool = False) -> dict:
    """Batch-1 serving latency on the path cli.infer actually ships: fused
    Pallas decoder tail + Pallas CAB attention (the early-stage kernel joins
    only at batch >= 8 — cli/infer.py batch regimes). The r1 number timed
    the plain XLA path, which no CLI serves anymore (VERDICT r2 item 6).
    int8dw adds the int8 activation-chain branches (at batch 1 the weight
    reads are a large share of HBM traffic, so int8 weights matter more
    here than in the batched regime)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from cabinet_tpu.models import make_fused_tail_apply

    model, variables = _build(use_pallas=True)
    if int8dw:
        from cabinet_tpu.quant import collect_act_scales, make_quantized_apply

        calib = jnp.asarray(np.random.default_rng(1).normal(size=(2, H, W, 3)),
                            jnp.bfloat16)
        scales = collect_act_scales(model, variables, [calib],
                                    quantize_depthwise=True)
        forward = make_fused_tail_apply(
            model, variables, apply_fn=make_quantized_apply(model, scales))
    else:
        forward = make_fused_tail_apply(model, variables)

    @partial(jax.jit, static_argnums=(1,))
    def chain(images, k):
        def body(i, img):
            logits, _ = forward(img)
            return logits[..., :3].astype(img.dtype)

        out = jax.lax.fori_loop(0, k, body, images)
        return jnp.sum(out.astype(jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, H, W, 3)),
                    jnp.bfloat16)
    float(chain(x, 1)), float(chain(x, K))
    per = (_min_time(lambda: float(chain(x, K)))
           - _min_time(lambda: float(chain(x, 1)))) / (K - 1)
    tag = ("serving path + int8dw branches" if int8dw
           else "serving path: fused tail + pallas attn")
    return {
        "metric": ("CABiNet-Large 1024x1024 bf16 batch-1 latency "
                   f"({tag})"),
        "value": round(per * 1000, 3),
        "unit": "ms/frame",
        "vs_baseline": round((1.0 / per) / BASELINE_IMG_S, 4),
    }


def bench_aug(batch: int = 16, crop: int = 1024, shared: bool = False) -> dict:
    """On-device augmentation cost (ops/geometric + ops/photometric fused):
    ms/img for the full recipe — warp/crop from a (2*crop)² u8 canvas +
    HSV/contrast/gamma/noise/cutout/mixup + normalize. Must be small vs the
    ~8-9 ms/img train step for the device-aug pipeline win to be real.
    Dependent-chain timing (same scheme as the other modes).
    shared=True runs the batch-shared-rotation warp
    (runtime.device_geometric=shared)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cabinet_tpu.ops.geometric import geometric_pipeline
    from cabinet_tpu.ops.photometric import photometric_pipeline

    S = 2 * crop
    aug = {"degrees": 10, "translate": 0.05, "scale": 0.3, "fliplr": 0.5,
           "flipud": 0.2, "mixup": 0.1}
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 256, (batch, S, S, 3)
                                      ).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 8, (batch, S, S)
                                      ).astype(np.uint8))
    hw = jnp.tile(jnp.asarray([[S, S - 64]], jnp.int32), (batch, 1))

    @partial(jax.jit, static_argnums=(3,))
    def chain(canvas, labels, hw, k):
        def body(i, carry):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            kg, kp = jax.random.split(key)
            im, lb = geometric_pipeline(canvas, labels, hw, kg, aug,
                                        (crop, crop), shared_linear=shared)
            im, lb = photometric_pipeline(im, lb, kp, aug,
                                          mean=(0.48, 0.5, 0.46),
                                          std=(0.22, 0.21, 0.23))
            # consume the outputs so nothing is dead-code-eliminated
            return carry + jnp.sum(im.astype(jnp.float32)) + jnp.sum(lb)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(chain(canvas, labels, hw, 1))
    float(chain(canvas, labels, hw, K))
    per = (_min_time(lambda: float(chain(canvas, labels, hw, K)))
           - _min_time(lambda: float(chain(canvas, labels, hw, 1)))
           ) / (K - 1) / batch
    return {
        "metric": (f"on-device full-recipe augmentation (geometric warp"
                   + (" [batch-shared rotation]" if shared else "")
                   + f" + photometric), batch {batch}, {S}²->crop {crop}²"),
        "value": round(per * 1000, 3),
        "unit": "ms/img",
        "vs_baseline": round(per * 1000 / 826.0, 5),  # vs host-PIL ms/img
    }


def bench_serve(concurrency: int = 12, n_requests: int = 72,
                max_batch: int = 8, deadline_ms: float = 4.0,
                imgsz: int = H) -> dict:
    """Server-level throughput: live cli.serve HTTP server over a
    symbolic-batch jax.export artifact (CABiNet-Large, bf16), hammered by
    concurrent clients. Reports req/s + p50/p99 with dynamic
    micro-batching, and the same-run single-flight (max_batch=1) req/s as
    the baseline the batching is measured against.

    Clients post small (256²) PNGs so the host codec doesn't mask the
    device path; the server resizes to imgsz² in-graph. Unlike the chained
    kernel benches, every response REQUIRES the input shipped H2D and the
    mask fetched D2H, so on the axon tunnel (~25 MB/s, NOTES r4) a 1024²
    request is ~180 ms of transfer vs ~7 ms/img of batched compute —
    transfer-bound, and batching cannot beat single-flight there by
    construction. Run with a smaller imgsz (e.g. 384) to see the batching
    win on dispatch+compute; on a PCIe host the 1024² number is the
    meaningful one."""
    import io
    import tempfile
    import threading
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from cabinet_tpu.cli.serve import _Engine, make_server
    from cabinet_tpu.export import export_serving, save_artifact

    model, variables = _build()
    exported = export_serving(model, variables, mean=(0.48, 0.5, 0.46),
                              std=(0.22, 0.21, 0.23), imgsz=imgsz,
                              batch="b")

    rgb = (np.random.default_rng(0).random((256, 256, 3)) * 255
           ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    png = buf.getvalue()

    def run_load(engine) -> dict:
        srv = make_server(engine, "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}/segment"

        def one(_):
            req = urllib.request.Request(
                url, data=png, method="POST",
                headers={"Content-Type": "image/png"})
            with urllib.request.urlopen(req, timeout=900) as r:
                r.read()

        # warmup compiles every power-of-two regime the load can hit
        x0 = engine._preprocess(rgb)
        b = 1
        while True:
            engine.batcher.infer_batch(np.stack([x0] * b), b)
            if b >= engine.batcher.max_batch:
                break
            b = min(2 * b, engine.batcher.max_batch)
        with ThreadPoolExecutor(concurrency) as pool:
            list(pool.map(one, range(concurrency)))
        engine.batcher.reset_stats()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(concurrency) as pool:
            list(pool.map(one, range(n_requests)))
        dt = time.perf_counter() - t0
        stats = engine.stats()
        srv.shutdown()
        engine.batcher.close()
        return {"req_s": n_requests / dt, **stats}

    with tempfile.TemporaryDirectory() as td:
        art = save_artifact(exported, td, {
            "dataset": "uavid", "imgsz": imgsz, "n_classes": 8, "batch": "b"})
        batched = run_load(_Engine(str(art), None, None, "large", imgsz,
                                   "bfloat16", max_batch=max_batch,
                                   deadline_ms=deadline_ms,
                                   queue_depth=256))
        single = run_load(_Engine(str(art), None, None, "large", imgsz,
                                  "bfloat16", max_batch=1,
                                  deadline_ms=0.0, queue_depth=256))
    return {
        "metric": (f"cli.serve req/s (Large {imgsz}² artifact, "
                   f"{concurrency} concurrent clients, "
                   f"micro-batch<= {max_batch})"),
        "value": round(batched["req_s"], 2),
        "unit": "req/s",
        # baseline = the same server single-flight: the ratio IS the
        # micro-batching win
        "vs_baseline": round(batched["req_s"] / single["req_s"], 3),
        "p50_ms": batched["latency_ms_p50"],
        "p99_ms": batched["latency_ms_p99"],
        "mean_batch": batched["mean_batch_size"],
        "single_flight_req_s": round(single["req_s"], 2),
        "single_flight_p50_ms": single["latency_ms_p50"],
    }


def bench_yolo(train_mode: bool, variants=("n", "s", "m"),
               int8: bool = False) -> dict:
    """YOLO-sem family perf (VERDICT r2 item 7: the second model family had
    no speed regression guard). Inference at 1024^2 bf16 (best over a batch
    sweep) or the jitted CE train step at batch 8. int8 runs the PTQ
    serving path (quant.py; class heads stay float by name — YOLO has no
    depthwise convs, so there is no dw-chain distinction here)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from cabinet_tpu.models.yolosem import build_yolosem

    results = {}
    for v in variants:
        model = build_yolosem(8, f"yolo26{v}-sem", dtype=jnp.bfloat16)
        init_x = jnp.zeros((1, H, W, 3), jnp.bfloat16)
        variables = jax.jit(lambda m=model: m.init(jax.random.PRNGKey(0),
                                                   init_x, train=False))()
        apply_fn = model.apply
        if int8 and not train_mode:
            from cabinet_tpu.quant import (
                collect_act_scales,
                make_quantized_apply,
            )

            calib = jnp.asarray(
                np.random.default_rng(1).normal(size=(4, H, W, 3)),
                jnp.bfloat16)
            scales = collect_act_scales(model, variables, [calib])
            apply_fn = make_quantized_apply(model, scales)
        if train_mode:
            from cabinet_tpu.train.trainer import (
                create_train_state,
                make_train_step,
            )
            import optax

            batch = 8
            tx = optax.sgd(1e-3, momentum=0.9)
            state = create_train_state(variables, tx)
            step = make_train_step(model.apply, tx, n_min=1, loss_type="ce",
                                   compute_dtype=jnp.bfloat16)
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.normal(size=(batch, H, W, 3)), jnp.bfloat16)
            y = jnp.asarray(rng.integers(0, 8, (batch, H, W)), jnp.int32)

            def run(n, st):
                for _ in range(n):
                    st, loss = step(st, x, y)
                return float(loss)

            st0 = jax.tree_util.tree_map(jnp.copy, state)
            run(1, jax.tree_util.tree_map(jnp.copy, st0))
            t_k = _min_time(lambda: run(K, jax.tree_util.tree_map(jnp.copy, st0)))
            t_1 = _min_time(lambda: run(1, jax.tree_util.tree_map(jnp.copy, st0)))
            results[v] = round(batch / ((t_k - t_1) / (K - 1)), 1)
            continue

        @partial(jax.jit, static_argnums=(1,))
        def chain(images, k, f=apply_fn, vs=variables):
            def body(i, img):
                logits, _ = f(vs, img, train=False)
                return logits[..., :3].astype(img.dtype)

            out = jax.lax.fori_loop(0, k, body, images)
            return jnp.sum(out.astype(jnp.float32))

        best = 0.0
        # one batch point: each (variant, batch) costs two slow remote
        # compiles of a large C2f net; 48 is within every variant's memory
        # and near its throughput plateau
        for batch in (48,):
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(batch, H, W, 3)),
                jnp.bfloat16)
            try:
                float(chain(x, 1)), float(chain(x, K))
            except Exception as e:
                # Loudly record the failure instead of a silent 0.0 img/s —
                # a regression tracker must distinguish "slow" from "broken".
                print(f"# yolo bench: variant {v} batch {batch} failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                break
            per = (_min_time(lambda: float(chain(x, K)))
                   - _min_time(lambda: float(chain(x, 1)))) / (K - 1)
            best = max(best, batch / per)
        results[v] = round(best, 1)

    tag = ("train step (batch 8)" if train_mode
           else "int8-PTQ inference (batch 48)" if int8
           else "inference (batch 48)")
    top = max(results.values())
    return {
        "metric": f"YOLO-sem 1024x1024 bf16 {tag}; img/s by variant: {results}",
        "value": top,
        "unit": "img/s/chip",
        "vs_baseline": round(top / BASELINE_IMG_S, 4),
    }


def bench_eval4k(scan_variant: bool = False) -> dict:
    """Full-protocol 4K eval (6 scales + flip TTA, sliding window, crop
    1024) on ONE pre-staged 4096x2160 frame — the UAVid test-protocol hot
    path (VERDICT r2 item 1: was 2.40 s/img vs ~0.2 s of model compute).
    Times the cached jitted program directly (device compute; the H2D
    staging rides the slow tunnel relay and is not what this metric
    tracks).

    scan_variant=True runs the same protocol through the lax.scan +
    dynamic-update-slice engine (the tile-sharded path on a 1-device mesh):
    traced tile indices kill the ~120-job unroll, at the cost of
    scatter-style accumulation — the structured A/B for the last eval glue
    (VERDICT r3 next #6)."""
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.models import make_fused_tail_apply

    EH, EW = 2160, 4096
    R2_SECONDS = 2.404  # round-2 recorded s/img on this protocol (NOTES.md)

    model, variables = _build(use_pallas=True)
    fwd = make_fused_tail_apply(model, variables)
    tile_mesh = None
    if scan_variant:
        from cabinet_tpu.core.mesh import make_mesh

        tile_mesh = make_mesh(n_data=1, n_model=1)
    ev = MscEval(lambda v, x, train=False: fwd(x), n_classes=8,
                 scales=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75), flip=True,
                 cropsize=1024, compute_dtype=jnp.bfloat16,
                 # measured winners (NOTES r3): 64-tile fold (bit-identical
                 # argmax) + bf16 accumulation (auto under bf16 compute)
                 tile_batch=64, tile_mesh=tile_mesh)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(rng.normal(size=(1, EH, EW, 3)),
                                        jnp.bfloat16))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 8, (1, EH, EW)),
                                        jnp.int32))
    run = ev._program(1, EH, EW)

    def once(k):
        hs = [run(variables, images, labels)[1] for _ in range(k)]
        for h in hs:
            np.asarray(h)

    once(1)  # compile
    t1 = _min_time(lambda: once(1))
    t3 = _min_time(lambda: once(3))
    per = (t3 - t1) / 2
    return {
        "metric": ("CABiNet-Large 4096x2160 full-protocol eval "
                   "(6 scales + flip, crop 1024, bf16, "
                   + ("scan+DUS engine" if scan_variant else "fused tail")
                   + ")"),
        "value": round(per, 3),
        "unit": "s/img",
        "vs_baseline": round(R2_SECONDS / per, 4),
    }


def bench_eval4k_agree() -> dict:
    """Quality guard for the 4K fast chain: argmax agreement of the bf16
    accumulation+softmax path (TPU serving default under bf16 compute)
    against the f32 chain on the same random-weight 4K frame — random
    weights are the worst case (tiny margins everywhere); trained models
    have far larger margins. All reductions on device (D2H is a slow
    relay)."""
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.models import make_fused_tail_apply

    EH, EW = 2160, 4096
    model, variables = _build(use_pallas=True)
    fwd = make_fused_tail_apply(model, variables)
    apply_fn = lambda v, x, train=False: fwd(x)  # noqa: E731
    common = dict(n_classes=8, scales=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
                  flip=True, cropsize=1024, compute_dtype=jnp.bfloat16,
                  tile_batch=64)
    ev_fast = MscEval(apply_fn, **common)  # bf16 acc + bf16 softmax chain
    ev_f32 = MscEval(apply_fn, acc_dtype=jnp.float32, **common)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(rng.normal(size=(1, EH, EW, 3)),
                                      jnp.bfloat16))

    @jax.jit
    def stats(pa, pb):
        dis = pa.argmax(-1) != pb.argmax(-1)
        s = jnp.sort(pb, axis=-1)
        margin = s[..., -1] - s[..., -2]
        dm = jnp.where(dis, margin, 0.0)
        n = dis.sum()
        return dis.mean(), n, dm.max()

    pa = ev_fast._program_probs(1, EH, EW)(variables, imgs)
    pb = ev_f32._program_probs(1, EH, EW)(variables, imgs)
    dis_frac, n, max_m = (float(x) for x in stats(pa, pb))
    return {
        "metric": ("4K protocol argmax agreement: bf16 fast chain vs f32 "
                   f"chain (random weights; {int(n)} flips, "
                   f"max flip margin {max_m:.1e})"),
        "value": round(1.0 - dis_frac, 6),
        "unit": "fraction",
        "vs_baseline": round((1.0 - dis_frac) / 0.999, 6),
    }


def main() -> None:
    args = sys.argv[1:]
    mode = args[0] if args else "infer"

    def batches():
        # parsed lazily: only the train modes take integer batch args
        # (e.g. `bench.py yolo n s m` has letter args)
        return tuple(int(a) for a in args[1:]) or (8, 16, 32)

    if mode == "infer":
        # Headline: fused Pallas decoder tail (ops/decoder_tail.py, +7.3%)
        # + fused Pallas CAB attention over XLA convs — measured best at
        # batch 128 (1130 vs 1054 img/s), exact bf16 architecture math
        # (parity-tested). The Pallas early-stage kernel wins only at
        # batch <= 32 (serving regime) — see NOTES.md for the sweep.
        out = bench_infer(fused="tail", use_pallas=True)
    elif mode == "infer-xla":
        out = bench_infer(fused=False, use_pallas=False)
    elif mode == "infer-fused":
        out = bench_infer(fused=True, use_pallas=False)
    elif mode == "infer-fused-tail-int8":
        # Fused decoder tail + int8 PTQ on the branch/backbone MXU convs.
        out = bench_infer(fused="tail-int8", use_pallas=True)
    elif mode == "infer-fused-tail-int8dw":
        # Fused decoder tail + int8 branches WITH the depthwise activation
        # chain (quant.dw_site_predicate).
        out = bench_infer(fused="tail-int8dw", use_pallas=True)
    elif mode == "infer-fused-tail":
        # Fused FFM+head decoder tail (ops/decoder_tail.py) on top of the
        # Pallas CAB attention.
        out = bench_infer(fused="tail", use_pallas=True)
    elif mode == "infer-small":
        # CABiNet-Small (the table's second flagship config) on the same
        # fused serving path as the headline.
        out = bench_infer(fused="tail", use_pallas=True, mode="small")
    elif mode == "infer-small-int8dw":
        out = bench_infer(fused="tail-int8dw", use_pallas=True, mode="small")
    elif mode == "infer-int8":
        # int8 PTQ serving path (cabinet_tpu/quant.py): MXU convs at 2x the
        # bf16 rate; depthwise/attention stay bf16. Random-data calibration
        # (timing only; quality protocol lives in tests/unit/test_quant.py).
        out = bench_infer(fused="int8", use_pallas=False)
    elif mode == "infer-int8dw":
        # int8 activation chain: depthwise convs quantized too, so the
        # inverted-residual expand->dw->project hops move int8 activations
        # (quant.dw_site_predicate — the bandwidth lever from NOTES r4).
        out = bench_infer(fused="int8dw", use_pallas=False)
    elif mode == "train":
        out = bench_train(batches(), remat=False)
    elif mode == "train-remat":
        out = bench_train(batches(), remat=True)
    elif mode == "latency":
        out = bench_latency()
    elif mode == "latency-int8dw":
        out = bench_latency(int8dw=True)
    elif mode == "aug":
        out = bench_aug(*(int(a) for a in args[1:3]))
    elif mode == "aug-shared":
        out = bench_aug(*(int(a) for a in args[1:3]), shared=True)
    elif mode == "train-aug":
        out = bench_train_aug(int(args[1]) if len(args) > 1 else 16)
    elif mode == "train-aug-exact":
        out = bench_train_aug(int(args[1]) if len(args) > 1 else 16,
                              shared=False)
    elif mode == "serve":
        kw = {}
        if len(args) > 1:
            kw["concurrency"] = int(args[1])
        if len(args) > 2:
            kw["max_batch"] = int(args[2])
        if len(args) > 3:
            kw["imgsz"] = int(args[3])
        out = bench_serve(**kw)
    elif mode == "yolo":
        out = bench_yolo(train_mode=False,
                         variants=tuple(args[1:]) or ("n", "s", "m"))
    elif mode == "yolo-int8":
        out = bench_yolo(train_mode=False, int8=True,
                         variants=tuple(args[1:]) or ("n", "s", "m"))
    elif mode == "yolo-train":
        out = bench_yolo(train_mode=True,
                         variants=tuple(args[1:]) or ("n", "s", "m"))
    elif mode == "eval4k":
        out = bench_eval4k()
    elif mode == "eval4k-scan":
        out = bench_eval4k(scan_variant=True)
    elif mode == "eval4k-agree":
        out = bench_eval4k_agree()
    else:
        raise SystemExit(f"unknown bench mode: {mode}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
