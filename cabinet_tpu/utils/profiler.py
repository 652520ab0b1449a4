"""Performance profiling harness (reference src/utils/profiler.py:14-296).

TPU equivalents of the reference's tools:
  - inference latency/FPS with warmup and proper device fencing — measured
    via a dependent on-device chain because block_until_ready can return
    early under remote-tunnel runtimes (the same method bench.py uses),
  - analytic FLOPs from XLA's own cost analysis
    (jit(f).lower().compile().cost_analysis()) — the reference shells out to
    `thop` for this (README.md:758),
  - device memory stats from memory_analysis(),
  - parameter counting,
  - jax.profiler trace capture for xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import numpy as np


class PerformanceProfiler:
    def __init__(self, warmup: int = 2, repeats: int = 3, chain: int = 9):
        self.warmup = warmup
        self.repeats = repeats
        self.chain = chain

    # ------------------------------------------------------------- timing
    @contextlib.contextmanager
    def timer(self, name: str = "block"):
        import jax

        t0 = time.perf_counter()
        yield
        # Fence by syncing all live arrays on the default device.
        jax.effects_barrier()
        self.last_elapsed = time.perf_counter() - t0

    def measure_inference_time(self, apply_fn: Callable, variables: Any,
                               example: np.ndarray) -> Dict[str, float]:
        """Per-forward stats via chained differencing (ms)."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        x = jnp.asarray(example)

        @partial(jax.jit, static_argnums=(2,))
        def chain(v, img, k):
            def body(i, acc):
                out = apply_fn(v, acc)
                if isinstance(out, tuple):
                    out = out[0]
                s = jnp.sum(out.astype(jnp.float32)) * 1e-20
                return acc + s.astype(acc.dtype)

            return jnp.sum(jax.lax.fori_loop(0, k, body, img)
                           .astype(jnp.float32))

        for _ in range(self.warmup):
            float(chain(variables, x, 1))
        float(chain(variables, x, self.chain))

        def t(k):
            ts = []
            for _ in range(self.repeats):
                t0 = time.perf_counter()
                float(chain(variables, x, k))
                ts.append(time.perf_counter() - t0)
            return ts

        t1, tk = t(1), t(self.chain)
        per = [(b - a) / (self.chain - 1) for a, b in zip(t1, tk)]
        arr = np.asarray(per) * 1000.0
        batch = example.shape[0]
        return {
            "mean_ms": float(arr.mean()),
            "std_ms": float(arr.std()),
            "min_ms": float(arr.min()),
            "max_ms": float(arr.max()),
            "median_ms": float(np.median(arr)),
            "fps": float(batch / (arr.mean() / 1000.0)),
        }

    # -------------------------------------------------------------- flops
    def profile_model_flops(self, apply_fn: Callable, variables: Any,
                            example: np.ndarray) -> Dict[str, float]:
        """Analytic cost from XLA (true FLOPs, unlike the reference's
        op-time totals — profiler.py:177-225)."""
        import jax

        compiled = jax.jit(lambda v, x: apply_fn(v, x)).lower(
            variables, example).compile()
        cost = compiled.cost_analysis() or {}
        return {
            "flops": float(cost.get("flops", float("nan"))),
            "gflops": float(cost.get("flops", float("nan"))) / 1e9,
            "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        }

    # ------------------------------------------------------------- memory
    def measure_memory_usage(self, apply_fn: Callable, variables: Any,
                             example: np.ndarray) -> Dict[str, float]:
        import jax

        compiled = jax.jit(lambda v, x: apply_fn(v, x)).lower(
            variables, example).compile()
        mem = compiled.memory_analysis()
        out: Dict[str, float] = {}
        for attr in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                out[attr.replace("_in_bytes", "_mb")] = v / 1e6
        return out

    # ------------------------------------------------------------- params
    @staticmethod
    def count_parameters(params: Any) -> Dict[str, float]:
        import jax

        leaves = jax.tree_util.tree_leaves(params)
        total = int(sum(np.prod(p.shape) for p in leaves))
        return {"total": total, "total_millions": total / 1e6}

    # -------------------------------------------------------------- trace
    @contextlib.contextmanager
    def trace(self, logdir: str):
        """Capture a profiler trace viewable in xprof/TensorBoard."""
        import jax

        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    # ---------------------------------------------------------- composite
    def run_full_benchmark(self, apply_fn: Callable, variables: Any,
                           example: np.ndarray) -> Dict[str, Any]:
        return {
            "latency": self.measure_inference_time(apply_fn, variables, example),
            "flops": self.profile_model_flops(apply_fn, variables, example),
            "memory": self.measure_memory_usage(apply_fn, variables, example),
            "params": self.count_parameters(
                variables.get("params", variables)),
        }
