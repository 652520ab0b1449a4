"""Benchmark: CABiNet-Large inference throughput at 1024x1024 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/500}

Baseline: the BASELINE.json north star of >=500 img/s/chip on TPU v5e (the
reference publishes no latency numbers at all — SURVEY §6).

Measurement: under the remote-tunnel runtime, block_until_ready returns
before device execution finishes and D2H rides a slow relay, so wall-clock
loops mis-measure. Instead we time a DEPENDENT on-device chain of K forwards
(each iteration consumes the previous logits) ending in a scalar fetch, and
difference out the fixed overhead: per_fwd = (t(K) - t(1)) / (K - 1).
"""

import json
import time

import numpy as np

BASELINE_IMG_S = 500.0
K = 9  # chain length (K-1 differenced iterations)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from cabinet_tpu.models import CABiNet

    dtype = jnp.bfloat16
    model = CABiNet(n_classes=8, mode="large", dtype=dtype, use_pallas=False)

    H = W = 1024
    init_x = jnp.zeros((1, H, W, 3), dtype)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), init_x,
                                           train=False))()

    @partial(jax.jit, static_argnums=(2,))
    def chain(v, images, k):
        def body(i, img):
            logits, _ = model.apply(v, img, train=False)
            return logits[..., :3].astype(img.dtype)

        out = jax.lax.fori_loop(0, k, body, images)
        return jnp.sum(out.astype(jnp.float32))

    def time_chain(x, k, n=2):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(chain(variables, x, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    best, best_batch = 0.0, 0
    for batch in (96, 128):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, H, W, 3)),
                        dtype)
        try:
            float(chain(variables, x, 1))
            float(chain(variables, x, K))
        except Exception:
            break  # OOM at this batch size
        per_fwd = (time_chain(x, K) - time_chain(x, 1)) / (K - 1)
        ips = batch / per_fwd
        if ips > best:
            best, best_batch = ips, batch

    print(json.dumps({
        "metric": f"CABiNet-Large 1024x1024 bf16 inference (batch {best_batch})",
        "value": round(best, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(best / BASELINE_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
