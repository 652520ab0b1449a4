"""Fused global-context attention kernel (Pallas / TPU).

The CAB's global attention (models/cab.py) is softmax(q k^T * K^-0.5) v over
all H*W tokens of the /32 feature map — N is at most ~1024-4096 tokens for
the supported input sizes, with K=V=128 channels. The fused kernel keeps the
(N, N) attention matrix entirely in VMEM (never materialized in HBM),
computing qk^T on the MXU, a numerically-stable row softmax on the VPU, and
the value contraction on the MXU, one batch element per grid step.

Forward-only: training uses the XLA einsum path (use_pallas=False), whose
backward pass XLA derives automatically; the Pallas path is for inference
at fixed shapes. Falls back to the einsum path on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (N, K)
    k = k_ref[0].astype(jnp.float32)  # (N, K)
    v = v_ref[0].astype(jnp.float32)  # (N, V)

    attn = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N, N)

    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)

    out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_global_attention(q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T * K^-0.5) v, fused in VMEM.

    q: (B, N, K); k: (B, N, K); v: (B, N, V) -> (B, N, V).
    Matches the XLA path in models/cab.py (reference cab.py:149-153).
    """
    B, N, K = q.shape
    V = v.shape[-1]
    # VMEM budget guard: the kernel holds the (N,N) f32 attention matrix
    # plus q/k/v/out blocks entirely in VMEM. For token counts past ~12 MB
    # of working set (e.g. inputs far above the 1024-2048 px serving sizes)
    # fall back to the identical einsum path rather than crash in Mosaic.
    vmem_bytes = 4 * (N * N + 2 * N * K + 2 * N * V)
    if jax.default_backend() not in ("tpu",) or vmem_bytes > 12 * 2 ** 20:
        scale = q.shape[-1] ** -0.5
        attn = jnp.einsum("bnk,bmk->bnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        return jnp.einsum("bnm,bmv->bnv", attn, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)
    scale = float(K) ** -0.5

    kernel = functools.partial(_attention_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, V), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, V), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, V), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (K + V) + 4 * B * N * N,
            bytes_accessed=B * N * (2 * K + 2 * V) * q.dtype.itemsize,
            transcendentals=B * N * N,
        ),
    )(q, k, v)
