"""Quantized matmul: ``y[..., N] = x[..., K] @ dequant(W)[K, N]``.

The TPU rebirth of the reference's fused dequant+matmul WGSL shader
(src/gguf/shader.wgsl, launched by src/gguf/op.rs:47-116). The reference
runs one thread per output element with no tiling — exactly the design NOT
to copy; here the weight is already repacked (gguf/repack.py) into
``qw: int8[K, N]`` + ``scales: f32[K//32, N]``, and the matmul is served by
either:

* **XLA path** (this module): broadcast-dequantize then ``jnp.dot``. XLA
  fuses the dequant into the operand pipeline; correctness oracle on all
  platforms.
* **Pallas path** (ops/pallas_q4.py): fused block-dequant matmul tiled for
  the MXU, dequantizing int8 tiles in VMEM so HBM traffic stays at
  1 byte/weight.

Dequant semantics are the numerical contract: ``(q - 8) * d`` with ``d``
the f16-exact block scale (SURVEY §2.6.1); here ``qw`` already stores
``q - 8``.
"""

from __future__ import annotations

import jax.numpy as jnp

from whisper_burn_tpu.ops.compute import Compute

Q4_BLOCK = 32


def dequant_weight(qw: jnp.ndarray, scales: jnp.ndarray, dtype) -> jnp.ndarray:
    """Materialize ``W^T[K, N]`` in ``dtype``.

    ``qw: int8[K, N]``, ``scales: [K//32, N]``. The broadcast multiply is
    expressed over a ``[K//32, 32, N]`` view so XLA emits a fused
    broadcast rather than a gather/repeat.
    """
    k, n = qw.shape
    q = qw.reshape(k // Q4_BLOCK, Q4_BLOCK, n).astype(dtype)
    w = q * scales.astype(dtype)[:, None, :]
    return w.reshape(k, n)


def q4_matmul_xla(
    x: jnp.ndarray, qw: jnp.ndarray, scales: jnp.ndarray, compute: Compute,
    out_dtype=None,
) -> jnp.ndarray:
    """Dequantize-then-dot fallback; accumulates in float32."""
    w = dequant_weight(qw, scales, compute.dtype)
    y = jnp.matmul(
        x.astype(compute.dtype),
        w,
        precision=compute.precision,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype or compute.dtype)


def q4_matmul(
    x: jnp.ndarray, qw: jnp.ndarray, scales: jnp.ndarray, compute: Compute,
    out_dtype=None,
) -> jnp.ndarray:
    """Quantized matmul with backend dispatch.

    ``x: [..., K]`` -> ``[..., N]`` (batch dims preserved, like the
    reference's ``q4_matmul(input[B,M,K]) -> [B,M,N]``, src/gguf/op.rs:47).
    ``out_dtype`` overrides the result dtype (f32 accumulation is kept up
    to the cast — the logits matmul needs full-precision output).
    """
    if compute.use_pallas and _rows(x) < LARGE_M:
        from whisper_burn_tpu.ops.pallas_q4 import q4_matmul_pallas

        y = q4_matmul_pallas(x, qw, scales, compute, out_dtype=out_dtype)
        if y is not None:  # kernel may decline unsupported shapes
            return y
    return q4_matmul_xla(x, qw, scales, compute, out_dtype=out_dtype)


# Row count above which the dequantize-then-dot path wins. Measured on
# v5e at [49152, 1280] @ [1280, 2560]: XLA dequant+dot 141 TFLOP/s vs
# 116 for the best-tiled fused kernel — at large M the one-off bf16
# weight materialization (~3 bytes/weight once) is noise next to the
# MXU time, and XLA's matmul pipeline is simply better tuned. At small
# M (the decode GEMV) the matmul is weight-bandwidth-bound and the
# fused kernel's 1 byte/weight wins.
LARGE_M = 4096


def _rows(x: jnp.ndarray) -> int:
    m = 1
    for s in x.shape[:-1]:
        m *= s
    return m
