"""Repack Q4_0 blocks into a TPU-friendly layout.

GGUF's 18-byte interleaved blocks (f16 scale + nibbles) are hostile to TPU
(8, 128) tiling and TPUs have no native f16 — so, once at load time, each
quantized ``[N, K]`` weight (N = out features, K = in features, matching the
reference's ``Q4Tensor`` shape contract at src/gguf/tensor.rs:33) is
unpacked into two dense arrays laid out for ``x[M, K] @ W[K, N]``:

* ``qw: int8[K, N]``  — centered codes ``nibble - 8`` in [-8, 7]; contiguous
  along N (lanes), so a (sublane, lane) tile maps onto (K, N)
* ``scales: float32[K // 32, N]`` — per-32-K-block scales, f16-exact after
  the storage round-trip, so ``dequant = qw * repeat(scales, 32, axis=K)``
  is bit-identical to the reference's ``(nibble - 8) * d``
  (src/gguf/shader.wgsl:82-88)

This keeps HBM traffic at 1 byte/weight (vs 4 for f32) while letting both
the XLA fallback and the Pallas fused kernel consume plain strided arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from whisper_burn_tpu.gguf.quant import Q4_BLOCK_SIZE, unpack_q4_0


@dataclass
class QuantizedTensor:
    """Host-side repacked Q4_0 weight for a linear layer ``y = x @ W^T``.

    ``qw[k, n] * scales[k // 32, n]`` reconstructs ``W^T[k, n]`` exactly.
    """

    qw: np.ndarray  # int8 [K, N]
    scales: np.ndarray  # float32 [K // 32, N]

    @property
    def k(self) -> int:
        return self.qw.shape[0]

    @property
    def n(self) -> int:
        return self.qw.shape[1]

    def dequantize(self) -> np.ndarray:
        """float32 ``W^T[K, N]`` — test oracle."""
        return self.qw.astype(np.float32) * np.repeat(self.scales, Q4_BLOCK_SIZE, axis=0)


def repack_q4_0(raw: bytes | np.ndarray, n_out: int, k_in: int) -> QuantizedTensor:
    """Repack a GGUF Q4_0 tensor of logical shape ``[n_out, k_in]``.

    The GGUF buffer stores row-major ``[N, K]`` with 32-element blocks along
    K (K must divide by 32, guaranteed for Whisper's 1280/5120 dims).
    """
    if k_in % Q4_BLOCK_SIZE != 0:
        raise ValueError(f"K={k_in} not divisible by {Q4_BLOCK_SIZE}")

    from whisper_burn_tpu import native_host

    native = native_host.repack_q4_0(raw, n_out, k_in)
    if native is not None:  # multithreaded C++ fast path (bit-identical)
        return QuantizedTensor(qw=native[0], scales=native[1])

    q, d = unpack_q4_0(raw, n_out * k_in)
    qw = np.ascontiguousarray(q.reshape(n_out, k_in).T)  # int8 [K, N]
    scales = np.ascontiguousarray(
        d.reshape(n_out, k_in // Q4_BLOCK_SIZE).T
    )  # f32 [K//32, N]
    return QuantizedTensor(qw=qw, scales=scales)


def repack_f32(weight: np.ndarray) -> QuantizedTensor:
    """Quantize + repack an f32 ``[N, K]`` weight directly (test helper)."""
    from whisper_burn_tpu.gguf.quant import quantize_q4_0

    n_out, k_in = weight.shape
    return repack_q4_0(quantize_q4_0(weight), n_out, k_in)
