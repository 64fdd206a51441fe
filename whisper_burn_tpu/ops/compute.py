"""Compute policy: dtype, matmul precision, kernel backend selection."""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


class KernelBackend(enum.Enum):
    """Which implementation serves the quantized matmuls."""

    AUTO = "auto"  # Pallas on TPU, XLA elsewhere
    XLA = "xla"  # dequantize + jnp.dot (compiler-fused)
    PALLAS = "pallas"  # fused Pallas dequant-matmul kernel


@dataclasses.dataclass(frozen=True)
class Compute:
    """Numerics policy threaded through the model (hashable, jit-static).

    * ``parity()``: float32 activations, 3-pass MXU matmuls — used for
      token-exact comparisons against reference behavior.
    * ``fast()``: bfloat16 activations with float32 accumulation — the
      serving configuration; layernorm/softmax/logits stay float32.
    """

    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    backend: KernelBackend = KernelBackend.AUTO
    # cross-KV cache storage dtype; None = same as ``dtype``. int8 halves
    # the dominant decode-step HBM traffic (the per-token cross-KV read)
    # using per-(layer, channel) scales that fold outside the kernel.
    kv_dtype: jnp.dtype | None = None

    @classmethod
    def parity(cls) -> "Compute":
        return cls(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    @classmethod
    def fast(cls) -> "Compute":
        return cls(dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT)

    @classmethod
    def fastest(cls) -> "Compute":
        """bf16 compute + int8 cross-KV cache — the serving throughput mode."""
        return cls(
            dtype=jnp.bfloat16,
            precision=jax.lax.Precision.DEFAULT,
            kv_dtype=jnp.int8,
        )

    @property
    def cross_kv_dtype(self):
        return self.dtype if self.kv_dtype is None else self.kv_dtype

    @property
    def quantized_kv(self) -> bool:
        return self.cross_kv_dtype == jnp.int8

    def replace(self, **kw) -> "Compute":
        return dataclasses.replace(self, **kw)

    @property
    def use_pallas(self) -> bool:
        if self.backend is KernelBackend.PALLAS:
            return True
        if self.backend is KernelBackend.XLA:
            return False
        return jax.default_backend() not in ("cpu",)
