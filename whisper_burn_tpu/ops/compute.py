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
    # 4 packs two int4 values per stored byte (positions t and t+T/2 share
    # a byte), halving cross-KV traffic again; requires quantized kv_dtype.
    kv_bits: int = 8
    # self-attention KV cache storage dtype; None = same as ``dtype``.
    # int8 uses per-token absmax/127 scales (stored [L, B, T, 1]) applied
    # inside the decode kernel — unlike the cross cache, self K/V arrive one
    # token at a time, so per-channel scales can't be fixed up front.
    self_kv_dtype: jnp.dtype | None = None
    # 4 packs the self cache like the cross cache (requires int8
    # self_kv_dtype); per-token per-channel-group absmax/7 scales,
    # channels packed in pairs.
    self_kv_bits: int = 8
    # V-only override: self_kv_vbits=4 with self_kv_bits=8 stores int8
    # KEYS (per-token scalar scales — scores are the int4-sensitive path)
    # and int4-packed VALUES (group scales; value noise averages out under
    # the softmax) — 25% off the self-KV stream at ~int8 accuracy.
    # None = follow self_kv_bits for both.
    self_kv_vbits: int | None = None
    # int8-quantize the tied-embedding logits matmul (decode reads the
    # [V, D] embedding every step — bf16 is 0.13 GB/step at Large-V3; int8
    # halves it). Serving-only; accuracy-gated via the sweep's
    # q8_logits row before it joins the fastest() default.
    quantized_logits: bool = False
    # W8A8 for large-M matmuls (encoder blocks + the cross-KV fill):
    # activations quantize per-row to int8 and the contraction runs
    # int8 x int8 -> int32 on the MXU at 2x bf16 peak (v5e: 394 TOPS).
    # Needs per-column int8 weight copies prepared by
    # transcribe.prepare_params (models/params.attach_w8a8);
    # accuracy-gated via the sweep's enc_w8a8 row.
    w8a8: bool = False
    # Tensor-parallel context for shard_map bodies (parallel/sharded.py):
    # ``tp`` = model-axis size (per-shard head count = n_heads // tp, KV
    # cache width = D // tp), ``tp_axis`` = mesh axis name psum'd after the
    # row-parallel (output) projections. tp=1/None means single-shard
    # semantics — the default everywhere outside shard_map.
    tp: int = 1
    tp_axis: str | None = None

    @classmethod
    def parity(cls) -> "Compute":
        return cls(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    @classmethod
    def fast(cls) -> "Compute":
        return cls(dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT)

    @classmethod
    def fastest(cls, kv_bits: int = 8) -> "Compute":
        """bf16 compute + quantized cross-KV cache — the serving throughput
        mode. ``kv_bits=4`` packs two int4 values per byte (another ~2x off
        the dominant decode-step HBM stream)."""
        return cls(
            dtype=jnp.bfloat16,
            precision=jax.lax.Precision.DEFAULT,
            kv_dtype=jnp.int8,
            kv_bits=kv_bits,
            self_kv_dtype=jnp.int8,
        )

    @property
    def cross_kv_dtype(self):
        if self.kv_packed:
            return jnp.uint8  # biased-nibble pair container
        return self.dtype if self.kv_dtype is None else self.kv_dtype

    @property
    def quantized_kv(self) -> bool:
        kv = self.dtype if self.kv_dtype is None else self.kv_dtype
        return kv == jnp.int8

    @property
    def kv_packed(self) -> bool:
        return self.quantized_kv and self.kv_bits == 4

    @property
    def quantized_self_kv(self) -> bool:
        kv = self.dtype if self.self_kv_dtype is None else self.self_kv_dtype
        return kv == jnp.int8

    @property
    def self_kv_packed(self) -> bool:
        """int4 KEYS (V follows unless self_kv_vbits overrides)."""
        return self.quantized_self_kv and self.self_kv_bits == 4

    @property
    def self_v_packed(self) -> bool:
        """int4 VALUES (mixed 8K/4V when self_kv_packed is False)."""
        vbits = self.self_kv_bits if self.self_kv_vbits is None else self.self_kv_vbits
        return self.quantized_self_kv and vbits == 4

    @property
    def self_kv_storage_dtype(self):
        if self.self_kv_packed:
            return jnp.uint8  # nibble-pair container, channels packed
        return self.dtype if self.self_kv_dtype is None else self.self_kv_dtype

    @property
    def self_v_storage_dtype(self):
        if self.self_v_packed:
            return jnp.uint8
        return self.self_kv_storage_dtype

    def __post_init__(self) -> None:
        # int4 keys with wider (int8) values has no kernel or cache layout
        # anywhere in the stack (_packed_scales_ok rejects it; the XLA path
        # would mix uint8/int8 cache halves) — reject at construction so
        # the failure is immediate, not a trace-time TypeError (ADVICE r4).
        vbits = self.self_kv_bits if self.self_kv_vbits is None else self.self_kv_vbits
        if self.self_kv_bits == 4 and vbits > 4:
            raise ValueError(
                "self_kv_vbits wider than self_kv_bits is unsupported "
                "(int4 keys require int4 values; the supported mixed mode "
                "is int8 keys + int4 values: self_kv_bits=8, self_kv_vbits=4)"
            )

    def replace(self, **kw) -> "Compute":
        return dataclasses.replace(self, **kw)

    @property
    def use_pallas(self) -> bool:
        if self.backend is KernelBackend.PALLAS:
            return True
        if self.backend is KernelBackend.XLA:
            return False
        return jax.default_backend() not in ("cpu",)
