"""TPU compute ops: fused quantized matmul, linear application, attention.

This is the L1 kernel layer — the TPU-native rebirth of the reference's
src/gguf/{op.rs, linear.rs, shader.wgsl}. The Pallas kernels live here; an
XLA fallback path (dequant + dot, fully fused by the compiler) covers CPU
tests and shapes the kernels don't handle.
"""

from whisper_burn_tpu.ops.compute import Compute
from whisper_burn_tpu.ops.linear import (
    apply_ffn,
    apply_linear,
    apply_reduce_linear,
    cross_kv_proj,
    qkv_proj,
)
from whisper_burn_tpu.ops.q4_matmul import q4_matmul

__all__ = [
    "Compute",
    "apply_linear",
    "apply_reduce_linear",
    "apply_ffn",
    "qkv_proj",
    "cross_kv_proj",
    "q4_matmul",
]
