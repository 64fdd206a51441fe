"""GGUF checkpoint layer: parse, write, quantize, and repack for TPU.

The reference implements this layer in Rust (src/gguf/reader.rs,
scripts/convert_whisper.py). Here it is pure numpy — it runs on the host
once at load time; the TPU-facing output is the repacked layout produced by
:mod:`whisper_burn_tpu.gguf.repack`.
"""

from whisper_burn_tpu.gguf.quant import (
    Q4_BLOCK_BYTES,
    Q4_BLOCK_SIZE,
    dequantize_q4_0,
    q4_0_nbytes,
    quantize_q4_0,
)
from whisper_burn_tpu.gguf.reader import GgmlDtype, GgufReader, GgufTensorInfo
from whisper_burn_tpu.gguf.repack import QuantizedTensor, repack_q4_0
from whisper_burn_tpu.gguf.writer import GgufWriter

__all__ = [
    "Q4_BLOCK_BYTES",
    "Q4_BLOCK_SIZE",
    "quantize_q4_0",
    "dequantize_q4_0",
    "q4_0_nbytes",
    "GgufReader",
    "GgufTensorInfo",
    "GgmlDtype",
    "GgufWriter",
    "QuantizedTensor",
    "repack_q4_0",
]
