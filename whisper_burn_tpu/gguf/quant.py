"""Q4_0 block quantization in vectorized numpy.

Format contract (reference: src/gguf/shader.wgsl:7-21,
scripts/convert_whisper.py:33-74, src/gguf/tensor.rs:96-109):

* 32 float values per block -> 18 bytes:
  - bytes 0..2 : IEEE f16 little-endian scale ``d`` where ``d = absmax / 7``
  - bytes 2..18: 16 nibble bytes; byte ``i`` holds element ``i`` in its low
    nibble and element ``i + 16`` in its high nibble
* quantize: ``q = round(v / d) + 8`` (numpy round-half-to-even, matching the
  converter; division uses the full-precision ``d`` while storage rounds the
  scale through f16 — quantize/dequantize are intentionally asymmetric
  exactly like the reference converter)
* dequantize: ``v = (q - 8) * float32(f16(d))``
"""

from __future__ import annotations

import numpy as np

Q4_BLOCK_SIZE = 32
Q4_BLOCK_BYTES = 18  # 2-byte f16 scale + 16 nibble bytes


def q4_0_nbytes(n_elements: int) -> int:
    """Byte size of a Q4_0 buffer holding ``n_elements`` values.

    Reference: src/gguf/reader.rs:42-47 (``(n/32)*18``).
    """
    if n_elements % Q4_BLOCK_SIZE != 0:
        raise ValueError(
            f"Q4_0 element count {n_elements} not divisible by {Q4_BLOCK_SIZE}"
        )
    return (n_elements // Q4_BLOCK_SIZE) * Q4_BLOCK_BYTES


def quantize_q4_0(values: np.ndarray) -> bytes:
    """Quantize a float array to Q4_0 bytes (row-major flattening).

    Vectorized equivalent of the reference converter's per-block loop
    (scripts/convert_whisper.py:33-74). The element count must be a multiple
    of 32.
    """
    flat = np.ascontiguousarray(values, dtype=np.float32).reshape(-1)
    n = flat.size
    nbytes = q4_0_nbytes(n)  # validates divisibility
    n_blocks = n // Q4_BLOCK_SIZE

    blocks = flat.reshape(n_blocks, Q4_BLOCK_SIZE).astype(np.float64)
    amax = np.max(np.abs(blocks), axis=1)  # [n_blocks]
    d = np.where(amax > 0, amax / 7.0, 0.0)  # full-precision scale

    # q = round(v / d) + 8 with numpy banker's rounding; d == 0 -> all zeros
    safe_d = np.where(d > 0, d, 1.0)
    q = np.where(
        (d > 0)[:, None],
        np.round(blocks / safe_d[:, None]),
        0.0,
    ).astype(np.int64)
    q = (q + 8) & 0x0F  # 4-bit wraparound, matching `int(...) & 0x0F`

    lo = q[:, :16].astype(np.uint8)
    hi = q[:, 16:].astype(np.uint8)
    nibbles = (lo | (hi << 4)).astype(np.uint8)  # [n_blocks, 16]

    out = np.empty((n_blocks, Q4_BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = (
        d.astype(np.float16).view(np.uint8).reshape(n_blocks, 2)
    )  # f16 LE scale
    out[:, 2:] = nibbles
    assert out.nbytes == nbytes
    return out.tobytes()


def unpack_q4_0(raw: bytes | np.ndarray, n_elements: int) -> tuple[np.ndarray, np.ndarray]:
    """Unpack Q4_0 bytes into integer codes and per-block scales.

    Returns ``(q, d)`` where ``q`` is ``int8[n_elements]`` holding the
    centered codes ``nibble - 8`` in [-8, 7] and ``d`` is
    ``float32[n_elements // 32]`` holding the f16-exact block scales.
    """
    nbytes = q4_0_nbytes(n_elements)
    buf = np.frombuffer(raw, dtype=np.uint8, count=nbytes) if not isinstance(
        raw, np.ndarray
    ) else raw[:nbytes]
    n_blocks = n_elements // Q4_BLOCK_SIZE
    blocks = buf.reshape(n_blocks, Q4_BLOCK_BYTES)

    d = blocks[:, :2].copy().view(np.float16).reshape(n_blocks).astype(np.float32)
    nib = blocks[:, 2:]
    lo = (nib & 0x0F).astype(np.int8) - 8
    hi = (nib >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).reshape(-1)  # elem i then i+16
    return q, d


def dequantize_q4_0(raw: bytes | np.ndarray, n_elements: int) -> np.ndarray:
    """Dequantize Q4_0 bytes back to float32.

    CPU oracle matching the reference's test-side dequantizer
    (src/gguf/tensor.rs:96-109, src/gguf/tests.rs:60-87):
    ``v = (nibble - 8) * d`` with ``d`` widened from f16.
    """
    q, d = unpack_q4_0(raw, n_elements)
    return (
        q.reshape(-1, Q4_BLOCK_SIZE).astype(np.float32) * d[:, None]
    ).reshape(-1)
