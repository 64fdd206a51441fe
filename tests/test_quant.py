"""Q4_0 block-math tests.

Port of the reference's CPU-only quantization tier
(src/gguf/tests.rs:191-273) plus round-trip properties.
"""

import numpy as np
import pytest

from whisper_burn_tpu.gguf import (
    Q4_BLOCK_BYTES,
    Q4_BLOCK_SIZE,
    dequantize_q4_0,
    q4_0_nbytes,
    quantize_q4_0,
)


def test_block_sizes():
    assert q4_0_nbytes(32) == Q4_BLOCK_BYTES
    assert q4_0_nbytes(1280 * 1280) == (1280 * 1280 // 32) * 18
    with pytest.raises(ValueError):
        q4_0_nbytes(33)


def test_q4_block_dequant_error_bound():
    """Per-block max abs error < 0.08 for unit-range data and < d/2 + f16 eps
    generally (src/gguf/tests.rs:222-226)."""
    rng = np.random.default_rng(0)
    values = rng.uniform(-1.0, 1.0, size=4096).astype(np.float32)
    raw = quantize_q4_0(values)
    deq = dequantize_q4_0(raw, values.size)
    max_diff = np.max(np.abs(deq - values))
    assert max_diff < 0.08, max_diff

    # generic bound: error <= d/2 (+ slack for the f16 scale rounding)
    blocks = values.reshape(-1, Q4_BLOCK_SIZE)
    d = np.abs(blocks).max(axis=1) / 7.0
    err = np.abs(deq.reshape(-1, Q4_BLOCK_SIZE) - blocks)
    assert np.all(err <= d[:, None] / 2 + 1e-2)


def test_q4_block_edge_cases():
    """Zero, uniform, and large-magnitude blocks (src/gguf/tests.rs:229-273)."""
    # all-zero block -> zero scale, zero output
    zeros = np.zeros(32, dtype=np.float32)
    assert np.array_equal(dequantize_q4_0(quantize_q4_0(zeros), 32), zeros)

    # uniform block: every value is +/- amax -> codes +/-7, exact d multiples
    uniform = np.full(32, 3.5, dtype=np.float32)
    deq = dequantize_q4_0(quantize_q4_0(uniform), 32)
    np.testing.assert_allclose(deq, uniform, rtol=1e-3)

    # large values survive the f16 scale (f16 max ~65504; d = amax/7)
    big = np.linspace(-30000, 30000, 32).astype(np.float32)
    deq = dequantize_q4_0(quantize_q4_0(big), 32)
    d = 30000 / 7.0
    assert np.max(np.abs(deq - big)) <= d / 2 + 30.0  # f16 scale rounding slack

    # exact grid values round-trip exactly: v = (q-8)*d for f16-exact d
    d16 = np.float32(np.float16(0.25))
    grid = (np.arange(32, dtype=np.float32) % 15 - 7) * d16
    deq = dequantize_q4_0(quantize_q4_0(grid), 32)
    np.testing.assert_array_equal(deq, grid)


def test_nibble_packing_order():
    """Byte i holds elem i (low nibble) and elem i+16 (high nibble)
    (src/gguf/shader.wgsl:82-88, scripts/convert_whisper.py:64-69)."""
    values = np.zeros(32, dtype=np.float32)
    values[0] = 7.0  # elem 0 -> code 15 -> low nibble of byte 0
    values[16] = -7.0  # elem 16 -> code 1 -> high nibble of byte 0
    raw = np.frombuffer(quantize_q4_0(values), dtype=np.uint8)
    assert raw[2] & 0x0F == 15
    assert raw[2] >> 4 == 1
    # scale bytes are f16 LE of 1.0
    assert raw[:2].copy().view(np.float16)[0] == np.float16(1.0)


def test_quantize_rounding_matches_numpy_round():
    """Codes use round-half-to-even via np.round with the full-precision d
    (scripts/convert_whisper.py:58-62)."""
    # d = 7/7 = 1.0 -> values at .5 boundaries expose the rounding mode
    values = np.array([7.0, 0.5, 1.5, 2.5, -0.5, -1.5] + [0.0] * 26, dtype=np.float32)
    raw = quantize_q4_0(values)
    deq = dequantize_q4_0(raw, 32)
    np.testing.assert_array_equal(
        deq[:6], np.array([7.0, 0.0, 2.0, 2.0, 0.0, -2.0], dtype=np.float32)
    )


def test_multi_block_roundtrip_error():
    """Quantization error < 0.1 on [-1, 1] data (src/gguf/tests.rs:662-706)."""
    rng = np.random.default_rng(42)
    values = rng.standard_normal(64 * 32).astype(np.float32) * 0.3
    deq = dequantize_q4_0(quantize_q4_0(values), values.size)
    assert np.max(np.abs(deq - values)) < 0.1
