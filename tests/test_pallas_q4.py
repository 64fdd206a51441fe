"""Pallas fused Q4 matmul vs the XLA/numpy oracles (interpret mode on CPU).

Mirrors the reference's fused-kernel tier (src/gguf/tests.rs:370-480,
604-655): decode- and prefill-shaped matmuls at Whisper dims, batched
inputs, against a dequantize-then-matmul oracle, tolerance 1e-2 at
1280-dim shapes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.gguf.repack import repack_f32
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend
from whisper_burn_tpu.ops.pallas_q4 import q4_matmul_pallas
from whisper_burn_tpu.ops.q4_matmul import q4_matmul_xla

COMPUTE = Compute.parity().replace(backend=KernelBackend.PALLAS)


def _setup(m, k, n, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k)).astype(np.float32) * scale
    w = rng.standard_normal((n, k)).astype(np.float32) * scale
    qt = repack_f32(w)
    return (
        jnp.asarray(x),
        jnp.asarray(qt.qw),
        jnp.asarray(qt.scales),
        x @ qt.dequantize(),  # numpy f64-ish oracle on dequantized weights
    )


@pytest.mark.parametrize(
    "m,k,n",
    [
        (1, 1280, 1280),  # decode GEMV (src/gguf/tests.rs:435)
        (10, 1280, 1280),  # small prefill (tests.rs:438)
        (8, 1280, 5120),  # fc1 decode shape
        (8, 5120, 1280),  # fc2 decode shape
        (128, 1280, 1280),  # encoder-ish tile
    ],
)
def test_kernel_matches_oracle(m, k, n):
    x, qw, sc, oracle = _setup(m, k, n)
    y = q4_matmul_pallas(x, qw, sc, COMPUTE, interpret=True)
    assert y is not None and y.shape == (m, n)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-2, rtol=1e-3)


def test_kernel_matches_xla_path_exactly():
    """Same dequant semantics as the XLA fallback (tight tolerance)."""
    x, qw, sc, _ = _setup(16, 1280, 1280, seed=3)
    y_pal = q4_matmul_pallas(x, qw, sc, COMPUTE, interpret=True)
    y_xla = q4_matmul_xla(x, qw, sc, COMPUTE)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla), atol=2e-5)


def test_batched_input_shapes():
    """[B, M, K] batch dims preserved (src/gguf/op.rs:47 contract)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 512)).astype(np.float32) * 0.1
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.1
    qt = repack_f32(w)
    y = q4_matmul_pallas(
        jnp.asarray(x), jnp.asarray(qt.qw), jnp.asarray(qt.scales), COMPUTE, interpret=True
    )
    assert y.shape == (4, 3, 256)
    oracle = x.reshape(-1, 512) @ qt.dequantize()
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, 256), oracle, atol=1e-2, rtol=1e-3
    )


def test_unpadded_n_dimension():
    """N not a tile multiple is padded internally and sliced back."""
    x, qw, sc, oracle = _setup(8, 512, 320, seed=5)
    y = q4_matmul_pallas(x, qw, sc, COMPUTE, interpret=True)
    assert y.shape == (8, 320)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-2, rtol=1e-3)


def test_declines_unsupported_k():
    x, qw, sc, _ = _setup(4, 64, 128)
    assert q4_matmul_pallas(x, qw, sc, COMPUTE, interpret=True) is None


def test_bf16_compute_close():
    x, qw, sc, oracle = _setup(32, 1280, 1280, seed=7)
    y = q4_matmul_pallas(x, qw, sc, Compute.fast(), interpret=True)
    rel = np.abs(np.asarray(y, np.float32) - oracle) / (np.abs(oracle).max() + 1e-9)
    assert rel.max() < 2e-2  # bf16 mantissa on dequantized weights
