"""GGUF container tests: in-memory synthetic blobs, parse + round-trip.

Follows the reference's fixture pattern — build GGUF byte blobs in memory
and parse them without touching disk (src/gguf/tests.rs:90-163, 280-324) —
using our own writer as the blob builder, which also pins writer/reader
byte-format agreement against the converter contract.
"""

import numpy as np
import pytest

from whisper_burn_tpu.gguf import (
    GgmlDtype,
    GgufReader,
    GgufWriter,
    dequantize_q4_0,
    quantize_q4_0,
    repack_q4_0,
)
from whisper_burn_tpu.gguf.repack import repack_f32


def _minimal_gguf() -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(7)
    data = rng.standard_normal((4, 64)).astype(np.float32)
    w = GgufWriter()
    w.add_string("general.architecture", "whisper")
    w.add_u32("whisper.encoder.layer_count", 2)
    w.add_tensor("test.weight", data, quantize=True)
    return w.to_bytes(), data


def test_parse_header_and_index():
    blob, data = _minimal_gguf()
    r = GgufReader.from_bytes(blob)
    assert r.version == 3
    assert r.metadata["general.architecture"] == "whisper"
    assert r.metadata["whisper.encoder.layer_count"] == 2
    info = r.tensor_info("test.weight")
    assert info.shape == (4, 64)  # logical; stored reversed
    assert info.gguf_dims == (64, 4)
    assert info.dtype is GgmlDtype.Q4_0
    assert r.data_start % 32 == 0
    assert info.offset % 32 == 0


def test_tensor_data_roundtrip():
    blob, data = _minimal_gguf()
    r = GgufReader.from_bytes(blob)
    raw = r.tensor_data("test.weight")
    assert raw == quantize_q4_0(data)
    deq = r.tensor_f32("test.weight")
    assert deq.shape == (4, 64)
    np.testing.assert_array_equal(
        deq.reshape(-1), dequantize_q4_0(quantize_q4_0(data), data.size)
    )


def test_multiple_tensors_alignment_and_dtypes():
    """Multi-tensor blob: offsets aligned, all dtypes byte-exact
    (src/gguf/tests.rs:305-324)."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 32)).astype(np.float32)
    b = rng.standard_normal(17).astype(np.float32)  # odd length -> padding
    c = rng.standard_normal((2, 3, 64)).astype(np.float32)
    w = GgufWriter()
    w.add_tensor("a", a, quantize=True)
    w.add_tensor("b", b)
    w.add_raw_tensor("c", c.shape, GgmlDtype.F16, c.astype("<f2").tobytes())

    r = GgufReader.from_bytes(w.to_bytes())
    assert set(r.tensors) == {"a", "b", "c"}
    for name in r.tensors:
        assert r.tensor_info(name).offset % 32 == 0
    np.testing.assert_array_equal(r.tensor_f32("b"), b)
    np.testing.assert_array_equal(r.tensor_f32("c"), c.astype(np.float16).astype(np.float32))
    assert r.tensor_info("c").shape == (2, 3, 64)
    assert r.tensor_data("a") == quantize_q4_0(a)


def test_reader_rejects_garbage():
    with pytest.raises(ValueError):
        GgufReader.from_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        # right magic, wrong version
        GgufReader.from_bytes(b"GGUF" + (99).to_bytes(4, "little") + b"\x00" * 16)


def test_file_backed_reader(tmp_path):
    blob, data = _minimal_gguf()
    p = tmp_path / "model.gguf"
    p.write_bytes(blob)
    r = GgufReader.open(p)
    np.testing.assert_array_equal(
        r.tensor_f32("test.weight"),
        GgufReader.from_bytes(blob).tensor_f32("test.weight"),
    )


def test_repack_matches_block_dequant():
    """Repacked int8+scales reconstruct exactly the reference dequant
    (src/gguf/tensor.rs:96-109 semantics, transposed to [K, N])."""
    rng = np.random.default_rng(11)
    n_out, k_in = 24, 96
    w_f32 = rng.standard_normal((n_out, k_in)).astype(np.float32)
    raw = quantize_q4_0(w_f32)
    qt = repack_q4_0(raw, n_out, k_in)
    assert qt.qw.shape == (k_in, n_out)
    assert qt.qw.dtype == np.int8
    assert qt.scales.shape == (k_in // 32, n_out)
    oracle = dequantize_q4_0(raw, n_out * k_in).reshape(n_out, k_in)
    np.testing.assert_array_equal(qt.dequantize(), oracle.T)
    # codes live in [-8, 7]
    assert qt.qw.min() >= -8 and qt.qw.max() <= 7
    # scales are f16-exact
    np.testing.assert_array_equal(
        qt.scales, qt.scales.astype(np.float16).astype(np.float32)
    )


def test_repack_f32_helper():
    rng = np.random.default_rng(13)
    w = rng.standard_normal((16, 64)).astype(np.float32)
    qt = repack_f32(w)
    err = np.abs(qt.dequantize().T - w).max()
    assert err < 0.1 * np.abs(w).max()
