"""GGUF v3 writer (converter-compatible output).

Produces containers byte-compatible with the reference converter
(scripts/convert_whisper.py:99-217): v3 header, typed metadata KVs, tensor
index with reversed dims, 32-byte-aligned per-tensor offsets, and a data
section starting on a 32-byte boundary after the index.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from whisper_burn_tpu.gguf.quant import quantize_q4_0
from whisper_burn_tpu.gguf.reader import DEFAULT_ALIGNMENT, GGUF_MAGIC, GgmlDtype

_TYPE_U32 = 4
_TYPE_F32 = 6
_TYPE_BOOL = 7
_TYPE_STRING = 8
_TYPE_U64 = 10


@dataclass
class _Entry:
    name: str
    gguf_dims: tuple[int, ...]
    dtype: GgmlDtype
    offset: int
    data: bytes


class GgufWriter:
    """Accumulate tensors + metadata, then serialize a GGUF v3 blob."""

    def __init__(self, alignment: int = DEFAULT_ALIGNMENT):
        self.alignment = alignment
        self._metadata: list[tuple[str, int, object]] = []
        self._entries: list[_Entry] = []
        self._offset = 0

    # -- metadata ----------------------------------------------------------

    def add_string(self, key: str, value: str) -> None:
        self._metadata.append((key, _TYPE_STRING, value))

    def add_u32(self, key: str, value: int) -> None:
        self._metadata.append((key, _TYPE_U32, value))

    def add_u64(self, key: str, value: int) -> None:
        self._metadata.append((key, _TYPE_U64, value))

    def add_f32(self, key: str, value: float) -> None:
        self._metadata.append((key, _TYPE_F32, value))

    def add_bool(self, key: str, value: bool) -> None:
        self._metadata.append((key, _TYPE_BOOL, value))

    # -- tensors -----------------------------------------------------------

    def add_tensor(self, name: str, array: np.ndarray, quantize: bool = False) -> None:
        """Add a tensor; ``quantize=True`` stores Q4_0, else F32.

        Dims are stored reversed (innermost-first) per GGUF convention
        (scripts/convert_whisper.py:161); the per-tensor offset is aligned
        (:163-174).
        """
        array = np.ascontiguousarray(array, dtype=np.float32)
        if quantize:
            data = quantize_q4_0(array)
            dtype = GgmlDtype.Q4_0
        else:
            data = array.astype("<f4").tobytes()
            dtype = GgmlDtype.F32
        offset = _align_up(self._offset, self.alignment)
        self._entries.append(
            _Entry(name, tuple(reversed(array.shape)), dtype, offset, data)
        )
        self._offset = offset + len(data)

    def add_raw_tensor(
        self, name: str, shape: tuple[int, ...], dtype: GgmlDtype, data: bytes
    ) -> None:
        """Add pre-encoded tensor bytes with a logical row-major ``shape``."""
        offset = _align_up(self._offset, self.alignment)
        self._entries.append(_Entry(name, tuple(reversed(shape)), dtype, offset, data))
        self._offset = offset + len(data)

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += struct.pack("<IIQQ", GGUF_MAGIC, 3, len(self._entries), len(self._metadata))

        for key, vtype, value in self._metadata:
            out += _pack_string(key)
            out += struct.pack("<I", vtype)
            if vtype == _TYPE_STRING:
                out += _pack_string(value)  # type: ignore[arg-type]
            elif vtype == _TYPE_U32:
                out += struct.pack("<I", value)
            elif vtype == _TYPE_U64:
                out += struct.pack("<Q", value)
            elif vtype == _TYPE_F32:
                out += struct.pack("<f", value)
            elif vtype == _TYPE_BOOL:
                out += struct.pack("<B", 1 if value else 0)
            else:  # pragma: no cover - guarded by add_* methods
                raise ValueError(f"unsupported metadata type {vtype}")

        for e in self._entries:
            out += _pack_string(e.name)
            out += struct.pack("<I", len(e.gguf_dims))
            out += struct.pack(f"<{len(e.gguf_dims)}Q", *e.gguf_dims)
            out += struct.pack("<IQ", int(e.dtype), e.offset)

        data_start = _align_up(len(out), self.alignment)
        out += b"\x00" * (data_start - len(out))
        for e in self._entries:
            pos = data_start + e.offset
            out += b"\x00" * (pos - len(out))
            out += e.data
        return bytes(out)

    def write(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(self.to_bytes())


def _align_up(offset: int, alignment: int) -> int:
    return (offset + alignment - 1) // alignment * alignment


def _pack_string(s: str) -> bytes:
    encoded = s.encode("utf-8")
    return struct.pack("<Q", len(encoded)) + encoded
