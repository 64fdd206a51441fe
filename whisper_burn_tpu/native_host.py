"""ctypes bindings for the native host library (native/whisper_host.cpp).

The C++ library accelerates host-side data loading — WAV decode, polyphase
resampling, multithreaded Q4_0 repack — behind the same signatures as the
pure-Python implementations, which remain the fallback (and the oracle in
tests). Disable explicitly with ``WHISPER_TPU_NATIVE=0``.

Build once with ``make -C native``; the loader looks for
``native/libwhisper_host.so`` relative to the repo root.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parent.parent / "native" / "libwhisper_host.so",
]

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("WHISPER_TPU_NATIVE", "1") == "0":
        return None
    for path in _LIB_PATHS:
        if path.exists():
            try:
                lib = ctypes.CDLL(str(path))
            except OSError:
                continue
            lib.wh_repack_q4.restype = ctypes.c_int
            lib.wh_repack_q4.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.wh_load_wav.restype = ctypes.c_int64
            lib.wh_load_wav.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.wh_resample_poly.restype = ctypes.c_int64
            lib.wh_resample_poly.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
            ]
            if hasattr(lib, "wh_load_batch"):  # v2 library
                lib.wh_load_batch.restype = ctypes.c_int
                lib.wh_load_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int,
                ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def repack_q4_0(raw: bytes | np.ndarray, n_out: int, k_in: int):
    """Native Q4_0 unpack+transpose; returns (qw int8 [K,N], scales f32
    [K/32,N]) or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(raw, np.uint8) if not isinstance(raw, np.ndarray) else raw
    buf = np.ascontiguousarray(buf[: (n_out * k_in // 32) * 18])
    qw = np.empty((k_in, n_out), np.int8)
    scales = np.empty((k_in // 32, n_out), np.float32)
    rc = lib.wh_repack_q4(
        buf.ctypes.data, n_out, k_in, qw.ctypes.data, scales.ctypes.data, 0
    )
    if rc != 0:
        return None
    return qw, scales


def load_wav(path: str | Path):
    """Native WAV decode -> (float32 mono samples, sample_rate), or None."""
    lib = _load()
    if lib is None:
        return None
    rate = ctypes.c_int32(0)
    n = lib.wh_load_wav(str(path).encode(), None, 0, ctypes.byref(rate))
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    n2 = lib.wh_load_wav(str(path).encode(), out.ctypes.data, n, ctypes.byref(rate))
    if n2 != n:
        return None
    return out, int(rate.value)


def load_batch(paths: list[str | Path], target_samples: int):
    """Parallel native batch feeder: decode + resample-to-16k + pad/trim
    ``len(paths)`` WAVs into one ``[N, target_samples]`` f32 array (the
    mel-frontend input layout), multithreaded in C++. Returns
    ``(batch, statuses int32[N], lengths int64[N])`` — lengths are the
    pre-framing 16 kHz sample counts (true durations) — or None if the
    library is unavailable or lacks v2 symbols."""
    lib = _load()
    if lib is None or not hasattr(lib, "wh_load_batch"):
        return None
    n = len(paths)
    encoded = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    out = np.empty((n, target_samples), np.float32)
    statuses = np.zeros(n, np.int32)
    lengths = np.zeros(n, np.int64)
    lib.wh_load_batch(
        arr, n, target_samples, out.ctypes.data, statuses.ctypes.data,
        lengths.ctypes.data, 0,
    )
    return out, statuses, lengths


def resample_poly(samples: np.ndarray, up: int, down: int):
    """Native polyphase resample (Kaiser beta=5, scipy-compatible design),
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(samples, np.float32)
    n_out = lib.wh_resample_poly(x.ctypes.data, len(x), up, down, None, 0)
    if n_out < 0:
        return None
    out = np.empty(n_out, np.float32)
    rc = lib.wh_resample_poly(x.ctypes.data, len(x), up, down, out.ctypes.data, n_out)
    if rc != n_out:
        return None
    return out
