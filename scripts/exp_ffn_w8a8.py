"""Experiment: decode-step FFN via XLA int8 W8A8 vs the fused Q4 kernel.

The fused Pallas FFN dequantizes 13.1M int8 weights to bf16 in VMEM every
step (ops/pallas_ffn.py) — the convert+scale VPU work is what holds it at
~62% of the HBM roofline. The W8A8 route moves the dequant to the
[M, N] OUTPUT (64 x 5120 = 0.33M elements, 40x less): activations
quantize per-row to int8, the contraction runs on XLA's native int8 MXU
path (which Mosaic cannot emit — see ops/linear.py note), and the rank-1
row_scale x col_scale dequant applies after. Accuracy-wise this is the
same double-quantization the accuracy sweep's q4_w8a8 row bounds for the
encoder (0.949 agreement at real dims).

Run: python scripts/exp_ffn_w8a8.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import roofline
from roofline import HBM_GBPS, measure_roundtrip, timeit_loop

B, D, F = 64, 1280, 5120
ITERS = 256


def _q4(rng, k, n):
    from whisper_burn_tpu.models.params import _fab_linear

    return {kk: jnp.asarray(vv) for kk, vv in _fab_linear(rng, k, n, bias=True).items()}


def _w8(p):
    from whisper_burn_tpu.models.params import _w8_from_q4

    qw8, s8 = _w8_from_q4(np.asarray(p["qw"]), np.asarray(p["scales"]))
    return jnp.asarray(qw8), jnp.asarray(s8), p["b"]


def report(name, dt, bytes_moved):
    sol = bytes_moved / HBM_GBPS
    print(
        f"{name:32s} {dt*1e6:7.1f} us  SoL {sol*1e6:6.1f}  "
        f"{bytes_moved/dt/1e9:5.0f} GB/s ({100*sol/dt:5.1f}%)",
        flush=True,
    )


def main():
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.ops.pallas_ffn import _gelu, fused_ffn_pallas
    from whisper_burn_tpu.transcribe import enable_compilation_cache

    enable_compilation_cache()
    roofline.ROUNDTRIP = measure_roundtrip()
    print(f"roundtrip {roofline.ROUNDTRIP*1e3:.2f} ms", flush=True)

    compute = Compute.fastest(kv_bits=4)
    rng = np.random.default_rng(0)
    fc1 = _q4(rng, D, F)
    fc2 = _q4(rng, F, D)
    x0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w_bytes = D * F + F * D  # int8 codes both routes
    q4_bytes = w_bytes + w_bytes // 32 * 4  # + f32 group scales

    # --- baseline: fused Pallas Q4 kernel -------------------------------
    def run_fused(x, f1qw, f1sc, f1b, f2qw, f2sc, f2b):
        f1 = {"qw": f1qw, "scales": f1sc, "b": f1b}
        f2 = {"qw": f2qw, "scales": f2sc, "b": f2b}

        def body(k, x):
            y = fused_ffn_pallas(x, f1, f2, "tanh", compute)
            return (x + 1e-6 * y).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timeit_loop(
        run_fused, x0, fc1["qw"], fc1["scales"], fc1["b"], fc2["qw"],
        fc2["scales"], fc2["b"],
    )
    report("fused pallas q4 (baseline)", dt, q4_bytes)

    # --- W8A8: XLA int8 dot, dequant on the output ----------------------
    f1w8, f1s8, f1b = _w8(fc1)
    f2w8, f2s8, f2b = _w8(fc2)

    def int8_dot(x, qw8, s8):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.round(xf / xs).astype(jnp.int8)
        yi = jax.lax.dot_general(
            xq, qw8,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return yi.astype(jnp.float32) * xs * s8.astype(jnp.float32)

    def run_w8a8(x, f1w8, f1s8, f1b, f2w8, f2s8, f2b):
        def body(k, x):
            h = _gelu((int8_dot(x, f1w8, f1s8) + f1b).astype(jnp.bfloat16), "tanh")
            y = (int8_dot(h, f2w8, f2s8) + f2b).astype(jnp.bfloat16)
            return (x + 1e-6 * y).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timeit_loop(run_w8a8, x0, f1w8, f1s8, f1b, f2w8, f2s8, f2b)
    report("w8a8 xla int8 dot", dt, w_bytes)

    # --- numerics: relative error of the two routes vs f32 Q4 ------------
    def dq(p):
        return np.asarray(p["qw"], np.float32) * np.repeat(
            np.asarray(p["scales"], np.float32), 32, axis=0
        )

    xf = np.asarray(x0, np.float32)
    h = xf @ dq(fc1) + np.asarray(fc1["b"])
    h = np.asarray(_gelu(jnp.asarray(h), "tanh"))
    ref = h @ dq(fc2) + np.asarray(fc2["b"])

    y_fused = np.asarray(
        fused_ffn_pallas(x0, fc1, fc2, "tanh", compute), np.float32
    )
    y_w8 = np.asarray(
        (
            int8_dot(
                _gelu(
                    (int8_dot(x0, f1w8, f1s8) + fc1["b"]).astype(jnp.bfloat16), "tanh"
                ),
                f2w8, f2s8,
            )
            + fc2["b"]
        ),
        np.float32,
    )
    scale = np.abs(ref).max()
    print(f"rel err fused: {np.abs(y_fused - ref).max()/scale:.2e}")
    print(f"rel err w8a8 : {np.abs(y_w8 - ref).max()/scale:.2e}")


if __name__ == "__main__":
    main()
