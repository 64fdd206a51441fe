"""Per-kernel roofline accounting for the decode step (VERDICT r2 item 1).

Measures each decode-path component in isolation at the bench shapes
(B=64, Large-V3, int4 cross-KV / int8 self-KV serving config) and reports
achieved HBM bandwidth vs the ~819 GB/s v5e roofline.

Timing rules for the tunneled backend (one set of rules for EVERY harness
in this repo — bench.py, ablate_step.py, this file; ADVICE r2):

* everything under test lives in ONE jit program with the iteration loop
  as an in-graph ``lax.fori_loop`` (eager per-call dispatch re-ships
  operand buffers through the tunnel — measured ~1.45 s/call with a 1 GB
  cache operand — and ``block_until_ready`` returns at enqueue);
* big arrays are passed as explicit jit arguments, never closed over
  (closure constants stall compilation at these sizes);
* the only sync is ONE host scalar fetch, and the dispatch+fetch
  roundtrip is MEASURED AT RUNTIME (never a hardcoded constant);
  elapsed <= roundtrip raises instead of going negative.

Usage: python scripts/roofline.py [--json out.json] [--only k1,k2]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_GBPS = 819e9  # v5e HBM bandwidth
B = 64
D = 1280
H = 20
L = 8  # distinct layers in the cache operands (layer index rotates)
T_CROSS = 1536
T_SELF = 256
F = 5120
VOCAB = 51872
ITERS = 256


def measure_roundtrip(n: int = 12) -> float:
    """Median dispatch+fetch latency of a trivial computed scalar — the
    fixed cost every timed loop pays exactly once at its final fetch."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    float(f(x))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


ROUNDTRIP = None  # measured in main()


def timeit_loop(run, *args, iters=ITERS):
    """``run(*args)`` = one jitted fori_loop of ``iters`` chained kernel
    calls returning a small array. Returns seconds per call."""
    out = run(*args)
    float(jnp.sum(out))  # compile + settle
    t0 = time.perf_counter()
    out = run(*args)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0 - ROUNDTRIP
    if dt <= 0:
        raise RuntimeError(
            f"elapsed {dt + ROUNDTRIP:.6f}s <= roundtrip {ROUNDTRIP:.6f}s"
        )
    return dt / iters


def report(label, per_call, bytes_moved, rows):
    sol = bytes_moved / HBM_GBPS
    gbps = bytes_moved / per_call / 1e9
    pct = 100.0 * sol / per_call
    print(
        f"{label:34s} {per_call*1e6:8.1f} us   SoL {sol*1e6:7.1f} us   "
        f"{gbps:6.0f} GB/s  ({pct:5.1f}% of roofline)",
        flush=True,
    )
    rows.append(
        {
            "kernel": label,
            "us": round(per_call * 1e6, 1),
            "sol_us": round(sol * 1e6, 1),
            "achieved_gbps": round(gbps, 1),
            "pct_roofline": round(pct, 1),
        }
    )


def _chain_attn(kernel, T, rows, label, bytes_moved, kT, v, scales=None):
    """Shared fori_loop harness for the decode-attention kernels."""

    @jax.jit
    def run(q, kT, v, *sc):
        def body(k, q):
            acc, m, lsum = kernel(q, kT, v, k % L, jnp.asarray(T), *sc)
            return (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)

        return jax.lax.fori_loop(0, ITERS, body, q)

    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    sc = (scales,) if scales is not None else ()
    dt = timeit_loop(run, q0, kT, v, *sc)
    report(label, dt, bytes_moved, rows)


def bench_cross_kt_int4(rows):
    """The dominant stream: int4-packed cross-KV kT kernel, per layer."""
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_kT

    rng = np.random.default_rng(0)
    kT = jnp.asarray(rng.integers(0, 255, (L, B, D // 2, T_CROSS)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (L, B, T_CROSS // 2, D)).astype(np.uint8))
    bytes_moved = B * (D // 2 * T_CROSS + T_CROSS // 2 * D)

    def kernel(q, kT, v, l, t):
        return decode_attention_kT(q, kT, v, l, t, H)

    _chain_attn(kernel, T_CROSS, rows, "cross kT int4  T=1536 /layer", bytes_moved, kT, v)


def bench_cross_kt_int8(rows):
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_kT

    rng = np.random.default_rng(0)
    kT = jnp.asarray(rng.integers(-127, 127, (L, B, D, T_CROSS)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, T_CROSS, D)).astype(np.int8))

    def kernel(q, kT, v, l, t):
        return decode_attention_kT(q, kT, v, l, t, H)

    _chain_attn(
        kernel, T_CROSS, rows, "cross kT int8  T=1536 /layer",
        2 * B * T_CROSS * D, kT, v,
    )


def bench_self_v1_int8(rows):
    """Self-attention decode kernel: int8 cache + per-token scales."""
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, (L, B, T_SELF, D)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, T_SELF, D)).astype(np.int8))
    sc = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, T_SELF, 2)).astype(np.float32))
    bytes_moved = B * T_SELF * (2 * D + 8)

    def kernel(q, k4, v4, l, t, sc4):
        return decode_attention_layer(q, k4, v4, l, t, H, kv_scale4=sc4)

    _chain_attn(kernel, 200, rows, "self v1 int8   T=256  /layer", bytes_moved, k, v, sc)


def bench_self_int4(rows):
    """int4-packed self cache: channel-pair nibbles + per-token scales."""
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 255, (L, B, T_SELF, D // 2)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (L, B, T_SELF, D // 2)).astype(np.uint8))
    sc = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, T_SELF, 2)).astype(np.float32))
    bytes_moved = B * T_SELF * (D + 8)

    def kernel(q, k4, v4, l, t, sc4):
        return decode_attention_layer(q, k4, v4, l, t, H, kv_scale4=sc4)

    _chain_attn(kernel, 200, rows, "self int4      T=256  /layer", bytes_moved, k, v, sc)


def bench_self_v1_bf16(rows):
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((L, B, T_SELF, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    v = k

    def kernel(q, k4, v4, l, t):
        return decode_attention_layer(q, k4, v4, l, t, H)

    _chain_attn(
        kernel, 200, rows, "self v1 bf16   T=256  /layer", 2 * B * T_SELF * D * 2, k, v
    )


def _q4_linear(rng, k, n):
    from whisper_burn_tpu.models.params import _fab_linear

    p = _fab_linear(rng, k, n, bias=True)
    return {kk: jnp.asarray(vv) for kk, vv in p.items()}


def bench_qkv_matmul(rows):
    """Fused QKV projection: [B,1,D] @ int8 [D, 3D]."""
    from whisper_burn_tpu.ops import Compute, apply_linear

    compute = Compute.fastest(kv_bits=4)
    rng = np.random.default_rng(0)
    p = _q4_linear(rng, D, 3 * D)
    x0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(x, qw, sc, b):
        pp = {"qw": qw, "scales": sc, "b": b}

        def body(k, x):
            y = apply_linear(pp, x, compute)
            return (x + 1e-6 * y[..., :D]).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timeit_loop(run, x0, p["qw"], p["scales"], p["b"])
    bytes_moved = D * 3 * D + (D // 32) * 3 * D * 4
    report("qkv q4 matmul  [1280->3840]", dt, bytes_moved, rows)


def bench_ffn(rows):
    """Fused FFN kernel: fc2(gelu(fc1 x)) at M=64."""
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.ops.pallas_ffn import fused_ffn_pallas

    compute = Compute.fastest(kv_bits=4)
    rng = np.random.default_rng(0)
    fc1 = _q4_linear(rng, D, F)
    fc2 = _q4_linear(rng, F, D)
    x0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(x, q1, s1, b1, q2, s2, b2):
        p1 = {"qw": q1, "scales": s1, "b": b1}
        p2 = {"qw": q2, "scales": s2, "b": b2}

        def body(k, x):
            y = fused_ffn_pallas(x, p1, p2, "tanh", compute)
            return (x + 1e-6 * y).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timeit_loop(run, x0, fc1["qw"], fc1["scales"], fc1["b"],
                     fc2["qw"], fc2["scales"], fc2["b"])
    bytes_moved = 2 * D * F + 2 * (D * F // 32) * 4
    report("ffn q4 fused   [1280<->5120]", dt, bytes_moved, rows)


def bench_logits(rows):
    """Tied-embedding logits matmul: [B,D] @ bf16 [D, V]."""
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((VOCAB, D)).astype(np.float32)).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(x, emb):
        def body(k, x):
            logits = jnp.matmul(x, emb.T, preferred_element_type=jnp.float32)
            return (x + 1e-6 * logits[:, :D].astype(x.dtype)).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timeit_loop(run, x0, emb)
    report("logits bf16    [1280->51872]", dt, VOCAB * D * 2, rows)


def bench_logits_q8(rows):
    """int8 tied-embedding logits via the Pallas q4 kernel."""
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.ops.q4_matmul import q4_matmul

    compute = Compute.fastest(kv_bits=4)
    rng = np.random.default_rng(0)
    # production layout: vocab pre-padded to the 512-wide N tile
    # (transcribe.quantize_logit_embedding), so the kernel never pads
    vp = -(-VOCAB // 512) * 512
    qw = jnp.asarray(
        rng.integers(-127, 127, (D, vp)).astype(np.int8)
    )
    sc = jnp.asarray(rng.uniform(1e-4, 2e-4, (D // 32, vp)).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(x, qw, sc):
        def body(k, x):
            logits = q4_matmul(x, qw, sc, compute)
            return (x + 1e-6 * logits[:, :D].astype(x.dtype)).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timeit_loop(run, x0, qw, sc)
    report("logits int8    [1280->51872]", dt, D * VOCAB + D * VOCAB // 32 * 4, rows)


def bench_full_step(rows):
    """Full decode_steps chained in-graph (ablate_step's harness)."""
    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.decoder import decode_step, init_cache
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import prepare_params

    iters = 32
    cfg = WhisperConfig.large_v3()
    compute = Compute.fastest(kv_bits=4)
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)
    cache = init_cache(cfg, B, compute, ctx=T_SELF)

    @jax.jit
    def run(p, tok, cache):
        def body(k, carry):
            tok, cache = carry
            logits, cache = decode_step(p, cfg, tok, 100 + k, cache, compute)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        tok, cache = jax.lax.fori_loop(0, iters, body, (tok, cache))
        return tok

    tok = jnp.full((B,), 50258, jnp.int32)
    out = run(params, tok, cache)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(params, tok, cache)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0 - ROUNDTRIP) / iters

    nl = cfg.n_text_layer
    w = (D * 3 * D + 3 * D * D + 2 * D * F) * nl
    sc = w // 32 * 4
    selfkv = B * T_SELF * (2 * D + 8) * nl
    cross = B * (D // 2 * T_CROSS + T_CROSS // 2 * D) * nl
    logit = VOCAB * D * 2
    report("FULL decode_step (per token)", dt, w + sc + selfkv + cross + logit, rows)
    return {
        "per_token_us": round(dt * 1e6, 1),
        "bytes_per_step": w + sc + selfkv + cross + logit,
        "breakdown_gb": {
            "weights_int8": round(w / 1e9, 3),
            "scales_f32": round(sc / 1e9, 3),
            "self_kv": round(selfkv / 1e9, 3),
            "cross_kv": round(cross / 1e9, 3),
            "logits_emb": round(logit / 1e9, 3),
        },
    }


def main():
    global ROUNDTRIP
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--only", default=None,
        help="comma list: cross4,cross8,self,selfbf16,qkv,ffn,logits,logitsq8,step",
    )
    args = ap.parse_args()

    from whisper_burn_tpu.transcribe import enable_compilation_cache

    enable_compilation_cache()
    ROUNDTRIP = measure_roundtrip()
    print(f"measured sync roundtrip: {ROUNDTRIP*1e3:.2f} ms", flush=True)

    rows: list[dict] = []
    benches = {
        "cross4": bench_cross_kt_int4,
        "cross8": bench_cross_kt_int8,
        "self": bench_self_v1_int8,
        "self4": bench_self_int4,
        "selfbf16": bench_self_v1_bf16,
        "qkv": bench_qkv_matmul,
        "ffn": bench_ffn,
        "logits": bench_logits,
        "logitsq8": bench_logits_q8,
    }
    only = set(args.only.split(",")) if args.only else None
    for name, fn in benches.items():
        if only is None or name in only:
            fn(rows)
    step = None
    if only is None or "step" in only:
        step = bench_full_step(rows)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"roundtrip_ms": ROUNDTRIP * 1e3, "kernels": rows, "step": step},
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
