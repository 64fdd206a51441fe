"""Per-kernel roofline accounting for the decode step (VERDICT r2 item 1).

Measures each decode-path component in isolation at the bench shapes
(B=64, Large-V3, int4 cross-KV / int8 self-KV serving config) and reports
achieved HBM bandwidth vs the ~819 GB/s v5e roofline.

Sync model (one rule for every harness, ADVICE r2 medium): chain iterations
through a data dependency, then fetch ONE host scalar; the tunnel roundtrip
is measured at runtime (repeated scalar fetch of a ready array), never a
hardcoded constant, and elapsed times are clamped+flagged if they dip under
the roundtrip.

Usage: python scripts/roofline.py [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

HBM_GBPS = 819e9  # v5e HBM bandwidth
B = 64
D = 1280
H = 20
L = 8  # layers chained per run() call (amortizes fetch); results are /L
T_CROSS = 1536
T_SELF = 256
F = 5120
VOCAB = 51872


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


def timeit(run, fetch, state, iters=20):
    """run: state -> state (device); fetch: state -> scalar. Returns s/iter."""
    state = run(state)
    float(fetch(state))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        state = run(state)
    float(fetch(state))
    dt = time.perf_counter() - t0 - ROUNDTRIP
    if dt <= 0:
        raise RuntimeError(
            f"elapsed {dt + ROUNDTRIP:.6f}s <= roundtrip {ROUNDTRIP:.6f}s — "
            "increase iters"
        )
    return dt / iters


def report(label, per_call, bytes_moved, rows):
    sol = bytes_moved / HBM_GBPS
    gbps = bytes_moved / per_call / 1e9
    pct = 100.0 * sol / per_call
    print(
        f"{label:34s} {per_call*1e6:8.1f} us   SoL {sol*1e6:7.1f} us   "
        f"{gbps:6.0f} GB/s  ({pct:5.1f}% of roofline)"
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


def bench_cross_kt_int4(rows):
    """The dominant stream: int4-packed cross-KV kT kernel, per layer."""
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_kT

    rng = np.random.default_rng(0)
    kT = jnp.asarray(rng.integers(0, 255, (L, B, D // 2, T_CROSS)).astype(np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (L, B, T_CROSS // 2, D)).astype(np.uint8))
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(q):
        for l in range(L):
            acc, m, lsum = decode_attention_kT(
                q, kT, v, jnp.asarray(l), jnp.asarray(T_CROSS), H
            )
            q = (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)
        return q

    dt = timeit(run, lambda q: jnp.sum(q), q0) / L
    bytes_moved = B * (D // 2 * T_CROSS + T_CROSS // 2 * D)
    report("cross kT int4  T=1536 /layer", dt, bytes_moved, rows)


def bench_cross_kt_int8(rows):
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_kT

    rng = np.random.default_rng(0)
    kT = jnp.asarray(rng.integers(-127, 127, (L, B, D, T_CROSS)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, T_CROSS, D)).astype(np.int8))
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(q):
        for l in range(L):
            acc, m, lsum = decode_attention_kT(
                q, kT, v, jnp.asarray(l), jnp.asarray(T_CROSS), H
            )
            q = (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)
        return q

    dt = timeit(run, lambda q: jnp.sum(q), q0) / L
    report("cross kT int8  T=1536 /layer", dt, 2 * B * T_CROSS * D, rows)


def bench_self_v1_int8(rows):
    """Self-attention decode kernel: int8 cache + per-token scales."""
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, (L, B, T_SELF, D)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, T_SELF, D)).astype(np.int8))
    sc = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, T_SELF, 2)).astype(np.float32))
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(q):
        for l in range(L):
            acc, m, lsum = decode_attention_layer(
                q, k, v, jnp.asarray(l), jnp.asarray(200), H, kv_scale4=sc
            )
            q = (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)
        return q

    dt = timeit(run, lambda q: jnp.sum(q), q0) / L
    bytes_moved = B * T_SELF * (2 * D + 8)
    report("self v1 int8   T=256  /layer", dt, bytes_moved, rows)


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
    def run(x):
        for _ in range(L):
            y = apply_linear(p, x, compute)
            x = (x + 1e-6 * y[..., :D]).astype(x.dtype)
        return x

    dt = timeit(run, lambda x: jnp.sum(x), x0) / L
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
    def run(x):
        for _ in range(L):
            y = fused_ffn_pallas(x, fc1, fc2, "tanh", compute)
            x = (x + 1e-6 * y).astype(x.dtype)
        return x

    dt = timeit(run, lambda x: jnp.sum(x), x0) / L
    bytes_moved = 2 * D * F + 2 * (D * F // 32) * 4
    report("ffn q4 fused   [1280<->5120]", dt, bytes_moved, rows)


def bench_logits(rows):
    """Tied-embedding logits matmul: [B,D] @ bf16 [D, V]."""
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((VOCAB, D)).astype(np.float32)).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(x):
        for _ in range(L):
            logits = jnp.matmul(x, emb.T, preferred_element_type=jnp.float32)
            x = (x + 1e-6 * logits[:, :D].astype(x.dtype)).astype(x.dtype)
        return x

    dt = timeit(run, lambda x: jnp.sum(x), x0) / L
    report("logits bf16    [1280->51872]", dt, VOCAB * D * 2, rows)


def bench_full_step(rows):
    """One full decode_step at the serving config (B=64, donated cache)."""
    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.decoder import decode_step, init_cache
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import prepare_params

    cfg = WhisperConfig.large_v3()
    compute = Compute.fastest(kv_bits=4)
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)
    cache = init_cache(cfg, B, compute, ctx=T_SELF)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(p, tok, cache):
        for i in range(4):
            logits, cache = decode_step(
                p, cfg, tok, jnp.asarray(100 + i), cache, compute
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, cache

    tok = jnp.full((B,), 50258, jnp.int32)
    tok, cache = run(params, tok, cache)
    float(jnp.sum(tok))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        tok, cache = run(params, tok, cache)
    float(jnp.sum(tok))
    dt = (time.perf_counter() - t0 - ROUNDTRIP) / iters / 4

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
        "--only", default=None, help="comma list: cross4,cross8,self,qkv,ffn,logits,step"
    )
    args = ap.parse_args()

    ROUNDTRIP = measure_roundtrip()
    print(f"measured sync roundtrip: {ROUNDTRIP*1e3:.2f} ms")

    rows: list[dict] = []
    benches = {
        "cross4": bench_cross_kt_int4,
        "cross8": bench_cross_kt_int8,
        "self": bench_self_v1_int8,
        "qkv": bench_qkv_matmul,
        "ffn": bench_ffn,
        "logits": bench_logits,
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
            json.dump({"roundtrip_ms": ROUNDTRIP * 1e3, "kernels": rows, "step": step}, f, indent=1)


if __name__ == "__main__":
    main()
