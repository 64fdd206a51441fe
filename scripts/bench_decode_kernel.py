"""Microbench: flash-decode attention kernel, one layer, bench shapes.

Timing rule for the tunneled backend: chain iterations through a data
dependency and fetch one scalar at the end (block_until_ready alone is
not a reliable sync), subtracting the ~25 ms tunnel roundtrip.

Cross: B=64, T=1536, D=1280, int8 cache -> DMA SoL = 2*64*1536*1280 B
/ 819 GB/s = 0.307 ms/layer. Self: T=256 bf16 -> 0.205 ms/layer.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

B, D, H = 64, 1280, 20
L = 8
ROUNDTRIP = 0.0252


def bench(t, dtype, label, iters=20):
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, (L, B, t, D)).astype(np.int8))
    if dtype != jnp.int8:
        k = (k.astype(jnp.float32) / 127.0).astype(dtype)
    v = k
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def run(q, k, v):
        # chain layers: next layer's query depends on previous output
        for l in range(L):
            acc, m, lsum = decode_attention_layer(
                q, k, v, jnp.asarray(l), jnp.asarray(t), H
            )
            q = (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)
        return q

    fetch = jax.jit(lambda q: jnp.sum(q))
    q = run(q0, k, v)
    _ = float(fetch(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(q, k, v)
    _ = float(fetch(q))
    dt = (time.perf_counter() - t0 - ROUNDTRIP) / iters / L
    bytes_moved = 2 * B * t * D * k.dtype.itemsize
    sol = bytes_moved / 819e9
    print(
        f"{label}: {dt*1e6:7.1f} us/layer  SoL {sol*1e6:7.1f} us  "
        f"({bytes_moved/dt/1e9:.0f} GB/s achieved)"
    )




def bench_kt(t, dtype, label, iters=20):
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_kT

    rng = np.random.default_rng(0)
    kT = jnp.asarray(rng.integers(-127, 127, (L, B, D, t)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, t, D)).astype(np.int8))
    if dtype != jnp.int8:
        kT = (kT.astype(jnp.float32) / 127.0).astype(dtype)
        v = (v.astype(jnp.float32) / 127.0).astype(dtype)
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def run(q, kT, v):
        for l in range(L):
            acc, m, lsum = decode_attention_kT(
                q, kT, v, jnp.asarray(l), jnp.asarray(t), H
            )
            q = (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)
        return q

    fetch = jax.jit(lambda q: jnp.sum(q))
    q = run(q0, kT, v)
    _ = float(fetch(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(q, kT, v)
    _ = float(fetch(q))
    dt = (time.perf_counter() - t0 - ROUNDTRIP) / iters / L
    bytes_moved = 2 * B * t * D * kT.dtype.itemsize
    sol = bytes_moved / 819e9
    print(
        f"{label}: {dt*1e6:7.1f} us/layer  SoL {sol*1e6:7.1f} us  "
        f"({bytes_moved/dt/1e9:.0f} GB/s achieved)"
    )


if __name__ == "__main__":
    bench(1536, jnp.int8, "v1 cross int8 T=1536")
    bench(256, jnp.bfloat16, "v1 self  bf16 T= 256")
    bench_kt(1536, jnp.int8, "v2 cross int8 T=1536")
    bench_kt(256, jnp.bfloat16, "v2 self  bf16 T= 256")
    bench_kt(256, jnp.int8, "v2 self  int8 T= 256")
