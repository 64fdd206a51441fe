"""Encoder-attention MXU experiments (r5): head-pair packing vs int8.

The encoder attention runs per-head [T,64]x[64,T] score dots — K=64
half-fills the 128-deep MXU, the documented "dh=64 ceiling" (README r4).
VERDICT r4 weak #6 asks for the head-PAIR experiment: two heads in one
128-wide contraction with a block-diagonal key layout. The FLOP algebra
says it cannot win — K_wide = [[k0,0],[0,k1]] [2T,128] makes the score
dot [T,128]x[128,2T], whose T*2T*128 MACs equal the two naive dots'
2*T*T*64 *including the zero half* — the MXU streams the same MAC count
either way, so packing buys bandwidth-free zeros, not speed. This script
MEASURES that (and the padded-K variant), plus the lever that does
change the arithmetic: int8 scores (the MXU's int8 mode doubles
MAC/cycle, so K=64 int8 streams at the K=128 bf16 rate).

Usage: python scripts/exp_encoder_attn.py [--t 1536] [--reps 200]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_call(fn, *args, reps=200):
    fn(*args).block_until_ready()

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(i, acc):
            # thread the carry into the first operand so XLA cannot hoist
            # the (otherwise loop-invariant) kernel call out of the loop
            perturbed = (a[0] + (acc * 0).astype(a[0].dtype),) + a[1:]
            return acc + jnp.sum(fn(*perturbed))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(8, *args))
    float(loop(reps, *args))
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.time(); float(loop(8, *args)); t1s.append(time.time() - t0)
        t0 = time.time(); float(loop(reps, *args)); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (reps - 8) * 1e6


def scores_single(q, k, h):
    """h per-head [T,dh] NT dots — the production form (grid over heads)."""
    t = q.shape[1]

    def kern(q_ref, k_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = jnp.sum(s)

    spec = pl.BlockSpec((1, t, 64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(h,), in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(q, k)


def scores_paired(q2, kwide, hp):
    """hp paired dots: [T,128] x [2T,128]^T (block-diagonal keys)."""
    t = q2.shape[1]

    def kern(q_ref, k_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = jnp.sum(s)

    return pl.pallas_call(
        kern, grid=(hp,),
        in_specs=[
            pl.BlockSpec((1, t, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q2, kwide)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1536)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()
    t, h = args.t, args.heads
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.standard_normal((h, t, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((h, t, 64)), jnp.bfloat16)
    us_single = _time_call(lambda a, b: scores_single(a, b, h), q, k, reps=args.reps)

    # block-diagonal pairing: q2[i] = [q(2i) | q(2i+1)] [T, 128];
    # kwide[i] = [[k(2i), 0], [0, k(2i+1)]] [2T, 128]
    q2 = jnp.concatenate(
        [q.reshape(h // 2, 2, t, 64)[:, 0], q.reshape(h // 2, 2, t, 64)[:, 1]],
        axis=-1,
    )
    z = jnp.zeros((h // 2, t, 64), jnp.bfloat16)
    k_even, k_odd = k.reshape(h // 2, 2, t, 64)[:, 0], k.reshape(h // 2, 2, t, 64)[:, 1]
    kwide = jnp.concatenate(
        [
            jnp.concatenate([k_even, z], axis=-1),
            jnp.concatenate([z, k_odd], axis=-1),
        ],
        axis=1,
    )  # [h/2, 2T, 128]
    us_paired = _time_call(lambda a, b: scores_paired(a, b, h // 2), q2, kwide, reps=args.reps)

    # int8: same per-head form, int8 operands, s32 accumulate
    qi = jnp.asarray(rng.integers(-127, 127, (h, t, 64)), jnp.int8)
    ki = jnp.asarray(rng.integers(-127, 127, (h, t, 64)), jnp.int8)

    def scores_int8(q, k, h):
        t = q.shape[1]

        def kern(q_ref, k_ref, o_ref):
            s = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_ref[0, 0] = jnp.sum(s).astype(jnp.float32)

        spec = pl.BlockSpec((1, t, 64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(h,), in_specs=[spec, spec],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(q, k)

    us_int8 = _time_call(lambda a, b: scores_int8(a, b, h), qi, ki, reps=args.reps)

    flops = 2 * h * t * t * 64
    out = {
        "t": t,
        "heads": h,
        "scores_bf16_per_head_us": round(us_single, 1),
        "scores_paired_blockdiag_us": round(us_paired, 1),
        "scores_int8_us": round(us_int8, 1),
        "bf16_tflops": round(flops / us_single / 1e6, 1),
        "paired_tflops_useful": round(flops / us_paired / 1e6, 1),
        "int8_tops": round(flops / us_int8 / 1e6, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
