"""Experiments: self-attention decode kernel variants (VERDICT r2 item 1).

Baseline (ops/pallas_attention._kernel) measures 136.5 us/layer at B=64,
T=256, int8+scales — 37.6% of the HBM roofline (51.4 us SoL). Candidate
variants are timed with the roofline.py fori_loop harness and checked for
numerical agreement against the production kernel first.

Run: python scripts/exp_self_kernel.py [--only v1,v2,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import roofline
from roofline import HBM_GBPS, measure_roundtrip, timeit_loop

B, D, H, T, L = 64, 1280, 20, 256, 8
NEG_BIG = -1e30
H_PAD = 128
VALID = 200
ITERS = roofline.ITERS


# ---------------------------------------------------------------- variants
def _mk_kernel_v1(g, kt, single_pass, kt_value):
    """Parameterized variant of the production _kernel.

    single_pass: skip the flash recurrence when the whole T fits one tile
    (no acc/m/l init+merge read-modify-write).
    kt_value: transpose p in VMEM and contract values with an [HS, kt] @
    [kt, D] dot + head-mask collapse (the kT kernel's value path) instead
    of the emat broadcast dot + elementwise reduce.
    """
    HS = 32

    def kernel(scalar_ref, qmat_ref, emat_ref, hmask_ref, k_ref, v_ref, sc_ref,
               acc_ref, m_ref, l_ref, *, scale):
        t_step = pl.program_id(1)
        nt = pl.num_programs(1)
        if not single_pass:
            @pl.when(t_step == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)
                m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
                l_ref[...] = jnp.zeros_like(l_ref)

        valid = scalar_ref[1]
        j = jax.lax.broadcasted_iota(jnp.int32, (kt, 1), 0) + t_step * kt
        in_range = j < valid

        for i in range(g):
            qmat = qmat_ref[i]  # [D, H_PAD]
            k = k_ref[0, i].astype(qmat.dtype)
            v = v_ref[0, i].astype(qmat.dtype)
            s = jnp.dot(k, qmat, preferred_element_type=jnp.float32) * scale
            s = s * sc_ref[0, i, :, 0:1]
            s = jnp.where(in_range, s, NEG_BIG)

            if single_pass:
                m_new = jnp.max(s, axis=0, keepdims=True)
                p = jnp.where(in_range, jnp.exp(s - m_new), 0.0)
                l_ref[i] = jnp.sum(p, axis=0, keepdims=True)
                m_ref[i] = m_new
                p = p * sc_ref[0, i, :, 1:2]
                if kt_value:
                    pT = p.astype(v.dtype).T[:HS]  # [HS, kt] head rows
                    pv = jnp.dot(pT, v, preferred_element_type=jnp.float32)
                    acc_ref[i] = jnp.sum(
                        pv * hmask_ref[:], axis=0, keepdims=True
                    )
                else:
                    p_full = jnp.dot(
                        p.astype(v.dtype), emat_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[i] = jnp.sum(
                        p_full * v.astype(jnp.float32), axis=0, keepdims=True
                    )
            else:
                m_prev = m_ref[i]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
                p = jnp.where(in_range, jnp.exp(s - m_new), 0.0)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[i] = l_ref[i] * alpha + jnp.sum(p, axis=0, keepdims=True)
                m_ref[i] = m_new
                p = p * sc_ref[0, i, :, 1:2]
                p_full = jnp.dot(
                    p.astype(v.dtype), emat_ref[:],
                    preferred_element_type=jnp.float32,
                )
                pv = jnp.sum(p_full * v.astype(jnp.float32), axis=0, keepdims=True)
                alpha_full = jnp.dot(
                    alpha.astype(v.dtype), emat_ref[:],
                    preferred_element_type=jnp.float32,
                )
                acc_ref[i] = acc_ref[i] * alpha_full + pv

    return kernel


@functools.partial(jax.jit, static_argnames=("g", "kt", "single_pass", "kt_value"))
def _variant_call(q, k4, v4, sc4, scalars, *, g, kt, single_pass, kt_value):
    l_dim, _, t, d = k4.shape
    b = q.shape[0]
    dh = d // H
    scale = 1.0 / np.sqrt(dh)
    HS = 32

    head_of_d = np.arange(d) // dh
    dmask = head_of_d[:, None] == np.arange(H_PAD)[None, :]
    dmask_j = jnp.asarray(dmask, q.dtype)
    qmat = q.reshape(b, d, 1) * dmask_j[None]
    emat = dmask_j.T
    hmask = jnp.asarray(
        (head_of_d[None, :] == np.arange(HS)[:, None]), jnp.float32
    )

    kv_spec = pl.BlockSpec(
        (1, g, kt, d), lambda b, s, sc: (sc[0], b, s, 0), memory_space=pltpu.VMEM
    )
    sc_spec = pl.BlockSpec(
        (1, g, kt, 2), lambda b, s, sc: (sc[0], b, s, 0), memory_space=pltpu.VMEM
    )
    grid = (b // g, t // kt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, d, H_PAD), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H_PAD, d), lambda b, s, sc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HS, d), lambda b, s, sc: (0, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            sc_spec,
        ],
        out_specs=(
            pl.BlockSpec((g, 1, d), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, H_PAD), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, H_PAD), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    acc, m, l = pl.pallas_call(
        functools.partial(
            _mk_kernel_v1(g, kt, single_pass, kt_value), scale=scale
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, H_PAD), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, H_PAD), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scalars, qmat, emat, hmask, k4, v4, sc4)
    return acc, m[..., :H], l[..., :H]


def _data():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, (L, B, T, D)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, T, D)).astype(np.int8))
    sc = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, T, 2)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    return q, k, v, sc


def check(name, variant_kw):
    """Numerical agreement vs the production kernel on one call."""
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    q, k, v, sc = _data()
    scalars = jnp.asarray([2, VALID], jnp.int32)

    @jax.jit
    def ref(q, k, v, sc):
        return decode_attention_layer(
            q, k, v, jnp.asarray(2), jnp.asarray(VALID), H, kv_scale4=sc
        )

    @jax.jit
    def var(q, k, v, sc):
        return _variant_call(q, k, v, sc, scalars, **variant_kw)

    a0, m0, l0 = jax.tree.map(np.asarray, ref(q, k, v, sc))
    a1, m1, l1 = jax.tree.map(np.asarray, var(q, k, v, sc))
    out0 = a0 / np.repeat(l0, D // H, axis=-1)
    out1 = a1 / np.repeat(l1, D // H, axis=-1)
    err = np.max(np.abs(out0 - out1))
    print(f"  {name}: max|out-ref| = {err:.2e}", flush=True)
    assert err < 2e-2, err


def bench(name, variant_kw):
    q0, k, v, sc = _data()

    @jax.jit
    def run(q, k4, v4, sc4):
        def body(i, q):
            scalars = jnp.stack(
                [(i % L).astype(jnp.int32), jnp.asarray(VALID, jnp.int32)]
            )
            acc, m, l = _variant_call(q, k4, v4, sc4, scalars, **variant_kw)
            return (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)

        return jax.lax.fori_loop(0, ITERS, body, q)

    dt = timeit_loop(run, q0, k, v, sc)
    bytes_moved = B * T * (2 * D + 8)
    sol = bytes_moved / HBM_GBPS
    print(
        f"{name:28s} {dt*1e6:7.1f} us/layer  SoL {sol*1e6:6.1f}  "
        f"{bytes_moved/dt/1e9:5.0f} GB/s ({100*sol/dt:5.1f}%)",
        flush=True,
    )


VARIANTS = {
    "v0_repro": dict(g=8, kt=256, single_pass=False, kt_value=False),
    "v1_g16": dict(g=16, kt=256, single_pass=False, kt_value=False),
    "v2_single": dict(g=8, kt=256, single_pass=True, kt_value=False),
    "v3_ktval": dict(g=8, kt=256, single_pass=True, kt_value=True),
    "v4_all": dict(g=16, kt=256, single_pass=True, kt_value=True),
    "v5_g32": dict(g=32, kt=256, single_pass=True, kt_value=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from whisper_burn_tpu.transcribe import enable_compilation_cache

    enable_compilation_cache()
    roofline.ROUNDTRIP = measure_roundtrip()
    print(f"roundtrip {roofline.ROUNDTRIP*1e3:.2f} ms", flush=True)

    for name, kw in VARIANTS.items():
        if only is not None and name not in only:
            continue
        check(name, kw)
        bench(name, kw)


if __name__ == "__main__":
    main()
