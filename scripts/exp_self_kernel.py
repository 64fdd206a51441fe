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
def _mk_kernel_elide(g, kt, kt_value):
    """Valid-aware flash variant: dead cache tiles (t_step*kt >= valid) are
    re-mapped by the index_map to the last LIVE block, so consecutive grid
    steps present an unchanged block index and Mosaic elides the re-fetch —
    per-step traffic shrinks from the full T=256 window to ceil(valid/kt)
    tiles. Compute for dead tiles is skipped with pl.when."""
    HS = 32

    def kernel(scalar_ref, qmat_ref, emat_ref, hmask_ref, k_ref, v_ref, sc_ref,
               acc_ref, m_ref, l_ref, *, scale):
        t_step = pl.program_id(1)
        valid = scalar_ref[1]

        @pl.when(t_step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
            l_ref[...] = jnp.zeros_like(l_ref)

        @pl.when(t_step * kt < valid)
        def _():
            j = jax.lax.broadcasted_iota(jnp.int32, (kt, 1), 0) + t_step * kt
            in_range = j < valid
            for i in range(g):
                qmat = qmat_ref[i]  # [D, H_PAD]
                k = k_ref[0, i].astype(qmat.dtype)
                s = jnp.dot(k, qmat, preferred_element_type=jnp.float32) * scale
                s = s * sc_ref[0, i, :, 0:1]
                s = jnp.where(in_range, s, NEG_BIG)

                m_prev = m_ref[i]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
                p = jnp.where(in_range, jnp.exp(s - m_new), 0.0)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[i] = l_ref[i] * alpha + jnp.sum(p, axis=0, keepdims=True)
                m_ref[i] = m_new
                p = p * sc_ref[0, i, :, 1:2]
                v = v_ref[0, i].astype(qmat.dtype)
                if kt_value:
                    pT = p.astype(v.dtype).T[:HS]  # [HS, kt]
                    pv = jnp.dot(pT, v, preferred_element_type=jnp.float32)
                    pv = jnp.sum(pv * hmask_ref[:], axis=0, keepdims=True)
                    alpha_full = jnp.dot(
                        alpha.astype(emat_ref.dtype), emat_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[i] = acc_ref[i] * alpha_full + pv
                else:
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


@functools.partial(
    jax.jit, static_argnames=("g", "kt", "single_pass", "kt_value", "elide")
)
def _variant_call(q, k4, v4, sc4, scalars, *, g, kt, single_pass, kt_value,
                  elide=False):
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

    if elide:
        # clamp dead t-steps to the last live block: unchanged block index
        # between consecutive grid steps -> Mosaic skips the re-fetch
        def kv_idx(b, s, sc):
            return (sc[0], b, jnp.minimum(s, (sc[1] - 1) // kt), 0)
    else:
        def kv_idx(b, s, sc):
            return (sc[0], b, s, 0)
    kv_spec = pl.BlockSpec((1, g, kt, d), kv_idx, memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, g, kt, 2), kv_idx, memory_space=pltpu.VMEM)
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
    mk = (
        _mk_kernel_elide(g, kt, kt_value)
        if elide
        else _mk_kernel_v1(g, kt, single_pass, kt_value)
    )
    acc, m, l = pl.pallas_call(
        functools.partial(mk, scale=scale),
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


def bench(name, variant_kw, valid=VALID):
    q0, k, v, sc = _data()

    @jax.jit
    def run(q, k4, v4, sc4):
        def body(i, q):
            scalars = jnp.stack(
                [(i % L).astype(jnp.int32), jnp.asarray(valid, jnp.int32)]
            )
            acc, m, l = _variant_call(q, k4, v4, sc4, scalars, **variant_kw)
            return (q + 1e-6 * acc.astype(q.dtype)).astype(q.dtype)

        return jax.lax.fori_loop(0, ITERS, body, q)

    dt = timeit_loop(run, q0, k, v, sc)
    bytes_moved = B * T * (2 * D + 8)  # full-window bytes: elision beats "SoL"
    sol = bytes_moved / HBM_GBPS
    print(
        f"{name:20s} valid={valid:3d} {dt*1e6:7.1f} us/layer  SoL {sol*1e6:6.1f}  "
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
    "v6_elide64": dict(g=8, kt=64, single_pass=False, kt_value=False, elide=True),
    "v7_elide128": dict(g=8, kt=128, single_pass=False, kt_value=False, elide=True),
    "v8_elide64g16": dict(g=16, kt=64, single_pass=False, kt_value=False, elide=True),
    "v9_noelide64": dict(g=8, kt=64, single_pass=False, kt_value=False),
}


def _selfkt_call(q, kT4, v4, scT4, k_new, v_new, scalars, *, g):
    """Self-attention via the kT layout: K stored [L,B,D,T] (heads ride
    sublanes, scores are ONE [32,D]@[D,T] dot — no 128-lane head padding),
    V time-major [L,B,T,D], per-token K/V scales stored transposed
    [L,B,2,T]. The current token's K/V are flash-merged and the softmax
    normalized IN-KERNEL: the whole self-attention step is one pallas_call."""
    HS = 32
    l_dim, b_dim, d, t = kT4.shape
    b = q.shape[0]
    dh = d // H
    scale = 1.0 / np.sqrt(dh)
    head_of_d = np.arange(d) // dh
    hmask = head_of_d[None, :] == np.arange(HS)[:, None]
    hmask_f = jnp.asarray(hmask, jnp.float32)
    qh = q.reshape(b, 1, d) * jnp.asarray(hmask, q.dtype)[None]  # [B, HS, D]

    def kernel(scalar_ref, qh_ref, hmask_ref, kT_ref, v_ref, sc_ref, kn_ref,
               vn_ref, acc_ref):
        valid = scalar_ref[1]
        for i in range(g):
            qh_i = qh_ref[i]  # [HS, D]
            k = kT_ref[0, i].astype(qh_i.dtype)  # [D, T]
            s = jnp.dot(qh_i, k, preferred_element_type=jnp.float32) * scale
            s = s * sc_ref[0, i, 0:1, :]  # per-token K scale on lanes
            in_range = jax.lax.broadcasted_iota(jnp.int32, (HS, t), 1) < valid
            s = jnp.where(in_range, s, NEG_BIG)
            # current token: one VPU reduce per head row, no MXU
            kn = kn_ref[i].astype(jnp.float32)  # [1, D]
            s_e = jnp.sum(
                qh_i.astype(jnp.float32) * kn, axis=1, keepdims=True
            ) * scale  # [HS, 1]
            m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_e)
            p = jnp.where(in_range, jnp.exp(s - m), 0.0)  # [HS, T]
            p_e = jnp.exp(s_e - m)  # [HS, 1]
            l = jnp.sum(p, axis=1, keepdims=True) + p_e
            pc = (p * sc_ref[0, i, 1:2, :]).astype(qh_i.dtype)
            v = v_ref[0, i].astype(qh_i.dtype)  # [T, D]
            pv = jnp.dot(pc, v, preferred_element_type=jnp.float32)  # [HS, D]
            pv = (pv + p_e * vn_ref[i].astype(jnp.float32)) / l
            acc_ref[i] = jnp.sum(pv * hmask_ref[:], axis=0, keepdims=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, HS, d), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HS, d), lambda b, sc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, d, t), lambda b, sc: (sc[0], b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, t, d), lambda b, sc: (sc[0], b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, 2, t), lambda b, sc: (sc[0], b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, d), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, d), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, 1, d), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(scalars, qh, hmask_f, kT4, v4, scT4, k_new, v_new)


_selfkt_jit = jax.jit(_selfkt_call, static_argnames=("g",))


def check_selfkt(g):
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_merged

    rng = np.random.default_rng(0)
    k = rng.integers(-127, 127, (L, B, T, D)).astype(np.int8)
    v = rng.integers(-127, 127, (L, B, T, D)).astype(np.int8)
    sc = rng.uniform(0.005, 0.02, (L, B, T, 2)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    kn = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    vn = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = decode_attention_merged(
        q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(2), jnp.asarray(VALID),
        H, kn, vn, kv_scale4=jnp.asarray(sc),
    )
    kT = jnp.asarray(np.swapaxes(k, 2, 3))  # [L, B, D, T]
    scT = jnp.asarray(np.swapaxes(sc, 2, 3))  # [L, B, 2, T]
    scalars = jnp.asarray([2, VALID], jnp.int32)
    out = _selfkt_jit(q, kT, jnp.asarray(v), scT, kn, vn, scalars, g=g)
    err = np.max(np.abs(np.asarray(ref) - np.asarray(out)))
    print(f"  selfkt g={g}: max|out-ref| = {err:.2e}", flush=True)
    assert err < 2e-2, err


def bench_selfkt(g):
    rng = np.random.default_rng(0)
    kT = jnp.asarray(rng.integers(-127, 127, (L, B, D, T)).astype(np.int8))
    v = jnp.asarray(rng.integers(-127, 127, (L, B, T, D)).astype(np.int8))
    scT = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, 2, T)).astype(np.float32))
    q0 = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    kn = q0 + 0.1
    vn = q0 - 0.1

    @jax.jit
    def run(q, kT4, v4, scT4, kn, vn):
        def body(i, q):
            scalars = jnp.stack(
                [(i % L).astype(jnp.int32), jnp.asarray(VALID, jnp.int32)]
            )
            out = _selfkt_call(q, kT4, v4, scT4, kn, vn, scalars, g=g)
            return (q + 1e-6 * out.astype(q.dtype)).astype(q.dtype)

        return jax.lax.fori_loop(0, ITERS, body, q)

    dt = timeit_loop(run, q0, kT, v, scT, kn, vn)
    bytes_moved = B * T * (2 * D + 8)
    sol = bytes_moved / HBM_GBPS
    print(
        f"selfkt g={g:<2d} (full fused step) {dt*1e6:7.1f} us/layer  "
        f"SoL {sol*1e6:6.1f}  {bytes_moved/dt/1e9:5.0f} GB/s ({100*sol/dt:5.1f}%)",
        flush=True,
    )


def bench_kt_write():
    """Cost of the per-step cache write in the transposed layout: a [D,1]
    lane-column dynamic_update_slice per (layer, batch) vs the natural
    time-major [1,D] row write."""
    rng = np.random.default_rng(0)
    nl = 32
    kT = jnp.asarray(rng.integers(-127, 127, (nl, B, D, T)).astype(np.int8))
    kt_nat = jnp.asarray(np.swapaxes(np.asarray(kT), 2, 3))
    newk = jnp.asarray(rng.integers(-127, 127, (nl, B, 1, D)).astype(np.int8))

    @jax.jit
    def wT(c, new):
        def body(i, c):
            return jax.lax.dynamic_update_slice(
                c, jnp.swapaxes(new, 2, 3), (0, 0, 0, 100 + (i % 32))
            )

        return jax.lax.fori_loop(0, ITERS, body, c)

    @jax.jit
    def wN(c, new):
        def body(i, c):
            return jax.lax.dynamic_update_slice(c, new, (0, 0, 100 + (i % 32), 0))

        return jax.lax.fori_loop(0, ITERS, body, c)

    for name, fn, c in (("write kT [D,1] col", wT, kT), ("write nat [1,D] row", wN, kt_nat)):
        dt = timeit_loop(fn, c, newk)
        print(f"{name:28s} {dt*1e6:7.1f} us/step (all {nl} layers)", flush=True)


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
        if kw.get("elide"):
            for valid in (32, 64, 128, 200, 256):
                bench(name, kw, valid=valid)
        else:
            bench(name, kw)

    if only is None or "selfkt" in only:
        for g in (8, 16):
            check_selfkt(g)
            bench_selfkt(g)
    if only is None or "ktwrite" in only:
        bench_kt_write()


if __name__ == "__main__":
    main()
