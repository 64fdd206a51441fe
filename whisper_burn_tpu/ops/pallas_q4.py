"""Fused Q4 dequant-matmul Pallas kernel for TPU.

The MXU-tiled rebirth of the reference's WGSL shader
(src/gguf/shader.wgsl:51-92). The reference runs one thread per output
element, re-reading the same input row and unpacking nibbles scalar-by-
scalar with no shared-memory tiling — the design explicitly NOT to copy
(SURVEY §7.4). Here:

* weights arrive pre-repacked (gguf/repack.py) as ``qw: int8[K, N]`` +
  ``scales: f32[K//32, N]`` — HBM traffic is 1 byte/weight,
* the grid is a standard ``(M/bm, N/bn, K/bk)`` matmul tiling; each step
  dequantizes one ``[bk, bn]`` int8 tile in VMEM registers (VPU:
  ``int8 -> compute dtype``, broadcast-multiply by the 32-wide block
  scales) and feeds the MXU contraction, accumulating f32 into the output
  tile across the sequential K dimension,
* Mosaic's automatic pipelining double-buffers the HBM->VMEM tile loads.

Dequant semantics are bit-identical to ``(nibble - 8) * d``
(src/gguf/shader.wgsl:82-88): ``qw`` stores ``nibble - 8`` and ``scales``
the f16-exact ``d``.

Shapes must satisfy K % 256 == 0 (holds for all Whisper dims: 1280, 5120);
M and N are padded to tile multiples in the wrapper and unpadded after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q4_BLOCK = 32

# Tile sizes. bk=256 divides every Whisper K (1280, 5120); bn=256 divides
# every quantized N. bm adapts to small M (decode GEMV) below.
BK = 256
BN = 256
BM_MAX = 256


def _kernel(x_ref, qw_ref, sc_ref, o_ref, *, dtype, precision):
    """One (bm, bn) output tile accumulating over the K grid dimension."""
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    q = qw_ref[:].astype(dtype)  # [bk, bn] int8 -> compute dtype (VPU)
    bk, bn = q.shape
    w = (q.reshape(bk // Q4_BLOCK, Q4_BLOCK, bn) * sc_ref[:].astype(dtype)[:, None, :]).reshape(bk, bn)
    o_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32, precision=precision
    )


@functools.partial(
    jax.jit, static_argnames=("dtype", "precision", "interpret", "bm", "bn", "bk")
)
def _q4_matmul_2d(
    x: jnp.ndarray,  # [M, K] compute dtype
    qw: jnp.ndarray,  # [K, N] int8
    scales: jnp.ndarray,  # [K//32, N] f32
    *,
    dtype,
    precision,
    interpret: bool,
    bm: int,
    bn: int,
    bk: int,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = qw.shape
    grid = (m // bm, n // bn, k // bk)

    return pl.pallas_call(
        functools.partial(_kernel, dtype=dtype, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bk // Q4_BLOCK, bn), lambda i, j, s: (s, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qw, scales)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def stacked_bn(k: int, n: int) -> int | None:
    """N-tile for the layer-indexed whole-K kernel: as WIDE as VMEM allows.

    The per-grid-step fixed cost (~1.2 us: DMA descriptors, control)
    dominates decode-shape matmuls — bn=256 held the qkv matmul at 27% of
    the HBM roofline (15 grid steps for [1280, 3840]); bn=1280 is 3 steps.
    The budget covers the double-buffered weight + scale blocks."""
    budget = 6 * 1024 * 1024  # bytes per buffered operand set
    for c in (1536, 1280, 1024, 768, 640, 512, 384, 256, 128):
        if n % c == 0 and (k * c + (k // Q4_BLOCK) * c * 4) <= budget:
            return c
    return None


def _kernel_stacked(scalar_ref, x_ref, qw_ref, sc_ref, o_ref, *, dtype, precision):
    """One (bm, bn) output tile, whole-K reduction, layer-indexed weights.

    The layer index rides scalar prefetch so the BlockSpec DMAs stream the
    selected layer's tiles straight out of the stacked ``[L, K, N]`` array
    — no per-layer dynamic-slice copy ever materializes in HBM (the
    unstacked kernel inside a scan-over-layers cost ~1.3 ms/step at B=64
    in slice+pad fusions; profiled 2026-08, see models/decoder.py)."""
    q = qw_ref[0].astype(dtype)  # [bk, bn]
    bk, bn = q.shape
    w = (q.reshape(bk // Q4_BLOCK, Q4_BLOCK, bn) * sc_ref[0].astype(dtype)[:, None, :]).reshape(bk, bn)
    o_ref[:] = jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32, precision=precision
    )


@functools.partial(
    jax.jit, static_argnames=("dtype", "precision", "interpret", "bm", "bn")
)
def _q4_matmul_2d_stacked(
    x: jnp.ndarray,  # [M, K] compute dtype
    qw: jnp.ndarray,  # [L, K, N] int8
    scales: jnp.ndarray,  # [L, K//32, N] f32
    layer: jnp.ndarray,  # [] int32
    *,
    dtype,
    precision,
    interpret: bool,
    bm: int,
    bn: int,
) -> jnp.ndarray:
    m, k = x.shape
    l_dim, _, n = qw.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j, sc: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, k, bn), lambda i, j, sc: (sc[0], 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k // Q4_BLOCK, bn),
                lambda i, j, sc: (sc[0], 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, sc: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel_stacked, dtype=dtype, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, qw, scales)


def q4_matmul_pallas_stacked(
    x: jnp.ndarray,  # [..., K]
    qw_all: jnp.ndarray,  # [L, K, N] int8
    sc_all: jnp.ndarray,  # [L, K//32, N] f32
    layer: jnp.ndarray,  # [] int32
    compute,
    interpret: bool | None = None,
    out_dtype=None,
) -> jnp.ndarray | None:
    """Layer-indexed fused quantized matmul for scan-over-layers decode.

    Small-M (decode GEMV) only: the whole-K reduction per grid step keeps
    one output write and the weight DMA stream large. Returns None for
    unservable shapes (caller falls back to slice + q4_matmul)."""
    l_dim, k, n = qw_all.shape
    batch_shape = x.shape[:-1]
    m = 1
    for s in batch_shape:
        m *= s
    if m > BM_MAX or k % BK != 0:
        return None
    bn = stacked_bn(k, n)
    if bn is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    x2 = x.reshape(m, k).astype(compute.dtype)
    bm = _round_up(m, 8)
    if bm != m:
        x2 = jnp.pad(x2, ((0, bm - m), (0, 0)))
    y = _q4_matmul_2d_stacked(
        x2, qw_all, sc_all, layer,
        dtype=compute.dtype, precision=compute.precision,
        interpret=interpret, bm=bm, bn=bn,
    )
    y = y[:m].astype(out_dtype or compute.dtype)
    return y.reshape(*batch_shape, n)


def q4_matmul_pallas(
    x: jnp.ndarray,
    qw: jnp.ndarray,
    scales: jnp.ndarray,
    compute,
    interpret: bool | None = None,
    out_dtype=None,
) -> jnp.ndarray | None:
    """Fused quantized matmul ``[..., K] -> [..., N]``.

    Returns None for shapes the kernel does not serve (caller falls back to
    the XLA path). ``interpret=True`` runs the Mosaic interpreter (CPU
    tests).
    """
    k, n = qw.shape
    if k % BK != 0:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    batch_shape = x.shape[:-1]
    m = 1
    for s in batch_shape:
        m *= s
    x2 = x.reshape(m, k).astype(compute.dtype)

    # pad M to a tile multiple (8 keeps the f32 sublane width; decode GEMV
    # runs bm=8), N to the lane-tile multiple
    bm = min(BM_MAX, _round_up(m, 8))
    bn, bk = BN, BK
    if m <= BM_MAX and k <= 2048:
        # small-M (decode/prefill) shapes: the default 256x256 K-tiling
        # makes many tiny 65 KB weight DMAs plus a read-modify-write of
        # the f32 output tile per K step. Take the WHOLE reduction per
        # grid step instead — one output write, ~0.3-0.7 MB weight DMAs
        # (qkv matmul measured 45% -> of roofline with K tiled).
        bk = k
        if n >= 8 * BN:
            # very wide N (the tied-embedding logits matmul, [64, 1280] @
            # [1280, 51872]): widen the N tile as far as VMEM allows —
            # the per-grid-step fixed cost dominates at decode shapes
            # (bn=512 measured 41% of roofline; see stacked_bn).
            bn = stacked_bn(k, n) or 512
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    qw_p, sc_p = qw, scales
    if n_pad != n:
        qw_p = jnp.pad(qw, ((0, 0), (0, n_pad - n)))
        sc_p = jnp.pad(scales, ((0, 0), (0, n_pad - n)))

    y = _q4_matmul_2d(
        x2, qw_p, sc_p,
        dtype=compute.dtype, precision=compute.precision,
        interpret=interpret, bm=bm, bn=bn, bk=bk,
    )
    y = y[:m, :n].astype(out_dtype or compute.dtype)
    return y.reshape(*batch_shape, n)
