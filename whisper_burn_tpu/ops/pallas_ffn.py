"""Fused quantized FFN kernel: ``fc2(gelu(fc1(x)))`` in one pallas_call.

The FFN is two of the six matmuls in every block, and the intermediate
``h = gelu(x @ W1 + b1)`` is [M, 5120] — in the unfused path it makes an
HBM round-trip and each matmul pays a kernel-launch cost (measurable per
decode step: ~200 launches/step). Fusion uses the f-tile accumulation
identity

    out = b2 + sum_f gelu(x @ W1[:, f] + b1[f]) @ W2[f, :]

— exact (gelu is elementwise in f), so the grid runs ``(M/bm, F/bf)`` with
the output tile accumulating across the sequential f dimension while
``h`` only ever exists as a VMEM tile. Both weights are Q4-repacked
(int8 codes + 32-block scales) and dequantized in VMEM like
ops/pallas_q4.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q4_BLOCK = 32
BF = 512  # minimum f-tile: divides every Whisper ffn_dim (5120, 4096)
BM_MAX = 256


def ffn_bf(d: int, f: int) -> int | None:
    """f-tile: as wide as VMEM allows (the per-grid-step fixed cost and
    the dequant VPU passes dominate decode-shape FFNs; bf=512 measured
    27.6% of the HBM roofline at [64, 1280<->5120]). The budget covers the
    double-buffered w1 + w2 + scale blocks."""
    budget = 7 * 1024 * 1024

    def _fits(c: int) -> bool:
        return (2 * d * c + 2 * (max(d, c) // Q4_BLOCK) * max(d, c) * 4) <= budget

    # experiment hook (scripts/exp_insitu.py) — must still fit the VMEM
    # budget, and unparsable strays are ignored, so a stale exported value
    # cannot break production (r5 review); _env_g holds the validation
    from whisper_burn_tpu.ops.pallas_attention import _env_g

    v = _env_g("WB_FFN_BF", 0, f, ok=_fits)
    if v:
        return v
    for c in (2560, 2048, 1536, 1280, 1024, 768, 640, 512):
        if f % c == 0 and _fits(c):
            return c
    return None

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    ~3e-6 in f32 arithmetic). Mosaic has no erf/erfc lowering (the
    OpenAI-frontend ``gelu="erf"`` path crashed the fused FFN kernel at
    trace time without this); ``exp`` lowers fine, and 3e-6 is ~3 decades
    below bf16 resolution, so serving numerics are unchanged."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(
        -z * z
    )
    return s * y


def _gelu(x, kind):
    if kind == "erf":
        x32 = x.astype(jnp.float32)
        return (0.5 * x32 * (1.0 + _erf(x32 * (1.0 / math.sqrt(2.0))))).astype(
            x.dtype
        )
    inner = (x + 0.044715 * x * x * x) * _SQRT_2_OVER_PI
    return x * 0.5 * (jnp.tanh(inner) + 1.0)


def _dequant(q, sc, dtype):
    k, n = q.shape
    w = q.astype(dtype).reshape(k // Q4_BLOCK, Q4_BLOCK, n) * sc.astype(dtype)[:, None, :]
    return w.reshape(k, n)


def _kernel(
    x_ref, qw1_ref, s1_ref, b1_ref, qw2_ref, s2_ref, b2_ref, o_ref,
    *, dtype, precision, gelu_kind,
):
    f_step = pl.program_id(1)

    @pl.when(f_step == 0)
    def _():
        o_ref[:] = jnp.broadcast_to(b2_ref[:].astype(jnp.float32), o_ref.shape)

    w1 = _dequant(qw1_ref[:], s1_ref[:], dtype)  # [D, bf]
    h = (
        jnp.dot(x_ref[:], w1, preferred_element_type=jnp.float32, precision=precision)
        + b1_ref[:].astype(jnp.float32)
    )
    g = _gelu(h, gelu_kind).astype(dtype)  # [bm, bf]
    w2 = _dequant(qw2_ref[:], s2_ref[:], dtype)  # [bf, D]
    o_ref[:] += jnp.dot(g, w2, preferred_element_type=jnp.float32, precision=precision)


@functools.partial(
    jax.jit,
    static_argnames=("dtype", "precision", "gelu_kind", "bm", "bf", "interpret"),
)
def _ffn_2d(x, qw1, s1, b1, qw2, s2, b2, *, dtype, precision, gelu_kind, bm, bf, interpret):
    m, d = x.shape
    f = qw1.shape[1]
    grid = (m // bm, f // bf)
    return pl.pallas_call(
        functools.partial(
            _kernel, dtype=dtype, precision=precision, gelu_kind=gelu_kind
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d // Q4_BLOCK, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf // Q4_BLOCK, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=m * d * x.dtype.itemsize + 2 * d * f + m * d * 4,
            transcendentals=m * f,
        ),
        interpret=interpret,
    )(x, qw1, s1, b1, qw2, s2, b2)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _kernel_stacked(
    scalar_ref, x_ref, qw1_ref, s1_ref, b1_ref, qw2_ref, s2_ref, o_ref,
    *, dtype, precision, gelu_kind,
):
    """Fused FFN tile with layer-indexed stacked weights (scalar prefetch).

    Same f-tile accumulation as :func:`_kernel`, but fc2's bias is left to
    the caller (it must be added exactly once, after any TP psum), and the
    weight DMAs stream straight from the stacked ``[L, ...]`` arrays — no
    per-layer slice copy in the decode scan."""
    f_step = pl.program_id(1)

    @pl.when(f_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w1 = _dequant(qw1_ref[0], s1_ref[0], dtype)  # [D, bf]
    h = (
        jnp.dot(x_ref[:], w1, preferred_element_type=jnp.float32, precision=precision)
        + b1_ref[0].astype(jnp.float32)
    )
    g = _gelu(h, gelu_kind).astype(dtype)  # [bm, bf]
    w2 = _dequant(qw2_ref[0], s2_ref[0], dtype)  # [bf, D]
    o_ref[:] += jnp.dot(g, w2, preferred_element_type=jnp.float32, precision=precision)


@functools.partial(
    jax.jit,
    static_argnames=("dtype", "precision", "gelu_kind", "bm", "bf", "interpret"),
)
def _ffn_2d_stacked(
    x, qw1, s1, b1, qw2, s2, layer,
    *, dtype, precision, gelu_kind, bm, bf, interpret,
):
    m, d = x.shape
    l_dim, _, f = qw1.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // bm, f // bf),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j, sc: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, bf), lambda i, j, sc: (sc[0], 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, d // Q4_BLOCK, bf), lambda i, j, sc: (sc[0], 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, bf), lambda i, j, sc: (sc[0], 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf, d), lambda i, j, sc: (sc[0], j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bf // Q4_BLOCK, d), lambda i, j, sc: (sc[0], j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, j, sc: (i, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_stacked, dtype=dtype, precision=precision, gelu_kind=gelu_kind
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=m * d * x.dtype.itemsize + 2 * d * f + m * d * 4,
            transcendentals=m * f,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, qw1, s1, b1, qw2, s2)


def fused_ffn_pallas_stacked(
    x: jnp.ndarray,  # [..., D]
    fc1: dict,  # stacked leaves: qw [L, D, F], scales [L, D//32, F], b [L, F]
    fc2: dict,  # stacked leaves: qw [L, F, D], scales [L, F//32, D], b [L, D]
    layer: jnp.ndarray,
    gelu_kind: str,
    compute,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Layer-indexed fused FFN for the decode scan. fc2's bias is NOT
    added — the caller adds it after any tensor-parallel psum. Returns
    None for unservable shapes/params (caller slices + falls back)."""
    if "qw" not in fc1 or "qw" not in fc2:
        return None
    l_dim, d, f = fc1["qw"].shape
    bf = ffn_bf(d, f)
    if bf is None or fc2["qw"].shape != (l_dim, f, d):
        return None
    if "b" not in fc1 or "b" not in fc2:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    batch_shape = x.shape[:-1]
    m = 1
    for s in batch_shape:
        m *= s
    if m > BM_MAX:
        return None
    x2 = x.reshape(m, d).astype(compute.dtype)
    bm = _round_up(m, 8)
    if bm != m:
        x2 = jnp.pad(x2, ((0, bm - m), (0, 0)))

    y = _ffn_2d_stacked(
        x2,
        fc1["qw"], fc1["scales"], fc1["b"].reshape(l_dim, 1, f),
        fc2["qw"], fc2["scales"], layer,
        dtype=compute.dtype,
        precision=compute.precision,
        gelu_kind=gelu_kind,
        bm=bm,
        bf=bf,
        interpret=interpret,
    )
    return y[:m].astype(compute.dtype).reshape(*batch_shape, d)


def fused_ffn_pallas(
    x: jnp.ndarray,  # [..., D]
    fc1: dict,
    fc2: dict,
    gelu_kind: str,
    compute,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Fused FFN if both linears are quantized and shapes tile; else None."""
    if "qw" not in fc1 or "qw" not in fc2:
        return None
    d, f = fc1["qw"].shape
    bf = ffn_bf(d, f)
    if bf is None or fc2["qw"].shape != (f, d):
        return None
    if "b" not in fc1 or "b" not in fc2:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    batch_shape = x.shape[:-1]
    m = 1
    for s in batch_shape:
        m *= s
    x2 = x.reshape(m, d).astype(compute.dtype)
    bm = min(BM_MAX, _round_up(m, 8))
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    y = _ffn_2d(
        x2,
        fc1["qw"], fc1["scales"], fc1["b"].reshape(1, f),
        fc2["qw"], fc2["scales"], fc2["b"].reshape(1, d),
        dtype=compute.dtype,
        precision=compute.precision,
        gelu_kind=gelu_kind,
        bm=bm,
        bf=bf,
        interpret=interpret,
    )
    return y[:m].astype(compute.dtype).reshape(*batch_shape, d)
