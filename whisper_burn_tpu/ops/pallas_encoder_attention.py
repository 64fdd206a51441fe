"""Single-pass whole-sequence encoder self-attention kernel.

The encoder's T=1500 non-causal attention doesn't need flash tiling on a
TPU at Whisper sizes: one head's whole score matrix ([1536, 1536] f32 =
9.4 MB) fits comfortably in VMEM, so the streaming running-max/sum
recurrence — and the bookkeeping VPU work that made the stock flash
kernel ~21 us per (batch, head) — can be dropped entirely.

MXU shape choices (the reason this beats both stock flash and a naive
single-pass kernel):

* scores via a direct NT ``dot_general`` contracting both minor dims
  (``[T,dh] x [T,dh]^T``) — measured *faster* than pre-transposing K for
  the NN form, and it removes the K-transpose entirely;
* the value contraction runs TRANSPOSED: ``z = vT [dh,T] x p^T`` via an
  NT dot contracting the full key axis — M=dh, K=T, N=T uses the MXU at
  full contraction depth and full lane width, where the natural
  ``p [T,T] @ v [T,dh]`` form wastes half the array on N=dh=64;
* exact softmax, normalized on the ``[dh, T]`` output (T*dh divides, not
  T*T);
* two heads per grid step amortize per-step fixed costs.

V is fed pre-transposed ``[B, H, dh, T]`` and the output leaves the same
way; both transposes happen once per layer in XLA (~1 GB of traffic each,
noise next to the ~23 GB/layer the resident-score design removes).

The reference materializes encoder scores in GPU RAM and softmaxes them
in a separate pass (src/model/attention.rs:243-298); SURVEY §2.3 calls
for the batched-prefill attention to be blockwise — here "blockwise"
collapses to a single VMEM-resident block per head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30
_MAX_T = 2048  # f32 score block = T^2 * 4 bytes; 2048 -> 16 MB of VMEM
_HEADS_PER_STEP = 2


def _kernel(q_ref, k_ref, vT_ref, o_ref, *, scale, valid, t, hs):
    for i in range(hs):
        q = q_ref[0, i]  # [T, dh]
        k = k_ref[0, i]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [T, T]
        if valid < t:  # static: pad keys only exist when T was rounded up
            j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(j < valid, s, NEG_BIG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)  # [T, 1]
        # z[d, tq] = sum_tk vT[d, tk] * p[tq, tk] — NT dot, full MXU depth
        z = jax.lax.dot_general(
            vT_ref[0, i],
            p.astype(vT_ref.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [dh, T]
        lT = jnp.transpose(l, (1, 0))  # [1, T] (skinny relayout)
        o_ref[0, i] = (z / lT).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "valid", "interpret"))
def _attn_call(q, k, vT, *, n_heads, valid, interpret):
    b, h, t, dh = q.shape
    scale = 1.0 / np.sqrt(dh)
    hs = _HEADS_PER_STEP if h % _HEADS_PER_STEP == 0 else 1
    spec = pl.BlockSpec((1, hs, t, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((1, hs, dh, t), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, valid=valid, t=t, hs=hs),
        grid=(b, h // hs),
        in_specs=[spec, spec, spec_t],
        out_specs=spec_t,
        out_shape=jax.ShapeDtypeStruct((b, h, dh, t), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, vT)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, valid, t, n_heads):
    """Whole-sequence attention straight off the ``[B, T, D]`` layout.

    Heads are 64-lane slices of the D axis taken in-kernel — the 4D
    head-major reshape/transpose/pad chain the head-blocked kernel needed
    in XLA cost ~80 ms of a 259 ms encoder at B=16 (pads 24 ms, layout
    copies 12 ms, operand staging 34 ms; r4 XPlane trace). The value
    contraction is the natural ``p [T,T] @ v_h [T,dh]`` NN dot — at dh=64
    it half-fills the MXU exactly like the transposed form's M=64, so
    nothing is lost dropping the vT trick (and V needs no transpose)."""
    dh = q_ref.shape[-1] // n_heads
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[0][:, sl]  # [T, dh]
        kh = k_ref[0][:, sl]
        s = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [T, T]
        if valid < t:  # static: pad keys only exist when T was rounded up
            j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(j < valid, s, NEG_BIG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)  # [T, 1]
        z = jnp.dot(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            preferred_element_type=jnp.float32,
        )  # [T, dh]
        o_ref[0, :, sl] = (z / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "valid", "interpret"))
def _packed_call(q, k, v, *, n_heads, valid, interpret):
    b, t, d = q.shape
    dh = d // n_heads
    scale = 1.0 / np.sqrt(dh)
    # split D into head groups on a second grid axis so the four
    # double-buffered [1, T, dgrp] operand blocks + the per-head f32
    # score block stay inside VMEM (full-D blocks at T=1536/D=1280 OOM'd)
    dgrp = _pick_dgrp(t, d, n_heads, q.dtype.itemsize)
    spec = pl.BlockSpec(
        (1, t, dgrp), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _packed_kernel, scale=scale, valid=valid, t=t, n_heads=dgrp // dh
        ),
        grid=(b, d // dgrp),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)


def _pick_dgrp(t: int, d: int, n_heads: int, itemsize: int) -> int | None:
    """Head-group width for the packed kernel's second grid axis.

    Constraints (each violated by a real config before it was added):
    * STRICT operand budget — Medium's 16 heads x 8*t*dh*2 bytes lands
      EXACTLY on 24 MB, and the admitted whole-D block (16-head loop)
      blew the 100 MB scoped-vmem stack at compile (126.9 MB);
    * lane alignment — dgrp must be a 128-multiple (or the whole D):
      f32 parity compute at Large-V3 dims otherwise picks 5 heads = 320
      lanes, which Mosaic's block rules reject at trace time.
    None = no valid grouping (caller falls back to the head-blocked
    kernel). Large-V3 bf16's measured 10-head choice is unchanged.
    """
    dh = d // n_heads
    budget = 24 * 1024 * 1024  # operand-block budget (x2 buffering, x4 ops)
    for cand in range(n_heads, 0, -1):
        dgrp = cand * dh
        if (
            n_heads % cand == 0
            and (dgrp % 128 == 0 or dgrp == d)
            and 8 * t * dgrp * itemsize < budget
        ):
            return dgrp
    return None


def encoder_attention_packed(
    q: jnp.ndarray,  # [B, T, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    *,
    valid: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Non-causal whole-sequence attention in the packed [B, T, D] layout.

    ``valid``: number of real key/query positions (rows beyond it are
    pad; their outputs are garbage the caller slices away). T must be a
    128-multiple — the encoder pads once for the whole layer stack
    (models/encoder.py) instead of per layer.
    """
    b, t, d = q.shape
    if t % 128 != 0 or not supported(t, d, n_heads):
        return None
    if _pick_dgrp(t, d, n_heads, q.dtype.itemsize) is None:
        return None  # no lane-aligned head grouping fits VMEM
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _packed_call(
        q, k, v, n_heads=n_heads, valid=t if valid is None else valid,
        interpret=interpret,
    )


def supported(t: int, d: int, n_heads: int, itemsize: int = 4) -> bool:
    """Gate shared by this module and models/encoder.py's stack-wide pad
    decision (they must agree, or a pre-padded call loses its kernel and
    flash_prefill raises). ``itemsize=4`` checks the wider f32 case so
    the answer is conservative for bf16 callers too."""
    if d % n_heads:
        return False
    dh = d // n_heads
    tp = -(-t // 128) * 128
    if not (dh % 64 == 0 and 128 <= tp <= _MAX_T):
        return False
    return _pick_dgrp(tp, d, n_heads, itemsize) is not None


def encoder_attention(
    q: jnp.ndarray,  # [B, T, D]
    k: jnp.ndarray,  # [B, T, D]
    v: jnp.ndarray,  # [B, T, D]
    n_heads: int,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Non-causal self-attention over the full sequence; output [B, T, D]
    in the input dtype, or None when the shape is unsupported."""
    b, t, d = q.shape
    if not supported(t, d, n_heads):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dh = d // n_heads
    tp = -(-t // 128) * 128

    def to_heads(x):
        x = x.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0))) if tp != t else x

    vT = jnp.pad(
        v.reshape(b, t, n_heads, dh).transpose(0, 2, 3, 1),
        ((0, 0), (0, 0), (0, 0), (0, tp - t)),
    ) if tp != t else v.reshape(b, t, n_heads, dh).transpose(0, 2, 3, 1)

    oT = _attn_call(
        to_heads(q), to_heads(k), vT,
        n_heads=n_heads, valid=t, interpret=interpret,
    )  # [B, H, dh, T]
    return oT[..., :t].transpose(0, 3, 1, 2).reshape(b, t, d)
