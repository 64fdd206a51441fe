"""Single-pass whole-sequence encoder self-attention kernel.

The encoder's T=1500 non-causal attention doesn't need flash tiling on a
TPU at Whisper sizes: one head's whole score matrix ([1536, 1536] f32 =
9.4 MB) fits comfortably in VMEM, so the streaming running-max/sum
recurrence — and the bookkeeping VPU work that made the stock flash
kernel ~21 us per (batch, head) — can be dropped entirely. One grid step
computes one (batch, head) pair in one pass:

* scores via a direct NT ``dot_general`` contracting both minor dims
  (``[T,dh] x [T,dh]^T``) — measured *faster* (1.8 us at T=1536, dh=64)
  than pre-transposing K for the NN form (2.9 us), and it removes the
  K-transpose entirely;
* exact softmax (one max, one exp, one sum over the resident block);
* one ``[T,T]@[T,dh]`` value contraction.

Measured ~8 us per (batch, head) vs ~21 us for the stock kernel wrapped
by flash_prefill.py, which this replaces for T <= _MAX_T.

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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, valid, t):
    q = q_ref[0, 0]  # [T, dh]
    k = k_ref[0, 0]
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
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jnp.dot(
        (p / l).astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = pv.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "valid", "interpret"))
def _attn_call(q, k, v, *, n_heads, valid, interpret):
    b, h, t, dh = q.shape
    scale = 1.0 / np.sqrt(dh)
    spec = pl.BlockSpec((1, 1, t, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, valid=valid, t=t),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)


def supported(t: int, d: int, n_heads: int) -> bool:
    if d % n_heads:
        return False
    dh = d // n_heads
    tp = -(-t // 128) * 128
    return dh % 64 == 0 and 128 <= tp <= _MAX_T


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

    out = _attn_call(
        to_heads(q), to_heads(k), to_heads(v),
        n_heads=n_heads, valid=t, interpret=interpret,
    )
    return out[:, :, :t].transpose(0, 2, 1, 3).reshape(b, t, d)
