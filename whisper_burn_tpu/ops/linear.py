"""Linear layer application over param dicts.

A linear's params are a plain dict (pytree-friendly for pjit sharding):

* quantized: ``{"qw": int8[K, N], "scales": f32[K//32, N], "b"?: f32[N]}``
* dense:     ``{"w": [K, N], "b"?: f32[N]}``

Equivalent of the reference's ``Q4Linear::forward`` (src/gguf/linear.rs:
34-40): ``y = x @ W^T (+ b)`` — note our storage is already transposed to
``[K, N]`` so no transpose happens at apply time.

Tensor parallelism (Megatron layout, parallel/sharding.py): column-parallel
linears (q/k/v/fc1) need no communication; **row-parallel** ones (attn_o /
xattn_o / fc2) hold a K-shard each, so their matmul yields a partial sum
that must be ``psum``'d over the model axis *before* the bias add. Inside a
``shard_map`` body (``compute.tp_axis`` set) :func:`apply_reduce_linear`
does exactly that; under GSPMD jit (or single-device) it degenerates to
:func:`apply_linear`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_burn_tpu.ops.compute import Compute
from whisper_burn_tpu.ops.q4_matmul import LARGE_M, _rows, q4_matmul


def w8a8_matmul(
    x: jnp.ndarray, qw8: jnp.ndarray, s8: jnp.ndarray, compute: Compute
) -> jnp.ndarray:
    """``x [..., K] @ int8 [K, N]`` on the int8 MXU path (2x bf16 peak).

    Activations quantize per-row (absmax/127); the contraction runs
    ``int8 x int8 -> int32`` and the rank-1 dequant ``row_scale * s8``
    applies after. Used for the encoder's large-M matmuls where the MXU,
    not HBM, is the bound (VERDICT r2 item 3: encoder 55% MFU)."""
    # NOTE: the XLA int8 dot is the fast path here — a Pallas version was
    # measured 60% SLOWER at encoder shapes (Mosaic does not map int8
    # jnp.dot onto the native int8 MXU mode the way XLA does). The raw XLA
    # int8 dot runs ~5.6x the bf16 dot; the net encoder win is ~10%
    # because the per-row quantize (2 passes over x) and the int32->f32
    # epilogue claw most of it back.
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    yi = jax.lax.dot_general(
        xq, qw8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * xs * s8.astype(jnp.float32)
    return y.astype(compute.dtype)


def _matmul(params: dict, x: jnp.ndarray, compute: Compute) -> jnp.ndarray:
    if "qw8" in params and (
        "qw" not in params or (compute.w8a8 and _rows(x) >= LARGE_M)
    ):
        # qw8-only params (attach_w8a8 replace mode) always take this
        # path — those surfaces are large-M by construction
        return w8a8_matmul(x, params["qw8"], params["s8"], compute)
    if "qw" in params:
        return q4_matmul(x, params["qw"], params["scales"], compute)
    return jnp.matmul(
        x.astype(compute.dtype),
        params["w"].astype(compute.dtype),
        precision=compute.precision,
        preferred_element_type=jnp.float32,
    ).astype(compute.dtype)


def apply_linear(params: dict, x: jnp.ndarray, compute: Compute) -> jnp.ndarray:
    y = _matmul(params, x, compute)
    b = params.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def apply_reduce_linear(params: dict, x: jnp.ndarray, compute: Compute) -> jnp.ndarray:
    """Row-parallel-aware linear: matmul -> psum over the tp axis -> + bias.

    The bias is added exactly once, *after* the cross-shard reduction (the
    K-sharded matmul contributes a partial sum per shard; its bias is
    replicated, matching parallel/sharding.py's ``_ROW_PARALLEL`` spec).
    """
    y = _matmul(params, x, compute)
    if compute.tp_axis is not None:
        y = jax.lax.psum(y, compute.tp_axis)
    b = params.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def qkv_proj(bp: dict, x: jnp.ndarray, compute: Compute):
    """Self-attention q/k/v — served by one fused [K, 3D] matmul when the
    params carry ``attn_qkv`` (see models/params.fuse_attention_params).

    Under tensor parallelism the fused layout is built shard-interleaved
    (``fuse_attention_params(tp=...)``) so each model shard's local fused
    slice is exactly ``[q_shard | k_shard | v_shard]`` — the thirds split
    below is then correct on local (shard_map) views too.
    """
    if "attn_qkv" in bp:
        y = apply_linear(bp["attn_qkv"], x, compute)
        d = y.shape[-1] // 3
        return y[..., :d], y[..., d : 2 * d], y[..., 2 * d :]
    return (
        apply_linear(bp["attn_q"], x, compute),
        apply_linear(bp["attn_k"], x, compute),
        apply_linear(bp["attn_v"], x, compute),
    )


def cross_kv_proj(bp: dict, enc: jnp.ndarray, compute: Compute):
    """Cross-attention k/v from encoder output (fused ``xattn_kv`` aware)."""
    if "xattn_kv" in bp:
        y = apply_linear(bp["xattn_kv"], enc, compute)
        d = y.shape[-1] // 2
        return y[..., :d], y[..., d:]
    return (
        apply_linear(bp["xattn_k"], enc, compute),
        apply_linear(bp["xattn_v"], enc, compute),
    )


def apply_ffn(bp: dict, x: jnp.ndarray, gelu_kind: str, compute: Compute) -> jnp.ndarray:
    """fc1 -> GELU -> fc2, via the fused Pallas FFN kernel when available.

    Large-M activations (encoder, batched prefill) take the unfused XLA
    path for the same reason as q4_matmul's LARGE_M dispatch: at those
    shapes the MXU time dwarfs the dequant materialization and XLA's
    matmul pipeline outruns the fused kernel.

    Under tensor parallelism fc1 is column-parallel (local F/tp hidden) and
    fc2 row-parallel: the fused kernel runs on the local F-shard with fc2's
    bias zeroed, then the output is psum'd and the bias added once.
    """
    from whisper_burn_tpu.ops.pallas_ffn import _gelu, fused_ffn_pallas
    from whisper_burn_tpu.ops.q4_matmul import LARGE_M, _rows

    if compute.use_pallas and _rows(x) < LARGE_M:
        fc2 = bp["fc2"]
        tp_bias = compute.tp_axis is not None and "b" in fc2
        fc2_in = {**fc2, "b": jnp.zeros_like(fc2["b"])} if tp_bias else fc2
        y = fused_ffn_pallas(x, bp["fc1"], fc2_in, gelu_kind, compute)
        if y is not None:
            if compute.tp_axis is not None:
                y = jax.lax.psum(y, compute.tp_axis)
            if tp_bias:
                y = y + fc2["b"].astype(y.dtype)
            return y
    h = _gelu(apply_linear(bp["fc1"], x, compute), gelu_kind)
    return apply_reduce_linear(bp["fc2"], h, compute)
