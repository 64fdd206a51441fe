"""Linear layer application over param dicts.

A linear's params are a plain dict (pytree-friendly for pjit sharding):

* quantized: ``{"qw": int8[K, N], "scales": f32[K//32, N], "b"?: f32[N]}``
* dense:     ``{"w": [K, N], "b"?: f32[N]}``

Equivalent of the reference's ``Q4Linear::forward`` (src/gguf/linear.rs:
34-40): ``y = x @ W^T (+ b)`` — note our storage is already transposed to
``[K, N]`` so no transpose happens at apply time.
"""

from __future__ import annotations

import jax.numpy as jnp

from whisper_burn_tpu.ops.compute import Compute
from whisper_burn_tpu.ops.q4_matmul import q4_matmul


def apply_linear(params: dict, x: jnp.ndarray, compute: Compute) -> jnp.ndarray:
    if "qw" in params:
        y = q4_matmul(x, params["qw"], params["scales"], compute)
    else:
        y = jnp.matmul(
            x.astype(compute.dtype),
            params["w"].astype(compute.dtype),
            precision=compute.precision,
            preferred_element_type=jnp.float32,
        ).astype(compute.dtype)
    b = params.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def qkv_proj(bp: dict, x: jnp.ndarray, compute: Compute):
    """Self-attention q/k/v — served by one fused [K, 3D] matmul when the
    params carry ``attn_qkv`` (see models/params.fuse_attention_params)."""
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
    matmul pipeline outruns the fused kernel."""
    from whisper_burn_tpu.ops.pallas_ffn import _gelu, fused_ffn_pallas
    from whisper_burn_tpu.ops.q4_matmul import LARGE_M, _rows

    if compute.use_pallas and _rows(x) < LARGE_M:
        y = fused_ffn_pallas(x, bp["fc1"], bp["fc2"], gelu_kind, compute)
        if y is not None:
            return y
    h = _gelu(apply_linear(bp["fc1"], x, compute), gelu_kind)
    return apply_linear(bp["fc2"], h, compute)
