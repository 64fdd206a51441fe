"""Basic layers: LayerNorm, tanh-GELU, Conv1D.

Numerical contracts (reference: src/model/layers.rs):

* LayerNorm: eps=1e-5 *inside* the sqrt, biased variance over the last dim
  (:23-31); computed in float32 regardless of activation dtype
* GELU: tanh approximation ``0.5 x (1 + tanh(sqrt(2/pi)(x + 0.044715 x^3)))``
  (:35-41)
* Conv1D: the reference lowers to im2col + matmul by hand (:77-132) because
  its GPU stack lacks a conv kernel; on TPU ``lax.conv_general_dilated``
  already lowers convolutions onto the MXU, so no im2col is needed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from whisper_burn_tpu.ops.compute import Compute

LN_EPS = 1e-5


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / sqrt(var + eps) * g + b over the last axis, in f32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + LN_EPS)
    return (normed * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(dtype)


_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def gelu(x: jnp.ndarray, kind: str = "tanh") -> jnp.ndarray:
    """GELU activation.

    ``kind="tanh"``: the reference's approximation (src/model/layers.rs:35-41).
    ``kind="erf"``: exact GELU (what OpenAI/HF Whisper computes).
    """
    if kind == "erf":
        return jax.nn.gelu(x, approximate=False)
    x3 = x * x * x
    inner = (x + 0.044715 * x3) * jnp.asarray(_SQRT_2_OVER_PI, x.dtype)
    return x * 0.5 * (jnp.tanh(inner) + 1.0)


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    stride: int,
    padding: int,
    compute: Compute,
) -> jnp.ndarray:
    """``x[B, C_in, T] -> [B, C_out, T_out]`` with zero padding.

    ``w: [C_out, C_in, k]`` (HF/checkpoint layout). Accumulates in f32.
    """
    y = jax.lax.conv_general_dilated(
        x.astype(compute.dtype),
        w.astype(compute.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=compute.precision,
        preferred_element_type=jnp.float32,
    ).astype(compute.dtype)
    return y + b.astype(y.dtype)[None, :, None]
