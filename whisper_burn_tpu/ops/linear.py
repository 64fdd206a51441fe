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
