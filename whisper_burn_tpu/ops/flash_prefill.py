"""Flash (blockwise) attention for the encoder prefill path.

Encoder self-attention at T=1500 is the one place the model materializes
O(T^2) state: the einsum path writes per-layer f32 score tensors
``[B, H, 1500, 1500]`` to HBM and reads them back through softmax and the
value contraction — ~23 GB of traffic per layer at B=32, which made the
encoder HBM-bound. This wraps JAX's TPU flash-attention Pallas kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) so scores never
leave VMEM: q/k/v are read once, softmax is the streaming
running-max/sum recurrence, and only the [B, T, D] output is written.

The reference has no equivalent — its attention materializes scores and
builds the mask on the CPU (src/model/attention.rs:243-298); SURVEY §2.3
calls for the batched-prefill attention to be blockwise on TPU.

Layout: the model carries activations D-packed ``[B, T, D]``; the kernel
wants ``[B, H, T, dh]``. The transpose costs ~2 HBM passes over q/k/v
(~0.7 GB/layer at B=32) — noise next to the ~23 GB it removes. T=1500 is
padded to a 512-multiple and the pad keys are masked via segment ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whisper_burn_tpu.ops.compute import Compute

_PAD_MULTIPLE = 512  # stock kernel's default max block size


def _supported(t: int, d: int, n_heads: int) -> bool:
    if d % n_heads:
        return False
    dh = d // n_heads
    # the kernel pads head_dim internally, but only lane-aligned dh is
    # worth routing here; tiny T prefers the fused einsum path anyway
    return dh % 64 == 0 and t >= 128


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def _flash_call(q, k, v, n_heads: int, interpret: bool):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, d = q.shape
    dh = d // n_heads
    tp = -(-t // _PAD_MULTIPLE) * _PAD_MULTIPLE
    # the stock 128x128 default leaves the MXU idle at dh=64 (measured 60
    # ms/layer at B=32/T=1500); whole-sequence blocks run 13.8 ms/layer —
    # [tp, dh] k/v tiles are ~192 KB each, comfortably VMEM-resident
    block_sizes = BlockSizes(block_q=tp, block_k_major=tp, block_k=tp, block_b=1)

    def to_heads(x):
        x = x.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    seg = None
    if tp != t:
        ids = (jnp.arange(tp) < t).astype(jnp.int32)[None].repeat(b, 0)
        seg = SegmentIds(q=ids, kv=ids)

    def run():
        return flash_attention(
            qh,
            kh,
            vh,
            segment_ids=seg,
            causal=False,
            sm_scale=1.0 / np.sqrt(dh),
            block_sizes=block_sizes,
        )

    if interpret:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = run()
    else:
        out = run()
    return out[:, :, :t].transpose(0, 2, 1, 3).reshape(b, t, d)


def prefill_attention(
    q: jnp.ndarray,  # [B, T, D]
    k: jnp.ndarray,  # [B, T, D]
    v: jnp.ndarray,  # [B, T, D]
    n_heads: int,
    compute: Compute,
    *,
    valid: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Non-causal full-sequence attention, flash-style. Returns ``[B, T, D]``
    in ``compute.dtype``, or None when the shape is unsupported (caller
    falls back to the einsum path in models/attention.py).

    ``valid``: real sequence length when the caller pre-padded T (the
    encoder pads to a 128-multiple once for its whole layer stack); pad
    keys are masked, pad-row outputs are garbage the caller discards."""
    b, t, d = q.shape
    if not _supported(t, d, n_heads):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    from whisper_burn_tpu.ops.pallas_encoder_attention import (
        encoder_attention,
        encoder_attention_packed,
    )

    # packed-layout whole-sequence kernel: heads are lane slices taken
    # in-kernel, so no 4D head transpose/pad chain exists in XLA at all
    if t % 128 == 0:
        out = encoder_attention_packed(
            q, k, v, n_heads, valid=valid, interpret=interpret
        )
        if out is not None:
            return out.astype(compute.dtype)
    if valid is not None:
        # The fallbacks below ignore ``valid`` and would silently attend
        # over pad keys — but the CALLER's XLA fallback masks them
        # correctly (models/encoder.py applies length_mask when this
        # returns None), so a gate divergence degrades to the masked
        # einsum path instead of corrupting output (ADVICE r4) or
        # crashing the forward pass (r5 review).
        return None
    tp = -(-t // 128) * 128
    if tp != t:
        pad = ((0, 0), (0, tp - t), (0, 0))
        out = encoder_attention_packed(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
            n_heads, valid=t, interpret=interpret,
        )
        if out is not None:
            return out[:, :t].astype(compute.dtype)

    # head-blocked single-pass kernel, then the stock flash kernel
    out = encoder_attention(q, k, v, n_heads, interpret=interpret)
    if out is None:  # T too long for a resident score block: stock flash
        out = _flash_call(q, k, v, n_heads, interpret)
    return out.astype(compute.dtype)
