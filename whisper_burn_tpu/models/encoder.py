"""Whisper audio encoder.

Contract (reference: src/model/encoder.rs:83-116):
``[B, n_mels, 3000]`` -> conv1(k=3,s=1,p=1) -> GELU -> conv2(k=3,s=2,p=1)
-> GELU -> transpose -> + positional embedding (sliced to seq) -> L
pre-norm blocks (LN -> non-causal self-attn -> residual; LN -> FFN ->
residual, src/model/encoder.rs:37-49) -> final LN -> ``[B, 1500, D]``.

TPU design: blocks are a ``lax.scan`` over stacked layer params; convs go
through ``lax.conv_general_dilated`` (MXU-lowered) instead of the
reference's hand-rolled im2col (src/model/layers.rs:77-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_burn_tpu.models.attention import attention
from whisper_burn_tpu.models.config import WhisperConfig
from whisper_burn_tpu.models.layers import conv1d, gelu, layer_norm
from whisper_burn_tpu.models.params import Params
from whisper_burn_tpu.ops import Compute, apply_ffn, apply_reduce_linear, qkv_proj
from whisper_burn_tpu.ops.flash_prefill import prefill_attention


def encoder_block(
    x: jnp.ndarray,
    bp: Params,
    cfg: WhisperConfig,
    compute: Compute,
    valid: int | None = None,
) -> jnp.ndarray:
    """One pre-norm encoder block (src/model/encoder.rs:37-49).

    Under tensor parallelism (``compute.tp > 1``, shard_map body) q/k/v are
    head-sharded — the local head count is ``n_audio_head // tp`` and the
    output projection carries the cross-shard psum (apply_reduce_linear).

    ``valid``: real sequence length when the encoder pre-padded T (pad
    keys are masked in attention; pad rows elsewhere are discarded work).
    """
    n_heads = cfg.n_audio_head // compute.tp
    h = layer_norm(x, bp["attn_ln"]["g"], bp["attn_ln"]["b"])
    q, k, v = qkv_proj(bp, h, compute)
    a = None
    if compute.use_pallas:
        a = prefill_attention(q, k, v, n_heads, compute, valid=valid)
    if a is None:
        if valid is not None and valid != x.shape[1]:
            from whisper_burn_tpu.models.attention import length_mask

            a = attention(
                q, k, v, n_heads,
                mask=length_mask(jnp.asarray(valid), x.shape[1]),
                compute=compute,
            )
        else:
            a = attention(q, k, v, n_heads, mask=None, compute=compute)
    x = x + apply_reduce_linear(bp["attn_o"], a, compute)

    h = layer_norm(x, bp["mlp_ln"]["g"], bp["mlp_ln"]["b"])
    return x + apply_ffn(bp, h, cfg.gelu, compute)


def encode(
    params: Params, mel: jnp.ndarray, cfg: WhisperConfig, compute: Compute
) -> jnp.ndarray:
    """Encode mel ``[B, n_mels, T_mel]`` -> hidden states ``[B, T_mel/2, D]``."""
    enc = params["encoder"]
    x = gelu(conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], stride=1, padding=1, compute=compute), cfg.gelu)
    x = gelu(conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2, padding=1, compute=compute), cfg.gelu)
    x = jnp.swapaxes(x, 1, 2)  # [B, T, D]

    seq = x.shape[1]
    x = x + enc["pos"][:seq].astype(x.dtype)[None]

    # pad T to the attention kernel's 128-multiple ONCE for the whole
    # layer stack (1500 -> 1536): per-layer pads + head-layout transposes
    # around the old kernel cost ~30% of encoder wall time (r4 trace).
    # Pad rows carry garbage through LN/FFN (2.4% extra rows) and are
    # masked out of attention; sliced away before ln_post.
    tp = -(-seq // 128) * 128
    from whisper_burn_tpu.ops.pallas_encoder_attention import supported as _pk_ok

    pad_stack = (
        compute.use_pallas
        and tp != seq
        and _pk_ok(tp, cfg.n_audio_state // compute.tp, cfg.n_audio_head // compute.tp)
    )
    if pad_stack:
        x = jnp.pad(x, ((0, 0), (0, tp - seq), (0, 0)))

    def block(carry, bp):
        return encoder_block(
            carry, bp, cfg, compute, valid=seq if pad_stack else None
        ), None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    if pad_stack:
        x = x[:, :seq]
    return layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])
