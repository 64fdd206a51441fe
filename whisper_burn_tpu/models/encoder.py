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


def encoder_block(x: jnp.ndarray, bp: Params, cfg: WhisperConfig, compute: Compute) -> jnp.ndarray:
    """One pre-norm encoder block (src/model/encoder.rs:37-49).

    Under tensor parallelism (``compute.tp > 1``, shard_map body) q/k/v are
    head-sharded — the local head count is ``n_audio_head // tp`` and the
    output projection carries the cross-shard psum (apply_reduce_linear).
    """
    n_heads = cfg.n_audio_head // compute.tp
    h = layer_norm(x, bp["attn_ln"]["g"], bp["attn_ln"]["b"])
    q, k, v = qkv_proj(bp, h, compute)
    a = None
    if compute.use_pallas:
        a = prefill_attention(q, k, v, n_heads, compute, interpret=False)
    if a is None:
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

    def block(carry, bp):
        return encoder_block(carry, bp, cfg, compute), None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])
