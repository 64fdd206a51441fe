"""Whisper text decoder with a preallocated, donated KV cache.

Contract (reference: src/model/decoder.rs):

* token embedding lookup + learned positional embedding sliced by absolute
  position (:211-226, :317-329)
* pre-norm blocks: self-attn (causal) -> cross-attn -> FFN (:77-167)
* cross K/V computed once from encoder output at prefill and reused every
  step (:154-159, attention.rs:204-236)
* output projection = tied token-embedding transpose, no bias (:240-244)

TPU design (the deliberate departures, SURVEY §7.3):

* the KV cache is **preallocated** at ``[L, B, n_text_ctx, D]`` and updated
  in place with ``lax.dynamic_update_slice`` — never the reference's
  grow-by-concat ``Option<Tensor>`` (decoder.rs:16-45, attention.rs:106-113),
  which reallocates every token;
* blocks run under ``lax.scan`` with the cache in the carry so XLA keeps
  updates in-place inside the decode ``while_loop``;
* logits stay on device — the reference's per-token ``into_data()`` host
  sync (decoder.rs:294-295, 346-347) has no counterpart here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_burn_tpu.models.attention import (
    attention,
    attention_grouped,
    attention_kt,
    causal_mask,
    length_mask,
)
from whisper_burn_tpu.models.config import WhisperConfig
from whisper_burn_tpu.models.layers import gelu, layer_norm
from whisper_burn_tpu.models.params import Params
from whisper_burn_tpu.ops import (
    Compute,
    apply_ffn,
    apply_linear,
    apply_reduce_linear,
    cross_kv_proj,
    qkv_proj,
)


class KVCache(NamedTuple):
    """Preallocated decoder cache (replaces src/model/decoder.rs:16-45).

    With an int8 cross cache (``Compute.fastest()``), ``cross_{k,v}_scale``
    hold per-(layer, channel) dequant scales ``[L, D]`` f32; they fold into
    the query (K side) and the attention output (V side), so the kernels
    never touch them.
    """

    self_k: jnp.ndarray  # [L, B, n_text_ctx, D]
    self_v: jnp.ndarray  # [L, B, n_text_ctx, D]
    # cross keys are stored TRANSPOSED [L, B, D, T] when the Pallas kT
    # kernel serves cross-attention (cross_kt_layout): heads ride sublanes
    # in the scores matmul, 4x fewer MXU cycles than the v1 lane-padded
    # form. Natural [L, B, T, D] otherwise. Values are always natural.
    cross_k: jnp.ndarray  # [L, B, T, D] or [L, B, D, T] (compute or int8)
    cross_v: jnp.ndarray  # [L, B, n_audio_ctx, D]
    cross_k_scale: jnp.ndarray | None = None  # [L, D] f32 when int8
    cross_v_scale: jnp.ndarray | None = None
    # self K/V arrive one token at a time, so int8 storage uses per-TOKEN
    # absmax/127 scales (vs the cross cache's per-channel scales), stored
    # interleaved [L, B, T, 2] (K in lane 0, V in lane 1) so the decode
    # kernel fetches both with ONE small DMA per block and reads them on
    # sublanes.
    self_kv_scale: jnp.ndarray | None = None  # [L, B, n_text_ctx, 2] f32 when int8


def init_cache(
    cfg: WhisperConfig, batch: int, compute: Compute, ctx: int | None = None
) -> KVCache:
    """``ctx`` right-sizes the self cache (prompt + max generated tokens);
    the reference always holds the full 448 (src/model/config.rs:17) but a
    224-token greedy run only ever touches 228 slots — a free ~2x on
    self-attention cache bandwidth. Under tensor parallelism the cache is
    head-sharded: per-shard width D // tp."""
    l, d = cfg.n_text_layer, cfg.n_text_state // compute.tp
    ctx = cfg.n_text_ctx if ctx is None else ctx
    cross_t = cross_cache_len(cfg, compute)
    z = lambda t, dt: jnp.zeros((l, batch, t, d), dt)
    # int4 self caches: channel pairs (j, j+D/2) share a byte; K and V may
    # differ (mixed 8K/4V mode, compute.self_kv_vbits)
    zs = lambda t, dt: jnp.zeros(
        (l, batch, t, d // 2 if compute.self_kv_packed else d), dt
    )
    zsv = lambda t, dt: jnp.zeros(
        (l, batch, t, d // 2 if compute.self_v_packed else d), dt
    )
    kv_dt = compute.cross_kv_dtype
    # int4: two time positions pack into each stored byte (uint8)
    stored_t = cross_t // 2 if compute.kv_packed else cross_t
    sc = (jnp.ones((l, d), jnp.float32),) * 2 if compute.quantized_kv else (None, None)
    # kT layout: int4 keys pack along D (stored [D/2, T], pairs split-dotted
    # in the kernel); int8/bf16 keys stay [D, T]
    if cross_kt_layout(cfg, compute):
        ck = jnp.zeros(
            (l, batch, d // 2 if compute.kv_packed else d, cross_t), kv_dt
        )
    else:
        ck = z(stored_t, kv_dt)
    self_dt = compute.self_kv_storage_dtype
    # per-token scale lanes: 1 scalar (int8) or self_kv_groups (int4) per
    # side, K lanes first then V lanes
    ssc_w = (self_kv_groups(d) if compute.self_kv_packed else 1) + (
        self_kv_groups(d) if compute.self_v_packed else 1
    )
    ssc = (
        jnp.zeros((l, batch, ctx, ssc_w), jnp.float32)
        if compute.quantized_self_kv
        else None
    )
    return KVCache(
        zs(ctx, self_dt), zsv(ctx, compute.self_v_storage_dtype), ck,
        z(stored_t, kv_dt), *sc, ssc
    )


def cross_cache_len(cfg: WhisperConfig, compute: Compute) -> int:
    """Cross-cache *logical* time length: padded to a flash-kernel tile
    multiple when the Pallas path is active (1500 -> 1536; padded keys are
    masked). int4 packing needs an even length (two positions per byte)."""
    t = cfg.n_audio_ctx
    if not compute.use_pallas:
        return -(-t // 2) * 2 if compute.kv_packed else t
    align = 512 if t >= 512 else 8
    return -(-t // align) * align


def _flash_cross_ok(cfg: WhisperConfig, compute: Compute) -> bool:
    """Static check that the flash decode path can serve cross-attention
    (mirrors the cross-side conditions of :func:`_flash_supported`, but
    computable without a cache — cross_cache_len is config-derived)."""
    from whisper_burn_tpu.ops.pallas_attention import H_PAD, _largest_tile

    h_loc = cfg.n_text_head // compute.tp
    d_loc = cfg.n_text_state // compute.tp
    if h_loc > H_PAD or h_loc == 0 or d_loc % h_loc != 0:
        return False
    if cross_kt_layout(cfg, compute):
        return True
    if compute.kv_packed:
        return False
    return _largest_tile(cross_cache_len(cfg, compute)) is not None


def cross_kt_layout(cfg: WhisperConfig, compute: Compute) -> bool:
    """True when cross keys are stored transposed [L, B, D, T] for the
    Pallas kT decode kernel (the layout and the kernel dispatch must agree,
    so both derive from this one predicate)."""
    from whisper_burn_tpu.ops.pallas_attention import kt_kernel_supported

    if not compute.use_pallas:
        return False
    # packed int4 halves the stored bytes per logical key position
    itemsize = 0.5 if compute.kv_packed else jnp.dtype(compute.cross_kv_dtype).itemsize
    return kt_kernel_supported(
        cross_cache_len(cfg, compute),
        cfg.n_text_state // compute.tp,
        cfg.n_text_head // compute.tp,
        itemsize,
    )


def _embed(dec: Params, tokens: jnp.ndarray, positions: jnp.ndarray, compute: Compute) -> jnp.ndarray:
    """tokens [B, T] + absolute positions [T] -> [B, T, D]
    (src/model/decoder.rs:211-226)."""
    tok = jnp.take(dec["tok_emb"], tokens, axis=0)
    pos = jnp.take(dec["pos"], positions, axis=0)
    return (tok + pos[None]).astype(compute.dtype)


def _logits(
    dec: Params,
    x: jnp.ndarray,
    cfg: WhisperConfig,
    compute: Compute,
    rows: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Final LN + tied-embedding projection; padded vocab masked to -inf.

    ``x: [B, D]`` -> ``[B, n_vocab_padded]`` float32
    (src/model/decoder.rs:240-244).

    With ``compute.quantized_logits`` and a prepared ``tok_emb_q``
    (transcribe.prepare_params), the projection streams an int8 copy of
    the embedding with 32-block scales — half the decode loop's
    0.13 GB/step bf16 embedding read — through the fused Pallas kernel,
    accumulating f32 (accuracy-gated; sweep row q8_logits).

    ``rows=(start, end)``: project onto that embedding-row slice only and
    return ``[B, end-start]`` (language auto-detect needs just the
    100-token lang range — a [D, 100] matmul instead of [D, 51872],
    VERDICT r3 #9). The padded-vocab mask is skipped (callers pass
    in-vocab ranges).
    """
    from whisper_burn_tpu.ops.q4_matmul import q4_matmul

    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    if rows is not None:
        start, end = rows
        emb = jax.lax.slice_in_dim(dec["tok_emb"], start, end, axis=0)
        return jnp.matmul(
            x.astype(compute.dtype),
            emb.astype(compute.dtype).T,
            precision=compute.precision,
            preferred_element_type=jnp.float32,
        )
    q = dec.get("tok_emb_q") if compute.quantized_logits else None
    if compute.quantized_logits and q is None:
        raise ValueError(
            "compute.quantized_logits needs params prepared with "
            "transcribe.prepare_params (missing decoder.tok_emb_q)"
        )
    if q is not None:
        logits = q4_matmul(
            x.astype(compute.dtype), q["qw"], q["scales"], compute,
            out_dtype=jnp.float32,
        )
        # tok_emb_q is pre-padded to the kernel's 512-wide N tile
        # (transcribe.quantize_logit_embedding); slice back so logits
        # widths match the unquantized path (the slice fuses into the
        # pad mask below — no copy)
        logits = logits[..., : cfg.n_vocab_padded]
    else:
        logits = jnp.matmul(
            x.astype(compute.dtype),
            dec["tok_emb"].astype(compute.dtype).T,
            precision=compute.precision,
            preferred_element_type=jnp.float32,
        )
    pad = jnp.arange(logits.shape[-1]) >= cfg.n_vocab
    return jnp.where(pad[None, :], -jnp.inf, logits)


def _cross_attn(
    bp, h, ck, cv, n_heads, compute, mask=None, transposed=False, batch_groups=1
):
    q = apply_linear(bp["xattn_q"], h, compute)
    if batch_groups > 1:  # shared per-utterance cache, W streams each
        return attention_grouped(
            q, ck, cv, n_heads, batch_groups, mask=mask, compute=compute
        )
    if transposed:
        return attention_kt(q, ck, cv, n_heads, mask=mask, compute=compute)
    return attention(q, ck, cv, n_heads, mask=mask, compute=compute)


def compute_cross_kv(
    params: Params,
    cfg: WhisperConfig,
    enc_out: jnp.ndarray,
    compute: Compute,
    pad_to: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention K/V for all layers, computed once per utterance
    (src/model/attention.rs:208-236). Returns ``([L, B, T, D], same)`` with
    ``T = pad_to`` (zero-padded, mask-covered) or the encoder length.

    Kept separate from :func:`prefill` so language auto-detection (an extra
    1-token prompt pass, whisper.py) reuses it instead of re-projecting the
    1500-frame encoder output through 2L matmuls.
    """
    enc = enc_out.astype(compute.dtype)

    def block(_, bp):
        ck, cv = cross_kv_proj(bp, enc, compute)
        return None, (ck, cv)

    _, (cks, cvs) = jax.lax.scan(block, None, params["decoder"]["blocks"])
    t = enc_out.shape[1]
    if pad_to is not None and pad_to > t:
        pad = ((0, 0), (0, 0), (0, pad_to - t), (0, 0))
        cks, cvs = jnp.pad(cks, pad), jnp.pad(cvs, pad)
    return cks, cvs


def _quantize_tokens(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8 quantization over the channel axis.

    ``x: [..., D]`` -> (``int8 [..., D]``, ``f32 scale [..., 1]``). Used for
    the self-KV cache, whose entries are written one token at a time.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.round(xf / scale).astype(jnp.int8), scale


def self_kv_group_size(d: int) -> int:
    """Channel-group width for int4 self-KV scales: the largest power of
    two <= 128 dividing the nibble-half width D/2 (groups never span the
    lo/hi packing halves). Full-width fallback when D/2 is odd."""
    d2 = d // 2
    for gsz in (128, 64, 32, 16, 8, 4, 2, 1):
        if d2 % gsz == 0:
            return gsz
    return max(d2, 1)


def self_kv_groups(d: int) -> int:
    """Number of int4 self-KV scale groups for channel width ``d`` (always
    even: the lo and hi nibble halves get ``ng/2`` groups each)."""
    d2 = d // 2
    return 2 * max(1, d2 // self_kv_group_size(d))


def _quantize_tokens4(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token, per-channel-group int4 quantization (VERDICT r3 #2).

    ``x: [..., D]`` -> (``uint8 [..., D/2]`` biased nibble pairs via
    :func:`pack_int4`, ``f32 scales [..., G]`` = per-group absmax/7 with
    ``G = self_kv_groups(D)``). The round-3 per-token scalar (absmax over
    all 1280 channels) lost 7 agreement points to channel outliers
    (ACCURACY.md row q4_int4selfkv); <=128-lane groups bound the outlier
    blast radius to one group. Scale order matches the packed layout:
    groups 0..G/2-1 cover the lo-nibble channels [0, D/2), G/2..G-1 the
    hi-nibble channels [D/2, D)."""
    d = x.shape[-1]
    gsz = self_kv_group_size(d)
    ng = self_kv_groups(d)
    xf = x.astype(jnp.float32)
    xg = xf.reshape(*x.shape[:-1], ng, gsz)
    amax = jnp.max(jnp.abs(xg), axis=-1)  # [..., G]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(xg / scale[..., None]), -8, 7)
    q = q.reshape(*x.shape[:-1], d).astype(jnp.int8)
    return pack_int4(q, axis=-1), scale


def _quantize_kv_layer(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel symmetric int8 quantization of one layer's [B, T, D]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1))  # [D]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def pack_int4(q4: jnp.ndarray, axis: int) -> jnp.ndarray:
    """int8 values in [-8, 7] -> biased-nibble uint8 pairs along ``axis``.

    Element ``j`` pairs with ``j + size/2`` (low/high nibble), so unpacking
    is two shifts + one concatenate — the halves land back in natural
    position order with no interleave (the same split Q4_0 uses within a
    block, src/gguf/shader.wgsl:82-88, applied to the time axis here).
    """
    lo, hi = jnp.split((q4 + 8).astype(jnp.uint8), 2, axis=axis)
    return lo | (hi << 4)


def unpack_int4(p: jnp.ndarray, axis: int, dtype) -> jnp.ndarray:
    """Inverse of :func:`pack_int4` (values only; scales applied outside)."""
    lo = (p & 15).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=axis).astype(dtype)


def _quantize_kv_layer4(x: jnp.ndarray, axis: int = 1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel int4 quantization of one layer's [B, T, D], packed along
    ``axis`` (1 = T for values, 2 = D for kT-layout keys). Scale = absmax/7
    per channel (Q4_0's rule, scripts §2.5)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1))  # [D]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7).astype(jnp.int8)
    return pack_int4(q, axis=axis), scale


def fill_cross_cache(
    params: Params,
    cfg: WhisperConfig,
    enc_out: jnp.ndarray,
    cache: KVCache,
    compute: Compute,
) -> KVCache:
    """Project encoder output to cross K/V and store (optionally int8).

    Quantization happens per layer *inside* the projection scan: the full
    bfloat16 ``[L, B, T, D]`` K/V (16 GB at B=64 Large-V3) is never
    materialized — only one layer's [B, T, D] lives between the matmul and
    the int8 store, which is what lets batch 64 fit in one chip's HBM.
    """
    transposed = cross_kt_layout(cfg, compute)

    if not compute.quantized_kv:
        ck, cv = compute_cross_kv(
            params, cfg, enc_out, compute, pad_to=cache.cross_v.shape[2]
        )
        if transposed:
            ck = jnp.swapaxes(ck, 2, 3)  # [L, B, T, D] -> [L, B, D, T]
        return cache._replace(cross_k=ck, cross_v=cv)

    enc = enc_out.astype(compute.dtype)
    pad_to = cross_cache_len(cfg, compute)
    t = enc.shape[1]
    packed = compute.kv_packed

    def block(_, bp):
        ck, cv = cross_kv_proj(bp, enc, compute)
        if pad_to > t:
            pad = ((0, 0), (0, pad_to - t), (0, 0))
            ck, cv = jnp.pad(ck, pad), jnp.pad(cv, pad)
        if packed:
            # kT keys pack along D, values along T (the kernel split-dots
            # the halves; see ops/pallas_attention._kt_kernel)
            ck_q, ks = _quantize_kv_layer4(ck, axis=2 if transposed else 1)
            cv_q, vs = _quantize_kv_layer4(cv, axis=1)
        else:
            ck_q, ks = _quantize_kv_layer(ck)
            cv_q, vs = _quantize_kv_layer(cv)
        if transposed:
            ck_q = jnp.swapaxes(ck_q, 1, 2)  # [B, T, D(/2)] -> [B, D(/2), T]
        return None, (ck_q, cv_q, ks, vs)

    _, (ck_q, cv_q, k_scale, v_scale) = jax.lax.scan(
        block, None, params["decoder"]["blocks"]
    )
    return cache._replace(
        cross_k=ck_q, cross_v=cv_q, cross_k_scale=k_scale, cross_v_scale=v_scale
    )


def _dequant_layer(
    c: jnp.ndarray, scale: jnp.ndarray | None, dtype, transposed: bool = False
) -> jnp.ndarray:
    """[B, T, D] (or [B, D, T]) int8 — or int4-packed uint8 with T halved —
    + [D] scale -> compute dtype."""
    if scale is None:
        return c
    if c.dtype == jnp.uint8:  # int4-packed: keys along D (kT), values along T
        c = unpack_int4(c, axis=1, dtype=dtype)
    s = scale.astype(dtype)
    return c.astype(dtype) * (s[None, :, None] if transposed else s[None, None, :])


def prefill(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    cache: KVCache,
    compute: Compute,
    pos_offset: int = 0,
    logit_rows: tuple[int, int] | None = None,
    write_cache: bool = True,
) -> tuple[jnp.ndarray, KVCache]:
    """Batched prompt pass writing self K/V into ``cache``.

    ``cache.cross_k/v`` must already be filled (:func:`compute_cross_kv`).
    ``tokens: [B, T]`` occupy cache positions ``[pos_offset, pos_offset+T)``.
    Returns (last-position logits ``[B, Vp]`` f32, cache) — the functional
    counterpart of ``forward_prompt`` (src/model/decoder.rs:251-296).

    ``logit_rows``/``write_cache=False``: throwaway-pass mode for language
    auto-detect (whisper.detect_language) — logits restricted to an
    embedding-row slice and the self-KV quantize + cache writes skipped
    (the detect pass discards them, VERDICT r3 #9).
    """
    dec = params["decoder"]
    b, t = tokens.shape
    n_heads = cfg.n_text_head // compute.tp  # per-shard heads under TP
    x = _embed(dec, tokens, jnp.arange(pos_offset, pos_offset + t), compute)
    mask = causal_mask(t, t)
    cross_t = cross_cache_len(cfg, compute)  # logical length (packed stores T/2)
    transposed = cross_kt_layout(cfg, compute)
    cross_mask = (
        length_mask(jnp.asarray(cfg.n_audio_ctx), cross_t)
        if cross_t != cfg.n_audio_ctx
        else None
    )

    quantized_cross = cache.cross_k_scale is not None
    dummy = jnp.zeros((cfg.n_text_layer, 0), jnp.float32)
    ksc = cache.cross_k_scale if quantized_cross else dummy
    vsc = cache.cross_v_scale if quantized_cross else dummy

    def block(x, xs):
        bp, ck, cv, ks_l, vs_l = xs
        h = layer_norm(x, bp["attn_ln"]["g"], bp["attn_ln"]["b"])
        q, k, v = qkv_proj(bp, h, compute)
        a = attention(q, k, v, n_heads, mask=mask, compute=compute)
        x = x + apply_reduce_linear(bp["attn_o"], a, compute)

        if quantized_cross:
            ck = _dequant_layer(ck, ks_l, compute.dtype, transposed=transposed)
            cv = _dequant_layer(cv, vs_l, compute.dtype)
        h = layer_norm(x, bp["xattn_ln"]["g"], bp["xattn_ln"]["b"])
        a = _cross_attn(
            bp, h, ck, cv, n_heads, compute, cross_mask, transposed=transposed
        )
        x = x + apply_reduce_linear(bp["xattn_o"], a, compute)

        h = layer_norm(x, bp["mlp_ln"]["g"], bp["mlp_ln"]["b"])
        x = x + apply_ffn(bp, h, cfg.gelu, compute)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(
        block, x, (params["decoder"]["blocks"], cache.cross_k, cache.cross_v, ksc, vsc)
    )

    if not write_cache:
        return _logits(dec, x[:, -1], cfg, compute, rows=logit_rows), cache

    sl = (slice(None), slice(None), slice(pos_offset, pos_offset + t))
    if compute.quantized_self_kv:
        quant_k = _quantize_tokens4 if compute.self_kv_packed else _quantize_tokens
        quant_v = _quantize_tokens4 if compute.self_v_packed else _quantize_tokens
        ks, ksc = quant_k(ks)
        vs, vsc = quant_v(vs)
        kvsc = jnp.concatenate([ksc, vsc], axis=-1)  # [L, B, t, kw+vw]
        cache = cache._replace(
            self_kv_scale=cache.self_kv_scale.at[sl].set(kvsc),
        )
    cache = cache._replace(
        self_k=cache.self_k.at[sl].set(ks.astype(cache.self_k.dtype)),
        self_v=cache.self_v.at[sl].set(vs.astype(cache.self_v.dtype)),
    )
    logits = _logits(dec, x[:, -1], cfg, compute, rows=logit_rows)
    return logits, cache


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    cache: KVCache,
    compute: Compute,
    batch_groups: int = 1,
) -> tuple[jnp.ndarray, KVCache]:
    """One autoregressive step.

    ``token: [B]`` at cache position ``pos`` (scalar). Returns
    (``logits [B, Vp]`` f32, updated cache) — counterpart of ``decode_step``
    (src/model/decoder.rs:306-348) minus the host readback.

    ``batch_groups > 1`` (beam search) shares each cross-cache entry among
    that many consecutive streams; only the flash path supports it.
    """
    dec = params["decoder"]
    b = token.shape[0]
    n_heads = cfg.n_text_head // compute.tp  # per-shard heads under TP
    x = _embed(dec, token[:, None], pos[None], compute)  # [B, 1, D]

    if _flash_supported(cfg, cache, compute):
        return _decode_step_flash(
            params, cfg, x, pos, cache, compute, batch_groups=batch_groups
        )
    # batch_groups > 1 on this path shares each utterance's cross cache
    # among G consecutive streams via attention_grouped — the XLA
    # counterpart of the Pallas kernels' grouped index_map, so beam search
    # never materializes W cross-cache copies (VERDICT r1 weak #5).

    mask = length_mask(pos + 1, cache.self_k.shape[2])  # keys beyond pos are padding
    cross_t = cross_cache_len(cfg, compute)  # logical length (packed stores T/2)
    transposed = cross_kt_layout(cfg, compute)
    # (kT layouts imply the flash path was taken above; XLA attention only
    # ever sees natural [B, T, D] caches)
    assert not (batch_groups > 1 and transposed)
    cross_mask = (
        length_mask(jnp.asarray(cfg.n_audio_ctx), cross_t)
        if cross_t != cfg.n_audio_ctx
        else None
    )
    layer_idx = jnp.arange(cfg.n_text_layer)
    quantized_cross = cache.cross_k_scale is not None
    dummy = jnp.zeros((cfg.n_text_layer, 0), jnp.float32)
    ksc = cache.cross_k_scale if quantized_cross else dummy
    vsc = cache.cross_v_scale if quantized_cross else dummy

    quantized_self = compute.quantized_self_kv

    def block(carry, xs):
        x, sk, sv, ssc = carry
        bp, ck, cv, ks_l, vs_l, l = xs

        h = layer_norm(x, bp["attn_ln"]["g"], bp["attn_ln"]["b"])
        q, k, v = qkv_proj(bp, h, compute)  # [B, 1, D] each
        if quantized_self:
            quant_k = _quantize_tokens4 if compute.self_kv_packed else _quantize_tokens
            quant_v = _quantize_tokens4 if compute.self_v_packed else _quantize_tokens
            kq, ksc = quant_k(k)
            vq, vsc = quant_v(v)
            sk = jax.lax.dynamic_update_slice(sk, kq[None], (l, 0, pos, 0))
            sv = jax.lax.dynamic_update_slice(sv, vq[None], (l, 0, pos, 0))
            kvsc = jnp.concatenate([ksc, vsc], axis=-1)  # [B, 1, 2]
            ssc = jax.lax.dynamic_update_slice(ssc, kvsc[None], (l, 0, pos, 0))
        else:
            sk = jax.lax.dynamic_update_slice(sk, k[None], (l, 0, pos, 0))
            sv = jax.lax.dynamic_update_slice(sv, v[None], (l, 0, pos, 0))
        k_full = jax.lax.dynamic_index_in_dim(sk, l, 0, keepdims=False)
        v_full = jax.lax.dynamic_index_in_dim(sv, l, 0, keepdims=False)
        if quantized_self:
            d_loc = cfg.n_text_state // compute.tp
            sc_full = jax.lax.dynamic_index_in_dim(ssc, l, 0, keepdims=False)
            sc_full = sc_full.astype(compute.dtype)  # [B, ctx, 2] or [B, ctx, 2G]
            # per-group scales expand to channels (unpack order = group
            # order: lo-half groups then hi-half groups); K lanes first
            kw = self_kv_groups(d_loc) if compute.self_kv_packed else 1
            if compute.self_kv_packed:
                k_full = unpack_int4(k_full, axis=-1, dtype=compute.dtype)
                k_full = k_full * jnp.repeat(
                    sc_full[..., :kw], d_loc // kw, axis=-1
                )
            else:
                k_full = k_full.astype(compute.dtype) * sc_full[..., 0:1]
            if compute.self_v_packed:
                vw = self_kv_groups(d_loc)
                v_full = unpack_int4(v_full, axis=-1, dtype=compute.dtype)
                v_full = v_full * jnp.repeat(
                    sc_full[..., kw : kw + vw], d_loc // vw, axis=-1
                )
            else:
                v_full = v_full.astype(compute.dtype) * sc_full[..., kw : kw + 1]
        a = attention(q, k_full, v_full, n_heads, mask=mask, compute=compute)
        x = x + apply_reduce_linear(bp["attn_o"], a, compute)

        if quantized_cross:
            ck = _dequant_layer(ck, ks_l, compute.dtype, transposed=transposed)
            cv = _dequant_layer(cv, vs_l, compute.dtype)
        h = layer_norm(x, bp["xattn_ln"]["g"], bp["xattn_ln"]["b"])
        a = _cross_attn(
            bp, h, ck, cv, n_heads, compute, cross_mask,
            transposed=transposed, batch_groups=batch_groups,
        )
        x = x + apply_reduce_linear(bp["xattn_o"], a, compute)

        h = layer_norm(x, bp["mlp_ln"]["g"], bp["mlp_ln"]["b"])
        x = x + apply_ffn(bp, h, cfg.gelu, compute)
        return (x, sk, sv, ssc), None

    zero = jnp.zeros((), jnp.float32)  # scan carries must be arrays
    (x, sk, sv, ssc), _ = jax.lax.scan(
        block,
        (
            x,
            cache.self_k,
            cache.self_v,
            cache.self_kv_scale if quantized_self else zero,
        ),
        (params["decoder"]["blocks"], cache.cross_k, cache.cross_v, ksc, vsc, layer_idx),
    )
    logits = _logits(dec, x[:, 0], cfg, compute)
    cache = cache._replace(self_k=sk, self_v=sv)
    if quantized_self:
        cache = cache._replace(self_kv_scale=ssc)
    return logits, cache


def _flash_supported(cfg: WhisperConfig, cache: KVCache, compute: Compute) -> bool:
    """Static dispatch check for the Pallas flash-decode path."""
    from whisper_burn_tpu.ops.pallas_attention import H_PAD, _largest_tile

    if not compute.use_pallas:
        return False
    h_loc = cfg.n_text_head // compute.tp
    d_loc = cfg.n_text_state // compute.tp
    if h_loc > H_PAD or h_loc == 0 or d_loc % h_loc != 0:
        return False
    ctx = cache.self_v.shape[2]
    if _largest_tile(ctx) is None:
        return False
    if (compute.self_kv_packed or compute.self_v_packed) and _largest_tile(ctx) != ctx:
        return False  # int4 self unpack only in the single-pass kernel
    if cross_kt_layout(cfg, compute):
        return True  # the transposed layout is only chosen when supported
    if compute.kv_packed:
        return False  # only the kT kernel unpacks int4; fall back to XLA
    return _largest_tile(cache.cross_v.shape[2]) is not None


def _st_lin_ok(st, m: int) -> bool:
    """Static check: this linear's stacked [L, K, N] weights are servable
    by the layer-indexed Pallas matmul (ops/pallas_q4._q4_matmul_2d_stacked).
    Mirrors q4_matmul_pallas_stacked's own gates via the kernel module's
    constants so they cannot drift (ADVICE r3)."""
    from whisper_burn_tpu.ops.pallas_q4 import BK, BM_MAX, stacked_bn

    if not isinstance(st, dict) or "qw" not in st or "scales" not in st:
        return False
    if st["qw"].ndim != 3:
        return False
    _, k, n = st["qw"].shape
    return m <= BM_MAX and k % BK == 0 and stacked_bn(k, n) is not None


def _st_ffn_ok(fc1, fc2, m: int) -> bool:
    """Static check for the layer-indexed fused FFN kernel."""
    from whisper_burn_tpu.ops.pallas_ffn import BM_MAX, ffn_bf

    if not isinstance(fc1, dict) or "qw" not in fc1 or fc1["qw"].ndim != 3:
        return False
    if "scales" not in fc1 or not isinstance(fc2, dict) or "scales" not in fc2:
        return False
    if "b" not in fc1 or "b" not in fc2:
        return False
    l_dim, d, f = fc1["qw"].shape
    return (
        m <= BM_MAX
        and ffn_bf(d, f) is not None
        and "qw" in fc2
        and fc2["qw"].shape == (l_dim, f, d)
    )


def _prune_scanned(st: dict) -> dict:
    """Scan-xs view of a linear whose weights go through a stacked kernel:
    only the bias is sliced per layer (the qw/scales slices would otherwise
    materialize ~1.3 ms/step of per-layer weight copies at B=64)."""
    return {k: v for k, v in st.items() if k == "b"}


def _decode_step_flash(
    params: Params,
    cfg: WhisperConfig,
    x: jnp.ndarray,
    pos: jnp.ndarray,
    cache: KVCache,
    compute: Compute,
    batch_groups: int = 1,
) -> tuple[jnp.ndarray, KVCache]:
    """Flash-decode path: the Pallas kernel reads the layered cache in place
    (scalar-prefetched layer index), the current token is flash-merged as an
    extra key, and the cache update is ONE deferred dynamic_update_slice per
    K/V — the per-step cache traffic is exactly one read of the live keys.

    The block matmuls likewise take layer-indexed stacked-weight kernels
    (scalar-prefetched, ops/pallas_q4 + ops/pallas_ffn): letting lax.scan
    slice the quantized weights per layer costs a dynamic-slice copy + pad
    of every weight every step (~1.3 ms/step at B=64, profiled 2026-08)."""
    from whisper_burn_tpu.ops.pallas_attention import (
        _largest_tile,
        decode_attention_kT,
        decode_attention_layer,
        decode_attention_merged,
        flash_merge_extra_key,
        normalize,
    )

    dec = params["decoder"]
    h = cfg.n_text_head // compute.tp  # per-shard heads under TP
    t_enc = jnp.asarray(cfg.n_audio_ctx, jnp.int32)  # padded tail is masked
    layer_idx = jnp.arange(cfg.n_text_layer)
    quantized_cross = cache.cross_k_scale is not None
    transposed = cross_kt_layout(cfg, compute)
    # single-tile ctx (the serving right-sized cache): the kernels carry
    # the whole epilogue — extra-key flash merge and normalization happen
    # in-VMEM instead of ~25 small XLA ops per layer per step
    ctx_single_tile = (
        _largest_tile(cache.self_v.shape[2]) == cache.self_v.shape[2]
    )
    # in-kernel cache write-back (r5): on the merged int8 path the current
    # token's quantized K/V rows are stored by the attention kernel itself
    # (aliased 8-row-tile outputs; the tile is already in VMEM for the
    # attention read) — the self caches move into the scan CARRY so the
    # in-place aliasing chains through the layers
    from whisper_burn_tpu.ops.pallas_attention import merged_store_ok

    store_in_kernel = (
        ctx_single_tile
        and batch_groups == 1
        and compute.use_pallas
        and merged_store_ok(
            cache.self_k, cache.self_v, cache.self_kv_scale, x.shape[0]
        )
    )

    from whisper_burn_tpu.ops.pallas_ffn import fused_ffn_pallas_stacked
    from whisper_burn_tpu.ops.pallas_q4 import q4_matmul_pallas_stacked

    blocks = dec["blocks"]
    m_rows = x.shape[0]  # decode x is [B, 1, D]
    st_ok = {
        name: compute.use_pallas and _st_lin_ok(blocks.get(name), m_rows)
        for name in ("attn_qkv", "attn_o", "xattn_q", "xattn_o")
    }
    st_ffn = compute.use_pallas and _st_ffn_ok(
        blocks.get("fc1"), blocks.get("fc2"), m_rows
    )

    def _sliced(name, bp, l):
        """Per-layer params for the fallback path: ``bp[name]`` when the
        scan carried them, else a dynamic slice of the stacked arrays
        (the pruned case — reachable only if a stacked-kernel gate and
        _st_lin_ok ever disagree; correct either way, ADVICE r3)."""
        p = bp[name]
        if "qw" in p or "w" in p:
            return p
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            blocks[name],
        )

    def st_lin(name, bp, l, xin):
        """Stacked-kernel linear when servable, else the per-layer slice
        path (bp then carries the full sliced params)."""
        y = None
        if st_ok[name]:
            st = blocks[name]
            y = q4_matmul_pallas_stacked(xin, st["qw"], st["scales"], l, compute)
        if y is None:  # _st_lin_ok mirrors the kernel's gates; be safe anyway
            return apply_linear(_sliced(name, bp, l), xin, compute)
        b = bp[name].get("b")
        return y + b.astype(y.dtype) if b is not None else y

    def st_reduce_lin(name, bp, l, xin):
        """Row-parallel stacked linear: matmul -> psum over tp -> + bias."""
        y = None
        if st_ok[name]:
            st = blocks[name]
            y = q4_matmul_pallas_stacked(xin, st["qw"], st["scales"], l, compute)
        if y is None:
            return apply_reduce_linear(_sliced(name, bp, l), xin, compute)
        if compute.tp_axis is not None:
            y = jax.lax.psum(y, compute.tp_axis)
        b = bp[name].get("b")
        return y + b.astype(y.dtype) if b is not None else y

    def block(carry, xs):
        if store_in_kernel:
            x, sk_c, sv_c = carry
        else:
            x, sk_c, sv_c = carry, cache.self_k, cache.self_v
        bp, l = xs

        hdn = layer_norm(x, bp["attn_ln"]["g"], bp["attn_ln"]["b"])
        if st_ok["attn_qkv"]:
            y = st_lin("attn_qkv", bp, l, hdn)
            d3 = y.shape[-1] // 3
            q, k_new, v_new = y[..., :d3], y[..., d3 : 2 * d3], y[..., 2 * d3 :]
        else:
            q, k_new, v_new = qkv_proj(bp, hdn, compute)
        a = None
        if store_in_kernel:
            # in-kernel cache write-back: quantize the current token here
            # (identical math to the deferred _quantize_tokens path) and
            # let the merged kernel land it in the aliased cache — the
            # separate RMW slot-writer launches disappear; only the tiny
            # per-token scales still write after the scan
            kq, ksc_l = _quantize_tokens(k_new)
            vq, vsc_l = _quantize_tokens(v_new)
            a, sk_c, sv_c = decode_attention_merged(
                q, sk_c, sv_c, l, pos, h, k_new, v_new,
                kv_scale4=cache.self_kv_scale, kq=kq, vq=vq,
            )
            scan_out = jnp.concatenate([ksc_l, vsc_l], axis=-1)  # [B, 1, 2]
        elif ctx_single_tile and batch_groups == 1:
            a = decode_attention_merged(
                q, sk_c, sv_c, l, pos, h, k_new, v_new,
                kv_scale4=cache.self_kv_scale,
            )
        if a is None:
            acc, m, lsum = decode_attention_layer(
                q, sk_c, sv_c, l, pos, h,
                kv_scale4=cache.self_kv_scale,
            )
            a = flash_merge_extra_key(acc, m, lsum, q, k_new, v_new, h)
        x = x + st_reduce_lin("attn_o", bp, l, a.astype(compute.dtype))

        hdn = layer_norm(x, bp["xattn_ln"]["g"], bp["xattn_ln"]["b"])
        qx = st_lin("xattn_q", bp, l, hdn)
        if quantized_cross:
            # per-channel int8 scales fold outside the kernel: K scale into
            # the query, V scale into the (un)normalized accumulator
            ks_l = jax.lax.dynamic_index_in_dim(cache.cross_k_scale, l, 0, keepdims=False)
            vs_l = jax.lax.dynamic_index_in_dim(cache.cross_v_scale, l, 0, keepdims=False)
            qx = qx * ks_l.astype(qx.dtype)[None, None, :]
        if transposed:
            acc, m, lsum = decode_attention_kT(
                qx, cache.cross_k, cache.cross_v, l, t_enc, h,
                batch_groups=batch_groups, normalized=True,
            )
            a = acc  # normalized in-kernel
        else:
            acc, m, lsum = decode_attention_layer(
                qx, cache.cross_k, cache.cross_v, l, t_enc, h,
                batch_groups=batch_groups,
            )
            a = normalize(acc, lsum, h)
        if quantized_cross:
            a = a * vs_l.astype(a.dtype)[None, None, :]
        x = x + st_reduce_lin("xattn_o", bp, l, a.astype(compute.dtype))

        hdn = layer_norm(x, bp["mlp_ln"]["g"], bp["mlp_ln"]["b"])
        y = None
        if st_ffn:
            y = fused_ffn_pallas_stacked(
                hdn, blocks["fc1"], blocks["fc2"], l, cfg.gelu, compute
            )
        if y is None:  # _st_ffn_ok mirrors the kernel's gates; be safe anyway
            fb = dict(bp)
            fb["fc1"], fb["fc2"] = _sliced("fc1", bp, l), _sliced("fc2", bp, l)
            x = x + apply_ffn(fb, hdn, cfg.gelu, compute)
        else:
            if compute.tp_axis is not None:
                y = jax.lax.psum(y, compute.tp_axis)
            x = x + (y + bp["fc2"]["b"].astype(y.dtype)).astype(x.dtype)
        if store_in_kernel:
            return (x, sk_c, sv_c), scan_out
        return x, (k_new, v_new)

    # prune the stacked-kernel weights out of the scanned pytree: scan
    # would otherwise dynamic-slice-copy them per layer (the kernels read
    # the stacked arrays in place via the prefetched layer index)
    xs_blocks = dict(blocks)
    for name, ok in st_ok.items():
        if ok:
            xs_blocks[name] = _prune_scanned(blocks[name])
    if st_ffn:
        xs_blocks["fc1"] = _prune_scanned(blocks["fc1"])
        xs_blocks["fc2"] = _prune_scanned(blocks["fc2"])
    if store_in_kernel:
        (x, sk, sv), scales = jax.lax.scan(
            block, (x, cache.self_k, cache.self_v), (xs_blocks, layer_idx)
        )
        # the K/V rows were written in-kernel; only the per-token scales
        # ([L, B, 1, 2] f32, ~0.3% of the K/V bytes) still write here
        cache = cache._replace(
            self_k=sk,
            self_v=sv,
            self_kv_scale=jax.lax.dynamic_update_slice(
                cache.self_kv_scale, scales, (0, 0, pos, 0)
            ),
        )
        logits = _logits(dec, x[:, 0], cfg, compute)
        return logits, cache

    x, (ks, vs) = jax.lax.scan(block, x, (xs_blocks, layer_idx))

    # deferred cache write: one slot across all layers
    if compute.quantized_self_kv:
        quant_k = _quantize_tokens4 if compute.self_kv_packed else _quantize_tokens
        quant_v = _quantize_tokens4 if compute.self_v_packed else _quantize_tokens
        ks, ksc = quant_k(ks)  # [L, B, 1, D(/2)] + [L, B, 1, kw]
        vs, vsc = quant_v(vs)
        cache = cache._replace(
            self_kv_scale=jax.lax.dynamic_update_slice(
                cache.self_kv_scale, jnp.concatenate([ksc, vsc], axis=-1), (0, 0, pos, 0)
            ),
        )
    def slot_write(arr, new):
        """XLA's dynamic_update_slice at a T position is a tile-row RMW
        scatter (measured 355 us/step at B=32, ~48x the slice bytes);
        the Pallas writer streams the same RMW at HBM bandwidth."""
        from whisper_burn_tpu.ops.pallas_cache import write_cache_slot

        new = new.astype(arr.dtype)
        if compute.use_pallas:
            out = write_cache_slot(arr, new, pos)
            if out is not None:
                return out
        return jax.lax.dynamic_update_slice(arr, new, (0, 0, pos, 0))

    sk = slot_write(cache.self_k, ks)
    sv = slot_write(cache.self_v, vs)
    logits = _logits(dec, x[:, 0], cfg, compute)
    return logits, cache._replace(self_k=sk, self_v=sv)
