"""Greedy transcription: encode -> prompt prefill -> on-device decode loop.

Decode protocol (reference: src/model/whisper.rs:51-128, SURVEY §2.6.5):

* prompt ``[SOT, lang, TRANSCRIBE, NO_TIMESTAMPS]``
* EOT suppressed for the first MIN_TOKENS=3 sampled positions
* greedy argmax over the full vocab; stop at EOT; cap MAX_TOKENS=224
* auto language detect = argmax of a 1-step pass restricted to the language
  token range (:72-88)

TPU design: the whole loop is one ``lax.while_loop`` inside one jit —
on-device argmax, fixed-shape token buffer, masked per-stream ``done``
flags for batched utterances. The reference syncs GPU->CPU and argmaxes on
the host every token (src/model/whisper.rs:116-138); that pattern is the
single biggest latency bug this design removes.

Language auto-detect divergence (deliberate, documented): the reference's
auto path feeds ``[SOT]`` at cache position 0, then prefills only
``[lang, TRANSCRIBE, NO_TS]`` *overwriting* the cache with positional
embeddings restarted at 0, leaving inconsistent absolute positions
(src/model/whisper.rs:72-93 + decoder.rs:262-282). We instead detect the
language from a throwaway ``[SOT]`` pass and then prefill the full 4-token
prompt from position 0 — OpenAI Whisper's actual protocol. With an explicit
language the two implementations match exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_burn_tpu.models.config import EOT, MAX_TOKENS, MIN_TOKENS, SOT, WhisperConfig
from whisper_burn_tpu.models.decoder import (
    KVCache,
    decode_step,
    fill_cross_cache,
    init_cache,
    prefill,
)
from whisper_burn_tpu.models.encoder import encode
from whisper_burn_tpu.models.params import Params
from whisper_burn_tpu.ops import Compute

PROMPT_LEN = 4


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray  # int32 [B, max_tokens]; EOT-filled after stop
    n_generated: jnp.ndarray  # int32 [B]; non-EOT token count per stream
    lang_tokens: jnp.ndarray  # int32 [B]; the language token actually used


def detect_language(
    params: Params, cfg: WhisperConfig, cache: KVCache, compute: Compute
) -> jnp.ndarray:
    """Language token per stream from a 1-step ``[SOT]`` pass with argmax
    restricted to [50259, 50259+n_lang) (src/model/whisper.rs:72-88)."""
    if cfg.lang_token_end > cfg.n_vocab:
        raise ValueError(
            f"vocab ({cfg.n_vocab}) does not contain the language-token range "
            f"[{cfg.lang_token_start}, {cfg.lang_token_end}) — auto-detect "
            "needs a real Whisper vocabulary"
        )
    b = cache.self_v.shape[1]
    sot = jnp.full((b, 1), SOT, jnp.int32)
    # lean throwaway pass: logits restricted to the 100-token language
    # range (a [D, n_lang] slice of the tied embedding instead of the full
    # 51k-vocab matmul) and no self-KV quantize/cache writes — the detect
    # pass discards both (VERDICT r3 #9)
    lang_logits, _ = prefill(
        params, cfg, sot, cache, compute,
        logit_rows=(cfg.lang_token_start, cfg.lang_token_end),
        write_cache=False,
    )
    return (
        jnp.argmax(lang_logits, axis=-1).astype(jnp.int32) + cfg.lang_token_start
    )


def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    lang_tokens: jnp.ndarray,
    compute: Compute,
    *,
    detect: bool = False,
    max_tokens: int = MAX_TOKENS,
    task: str = "transcribe",
    grow_cache: bool = True,
) -> GreedyResult:
    """Transcribe mel ``[B, n_mels, 3000]`` to token ids.

    ``lang_tokens: int32 [B]`` — explicit language token per stream; with
    ``detect=True``, entries ``< 0`` are auto-detected. ``task`` selects
    the prompt task token: "transcribe" (reference behavior) or
    "translate" (to-English; same token layout, src/model/config.rs:67).
    ``grow_cache``: two-phase self cache (half-size for the first half of
    the run) — identical tokens, less HBM traffic; disable to compile a
    single decode phase.
    """
    b = mel.shape[0]
    enc_out = encode(params, mel, cfg, compute)

    # right-size the self cache: prompt + generated tokens, 64-aligned
    ctx = min(cfg.n_text_ctx, max(64, -(-(PROMPT_LEN + max_tokens) // 64) * 64))
    # two-phase growing cache: the first ctx/2 - PROMPT steps run against a
    # half-size self cache (the decode kernel reads the whole tile every
    # step, so halving the cache halves the self-KV stream), then the cache
    # zero-pads to full size and decoding continues — bit-identical tokens
    # (padded keys are masked on every path), ~25-30% off the average
    # per-step self-KV read for one extra compiled phase.
    ctx1 = ctx // 2
    grow = grow_cache and ctx1 >= 64 and ctx1 % 64 == 0
    cache = init_cache(cfg, b, compute, ctx=ctx1 if grow else ctx)
    cache = fill_cross_cache(params, cfg, enc_out, cache, compute)

    if detect:
        detected = detect_language(params, cfg, cache, compute)
        lang_tokens = jnp.where(lang_tokens < 0, detected, lang_tokens)

    task_token = {
        "transcribe": cfg.transcribe_token,
        "translate": cfg.translate_token,
    }[task]
    prompt = jnp.stack(
        [
            jnp.full((b,), SOT, jnp.int32),
            lang_tokens.astype(jnp.int32),
            jnp.full((b,), task_token, jnp.int32),
            jnp.full((b,), cfg.no_timestamps_token, jnp.int32),
        ],
        axis=1,
    )  # [B, 4]

    logits, cache = prefill(params, cfg, prompt, cache, compute)

    # Sample #0: EOT always suppressed (src/model/whisper.rs:96-99).
    first = jnp.argmax(logits.at[:, EOT].set(-jnp.inf), axis=-1).astype(jnp.int32)

    tokens = jnp.full((b, max_tokens), EOT, jnp.int32).at[:, 0].set(first)
    done0 = jnp.zeros((b,), bool)

    class State(NamedTuple):
        k: jnp.ndarray  # number of samples taken so far
        cur: jnp.ndarray  # [B] last sampled token
        tokens: jnp.ndarray
        done: jnp.ndarray
        cache: KVCache

    def body(s: State) -> State:
        pos = PROMPT_LEN + s.k - 1  # cache slot for the token being fed
        logits, cache = decode_step(params, cfg, s.cur, pos, s.cache, compute)
        # EOT suppressed while fewer than MIN_TOKENS samples exist
        # (src/model/whisper.rs:119-122: steps 0,1 i.e. samples #1,#2).
        suppressed = logits.at[:, EOT].set(-jnp.inf)
        logits = jnp.where(s.k < MIN_TOKENS, suppressed, logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(s.done, EOT, nxt)
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.k))
        return State(s.k + 1, nxt, tokens, s.done | (nxt == EOT), cache)

    state = State(jnp.asarray(1, jnp.int32), first, tokens, done0, cache)
    if grow:
        # phase 1: positions stay < ctx1 (the last write lands at ctx1-1)
        cap1 = min(max_tokens, ctx1 - PROMPT_LEN)
        state = jax.lax.while_loop(
            lambda s: (s.k < cap1) & ~jnp.all(s.done), body, state
        )
        pad_t = lambda a: jnp.pad(
            a, ((0, 0), (0, 0), (0, ctx - ctx1), (0, 0))
        )
        c1 = state.cache
        grown = c1._replace(
            self_k=pad_t(c1.self_k),
            self_v=pad_t(c1.self_v),
            self_kv_scale=(
                pad_t(c1.self_kv_scale) if c1.self_kv_scale is not None else None
            ),
        )
        state = State(state.k, state.cur, state.tokens, state.done, grown)

    final = jax.lax.while_loop(
        lambda s: (s.k < max_tokens) & ~jnp.all(s.done), body, state
    )

    n_gen = jnp.sum(final.tokens != EOT, axis=-1).astype(jnp.int32)
    return GreedyResult(final.tokens, n_gen, lang_tokens)
