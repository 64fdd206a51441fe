"""Batched beam-search decoding (on-device, single compiled loop).

The reference implements greedy only (src/model/whisper.rs:104-125); beam
search is one of the BASELINE configs (config 5). Design:

* hypotheses live in the batch axis: ``B`` utterances x ``W`` beams flatten
  to a ``B*W`` stream dimension, so every kernel (flash-decode attention,
  fused Q4 matmuls) just sees a bigger batch;
* the **cross-KV cache is shared per utterance** — the flash kernel's
  scalar-prefetch index_map maps stream ``b`` to utterance ``b // W``
  (``batch_groups``), so beams add zero cross-cache HBM (the reference-
  style alternative would multiply the dominant decode-time read by W);
* self-KV caches are per-beam; hypothesis reordering gathers them along
  the stream axis after each top-k (``jnp.take``);
* finished beams are frozen: they may only extend with EOT at zero added
  score; termination when every beam of every utterance is done;
* final selection: highest total log-probability with length
  normalization ``score / n_tokens**alpha`` (alpha=1.0, Whisper-style).

Beams stay colocated with their utterance on the data-parallel mesh axis,
so *no cross-host hypothesis exchange is needed at all* — sharding the
utterance batch shards the beams with it. This is deliberately stronger
than exchanging hypothesis state over DCN: the collective-free layout is
what the {data} mesh axis buys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_burn_tpu.models.config import EOT, MAX_TOKENS, MIN_TOKENS, SOT, WhisperConfig
from whisper_burn_tpu.models.decoder import (
    decode_step,
    fill_cross_cache,
    init_cache,
    prefill,
)
from whisper_burn_tpu.models.encoder import encode
from whisper_burn_tpu.models.params import Params
from whisper_burn_tpu.models.whisper import PROMPT_LEN, detect_language
from whisper_burn_tpu.ops import Compute

NEG_INF = -1e30


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # int32 [B, max_tokens] best hypothesis, EOT-filled
    n_generated: jnp.ndarray  # int32 [B]
    scores: jnp.ndarray  # float32 [B] length-normalized log-prob of the best beam
    lang_tokens: jnp.ndarray  # int32 [B]


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - jax.lax.stop_gradient(m)
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))


def beam_decode(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    lang_tokens: jnp.ndarray,
    compute: Compute,
    *,
    beam_width: int = 5,
    detect: bool = False,
    max_tokens: int = MAX_TOKENS,
    length_penalty: float = 1.0,
    task: str = "transcribe",
) -> BeamResult:
    """Beam-search transcription of mel ``[B, n_mels, T]``."""
    b = mel.shape[0]
    w = beam_width
    bw = b * w
    enc_out = encode(params, mel, cfg, compute)

    ctx = min(cfg.n_text_ctx, max(64, -(-(PROMPT_LEN + max_tokens) // 64) * 64))
    # cross cache at utterance granularity [L, B, T, D]
    utt_cache = init_cache(cfg, b, compute, ctx=ctx)
    utt_cache = fill_cross_cache(params, cfg, enc_out, utt_cache, compute)

    if detect:
        detected = detect_language(params, cfg, utt_cache, compute)
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
    )
    logits, utt_cache = prefill(params, cfg, prompt, utt_cache, compute)
    logp0 = _log_softmax(logits.at[:, EOT].set(-jnp.inf))  # [B, Vp]

    # top-W first tokens seed the beams
    seed_logp, seed_tok = jax.lax.top_k(logp0, w)  # [B, W]

    # expand self caches to the stream axis B*W; the cross cache stays at
    # utterance granularity on every path — the flash kernel shares it via
    # its grouped index_map, the XLA path via attention_grouped — so beams
    # add ZERO cross-cache HBM (no W-fold repeat on any backend).
    def rep(x):
        return jnp.repeat(x, w, axis=1)

    quantized_self = utt_cache.self_kv_scale is not None
    cache = utt_cache._replace(
        self_k=rep(utt_cache.self_k),
        self_v=rep(utt_cache.self_v),
        self_kv_scale=rep(utt_cache.self_kv_scale) if quantized_self else None,
    )
    batch_groups = w

    tokens = jnp.full((bw, max_tokens), EOT, jnp.int32)
    tokens = tokens.at[:, 0].set(seed_tok.reshape(bw))
    scores = seed_logp.reshape(bw)
    done = jnp.zeros((bw,), bool)
    cur = seed_tok.reshape(bw)
    utt_idx = jnp.arange(bw) // w  # stream -> utterance

    class State(NamedTuple):
        k: jnp.ndarray
        cur: jnp.ndarray  # [BW]
        tokens: jnp.ndarray  # [BW, max_tokens]
        scores: jnp.ndarray  # [BW]
        done: jnp.ndarray  # [BW]
        cache: type(cache)

    def cond(s):
        return (s.k < max_tokens) & ~jnp.all(s.done)

    def body(s):
        pos = PROMPT_LEN + s.k - 1
        logits, cache2 = decode_step(
            params, cfg, s.cur, pos, s.cache, compute, batch_groups=batch_groups
        )
        suppressed = logits.at[:, EOT].set(-jnp.inf)
        logits = jnp.where(s.k < MIN_TOKENS, suppressed, logits)
        logp = _log_softmax(logits)  # [BW, Vp]
        vp = logp.shape[-1]

        # done beams may only emit EOT at zero cost
        done_row = jnp.full((vp,), NEG_INF).at[EOT].set(0.0)
        logp = jnp.where(s.done[:, None], done_row[None, :], logp)

        cand = s.scores[:, None] + logp  # [BW, Vp]
        cand = cand.reshape(b, w * vp)
        top_scores, top_idx = jax.lax.top_k(cand, w)  # [B, W]
        parent = top_idx // vp  # beam index within the utterance
        tok = (top_idx % vp).astype(jnp.int32)

        # flatten back to streams; gather per-beam state from parents
        src = (jnp.arange(b)[:, None] * w + parent).reshape(bw)  # [BW]
        new_scores = top_scores.reshape(bw)
        new_tok = tok.reshape(bw)
        new_done = jnp.take(s.done, src, axis=0) | (new_tok == EOT)
        new_tokens = jnp.take(s.tokens, src, axis=0)
        new_tokens = jax.lax.dynamic_update_slice(
            new_tokens, new_tok[:, None], (0, s.k)
        )
        cache3 = cache2._replace(
            self_k=jnp.take(cache2.self_k, src, axis=1),
            self_v=jnp.take(cache2.self_v, src, axis=1),
            self_kv_scale=(
                jnp.take(cache2.self_kv_scale, src, axis=1) if quantized_self else None
            ),
        )
        return State(s.k + 1, new_tok, new_tokens, new_scores, new_done, cache3)

    final = jax.lax.while_loop(
        cond, body, State(jnp.asarray(1, jnp.int32), cur, tokens, scores, done, cache)
    )

    # select the best beam per utterance by length-normalized score
    toks = final.tokens.reshape(b, w, max_tokens)
    n_gen = jnp.sum(toks != EOT, axis=-1)  # [B, W]
    norm = jnp.maximum(n_gen, 1).astype(jnp.float32) ** length_penalty
    normed = final.scores.reshape(b, w) / norm
    best = jnp.argmax(normed, axis=-1)  # [B]
    bi = jnp.arange(b)
    return BeamResult(
        tokens=toks[bi, best],
        n_generated=n_gen[bi, best].astype(jnp.int32),
        scores=normed[bi, best],
        lang_tokens=lang_tokens.astype(jnp.int32),
    )
