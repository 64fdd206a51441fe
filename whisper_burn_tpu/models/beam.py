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
* **banked-hypotheses early stopping** (the HF/fairseq scheme, pinned
  token-for-token by tests/test_hf_parity.py incl. the early-stop regime,
  VERDICT r3 #5): per step the top ``2W`` candidates are taken; EOT
  candidates ranked < W are *banked* into a per-utterance finished pool
  (score normalized by ``(k+1)**length_penalty``, k+1 counting the EOT),
  and the W live slots refill with the best non-EOT candidates — a
  finishing beam frees its slot instead of being frozen in place. An
  utterance is done when its pool holds W hypotheses and (with
  ``early_stopping=False``, the default heuristic) the best running raw
  score normalized at the current length cannot beat the worst banked
  score. At the token cap, still-live beams are banked at their final
  length and the best normalized hypothesis wins;
* final selection: highest normalized score over the pool.

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
    early_stopping: bool = False,
    task: str = "transcribe",
) -> BeamResult:
    """Beam-search transcription of mel ``[B, n_mels, T]``.

    ``early_stopping``: True stops an utterance as soon as W hypotheses
    are banked; False (default) additionally requires that no running beam
    can still beat the worst banked hypothesis (the HF heuristic).
    """
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

    # top-W first tokens seed the beams (sample #0 has EOT suppressed by
    # the decode protocol, so no hypothesis can finish at the seed step —
    # identical to HF's one-active-beam first expansion)
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
    scores = seed_logp.reshape(bw)  # raw log-prob sums of the live beams
    cur = seed_tok.reshape(bw)
    bi = jnp.arange(b)

    class State(NamedTuple):
        k: jnp.ndarray  # generated samples so far (live beams hold k tokens)
        cur: jnp.ndarray  # [BW]
        tokens: jnp.ndarray  # [BW, max_tokens] live hypotheses
        scores: jnp.ndarray  # [BW] raw sums
        pool_scores: jnp.ndarray  # [B, W] normalized, NEG_INF = empty slot
        pool_tokens: jnp.ndarray  # [B, W, max_tokens]
        pool_ngen: jnp.ndarray  # [B, W]
        done: jnp.ndarray  # [B] utterance finished
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

        cand = (s.scores[:, None] + logp).reshape(b, w * vp)
        # top-2W sorted candidates: EOT ones ranked < W bank to the pool,
        # the best W non-EOT ones refill the live slots (HF process())
        sc2, idx2 = jax.lax.top_k(cand, 2 * w)  # [B, 2W] sorted desc
        parent = idx2 // vp  # parent beam slot within the utterance
        tok = (idx2 % vp).astype(jnp.int32)
        eos = tok == EOT
        rank = jnp.arange(2 * w)[None, :]

        # ---- bank finished hypotheses -------------------------------
        # normalized score counts the EOT: generated_len = k + 1
        k_f = s.k.astype(jnp.float32)
        bank_sc = jnp.where(
            eos & (rank < w) & ~s.done[:, None],
            sc2 / (k_f + 1.0) ** length_penalty,
            NEG_INF,
        )  # [B, 2W]
        live_tok_rows = s.tokens.reshape(b, w, max_tokens)
        cand_rows = jnp.take_along_axis(live_tok_rows, parent[..., None], axis=1)
        # pool first in the concat: on ties an existing hypothesis wins
        # (HF add() requires strictly-greater to displace)
        all_sc = jnp.concatenate([s.pool_scores, bank_sc], axis=1)  # [B, 3W]
        all_rows = jnp.concatenate([s.pool_tokens, cand_rows], axis=1)
        all_ng = jnp.concatenate(
            [s.pool_ngen, jnp.broadcast_to(s.k, (b, 2 * w))], axis=1
        )
        new_pool_sc, keep_idx = jax.lax.top_k(all_sc, w)  # [B, W]
        new_pool_rows = jnp.take_along_axis(all_rows, keep_idx[..., None], axis=1)
        new_pool_ng = jnp.take_along_axis(all_ng, keep_idx, axis=1)

        # ---- refill the live beams with the best non-EOT candidates --
        live_m = ~eos  # [B, 2W]; >= W true per row (EOT is one vocab id)
        slot = jnp.cumsum(live_m.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(live_m & (slot < w), slot, w)  # W = dump column
        scat = lambda vals, fill: (
            jnp.full((b, w + 1), fill, vals.dtype).at[bi[:, None], tgt].set(vals)[:, :w]
        )
        new_scores = scat(sc2, jnp.asarray(NEG_INF, sc2.dtype))
        new_tok = scat(tok, jnp.asarray(EOT, tok.dtype))
        new_parent = scat(parent, jnp.zeros((), parent.dtype))

        # done utterances freeze: live state keeps its (unused) rows and
        # the cache gather becomes the identity
        frozen = s.done[:, None]
        new_scores = jnp.where(frozen, s.scores.reshape(b, w), new_scores)
        new_tok = jnp.where(frozen, s.cur.reshape(b, w), new_tok)
        new_parent = jnp.where(frozen, jnp.arange(w)[None, :], new_parent)
        new_pool_sc = jnp.where(frozen, s.pool_scores, new_pool_sc)
        new_pool_rows = jnp.where(frozen[..., None], s.pool_tokens, new_pool_rows)
        new_pool_ng = jnp.where(frozen, s.pool_ngen, new_pool_ng)

        src = (bi[:, None] * w + new_parent).reshape(bw)  # [BW] global gather
        new_tokens = jnp.take(s.tokens, src, axis=0)
        new_tokens = jax.lax.dynamic_update_slice(
            new_tokens, new_tok.reshape(bw)[:, None], (0, s.k)
        )
        cache3 = cache2._replace(
            self_k=jnp.take(cache2.self_k, src, axis=1),
            self_v=jnp.take(cache2.self_v, src, axis=1),
            self_kv_scale=(
                jnp.take(cache2.self_kv_scale, src, axis=1) if quantized_self else None
            ),
        )

        # ---- utterance-done update (HF is_done) ----------------------
        pool_full = jnp.sum(new_pool_sc > NEG_INF / 2, axis=1) >= w
        if early_stopping:
            now_done = pool_full
        else:
            # heuristic: the best running candidate, normalized at the
            # current length, can no longer beat the worst banked score
            best_attainable = sc2[:, 0] / (k_f + 1.0) ** length_penalty
            worst_pool = jnp.min(new_pool_sc, axis=1)
            now_done = pool_full & (worst_pool >= best_attainable)
        new_done = s.done | now_done

        return State(
            s.k + 1, new_tok.reshape(bw), new_tokens, new_scores.reshape(bw),
            new_pool_sc, new_pool_rows, new_pool_ng, new_done, cache3,
        )

    pool_scores0 = jnp.full((b, w), NEG_INF, jnp.float32)
    pool_tokens0 = jnp.full((b, w, max_tokens), EOT, jnp.int32)
    pool_ngen0 = jnp.zeros((b, w), jnp.int32)
    final = jax.lax.while_loop(
        cond,
        body,
        State(
            jnp.asarray(1, jnp.int32), cur, tokens, scores,
            pool_scores0, pool_tokens0, pool_ngen0, jnp.zeros((b,), bool), cache,
        ),
    )

    # finalize (HF finalize()): for utterances not done, bank the still-
    # live beams at their final length (no EOT counted: generated_len = k)
    k_f = jnp.maximum(final.k.astype(jnp.float32), 1.0)
    live_sc = jnp.where(
        final.done[:, None],
        NEG_INF,
        final.scores.reshape(b, w) / k_f**length_penalty,
    )
    all_sc = jnp.concatenate([final.pool_scores, live_sc], axis=1)  # [B, 2W]
    all_rows = jnp.concatenate(
        [final.pool_tokens, final.tokens.reshape(b, w, max_tokens)], axis=1
    )
    all_ng = jnp.concatenate(
        [final.pool_ngen, jnp.broadcast_to(final.k, (b, w))], axis=1
    )
    best_sc, best_idx = jax.lax.top_k(all_sc, 1)  # [B, 1]
    best_rows = jnp.take_along_axis(all_rows, best_idx[..., None], axis=1)[:, 0]
    best_ng = jnp.take_along_axis(all_ng, best_idx, axis=1)[:, 0]
    # EOT-fill beyond the hypothesis length (banked rows may carry stale
    # parent tokens past their bank position)
    col = jnp.arange(max_tokens)[None, :]
    best_rows = jnp.where(col < best_ng[:, None], best_rows, EOT)
    return BeamResult(
        tokens=best_rows,
        n_generated=best_ng.astype(jnp.int32),
        scores=best_sc[:, 0],
        lang_tokens=lang_tokens.astype(jnp.int32),
    )
