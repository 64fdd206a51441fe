"""Headline benchmark: audio-seconds/s per chip, Large-V3 Q4_0 greedy decode.

Runs the full compiled transcription step (log-mel -> encoder -> prefill ->
224-token greedy while_loop) on one chip with a 128-utterance data-parallel
batch, bf16 compute, flash prefill attention in the encoder, fused-QKV
Pallas Q4 matmuls, the flash-decode attention kernel, an int4-packed
cross-KV cache built layer-streamed (per-channel scales folded outside the
kernel), and a per-token int8 self-KV cache (scales applied inside the
decode kernel) — the memory halving that fits B=128 on one 16 GB chip.
Override via env: BENCH_BATCH, BENCH_KV=bf16,
BENCH_CONFIG=turbo|medium (headline stays large_v3). Weights are
fabricated-quantized at real Large-V3 shapes (no checkpoint download is
possible in this environment; the arithmetic/bandwidth profile is
identical to a real Q4_0 checkpoint). Random weights never emit EOT early,
so every stream decodes all 224 tokens — this measures the *worst-case*
decode; real audio exits at EOT and only gets faster.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "min",
"mean", "iters"} — value is computed from the MIN iteration time (the
steady-state measure; mean includes scheduler noise), each of the >=5
timed iterations individually synced (VERDICT r2 item 10).
Baseline: the 100x-real-time-per-chip target from BASELINE.md (the
reference publishes no numbers, SURVEY §6).

The stage breakdown runs in a FRESH subprocess (BENCH_MODE=breakdown) at
the same batch as the headline, attributed via cumulative-prefix programs
(each prefix is ONE jit with the headline's buffer economy, so it fits at
batch 128 where the r3/r4 stage-sliced version OOM'd — VERDICT r4 #4); a
half-batch retry remains as a recorded-never-silent fallback (ADVICE r2).
The breakdown also carries bytes-per-decode-step and achieved-GB/s
roofline accounting so the distance to HBM speed-of-light is tracked, not
guessed.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
SECONDS_PER_UTTERANCE = 30.0
TIMED_ITERS = int(os.environ.get("BENCH_ITERS", "5"))
TARGET_AUDIO_S_PER_S = 100.0  # BASELINE.md: >=100x real-time per chip
HBM_GBPS = 819e9  # v5e


def main() -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("WB_NO_STORE"):
        # A/B hook: disable the in-kernel cache write-back (falls back to
        # the r4 deferred slot writer); measurement only, never the default
        import whisper_burn_tpu.ops.pallas_attention as _pa

        _pa.merged_store_ok = lambda *a, **k: False

    from whisper_burn_tpu.audio.mel import MelFrontend
    from whisper_burn_tpu.transcribe import enable_compilation_cache

    enable_compilation_cache()
    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.models.whisper import greedy_decode
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import prepare_params

    cfg = {
        "large_v3": WhisperConfig.large_v3,
        "turbo": WhisperConfig.large_v3_turbo,
        "medium": WhisperConfig.medium,
    }[os.environ.get("BENCH_CONFIG", "large_v3")]()
    kv = os.environ.get("BENCH_KV", "int4")
    compute = {
        "bf16": Compute.fast(),
        "int8": Compute.fastest(),
        "int4": Compute.fastest(kv_bits=4),
    }[kv]
    # round-3 serving defaults: both cleared the 0.90 real-dims accuracy
    # floor at 0.949 (ACCURACY.md rows q4_int4kv_q8log / q4_w8a8). W8A8
    # REPLACES the encoder's Q4 copies (attach_w8a8 replace mode) so the
    # footprint matches the non-w8a8 config — keeping both OOM'd B=128.
    if os.environ.get("BENCH_LOGITS", "int8") == "int8":
        compute = compute.replace(quantized_logits=True)
    if os.environ.get("BENCH_W8A8", "1") == "1":
        compute = compute.replace(w8a8=True)
    if os.environ.get("BENCH_SELFKV", "int8") == "int4":
        compute = compute.replace(self_kv_bits=4)
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)
    mel_frontend = MelFrontend(n_mels=cfg.n_mels, norm="slaney")

    beam_w = int(os.environ.get("BENCH_BEAM", "0"))  # 0 = greedy

    @jax.jit
    def step(params, audio, lang):
        features = mel_frontend(audio)
        if beam_w > 1:
            from whisper_burn_tpu.models.beam import beam_decode

            return beam_decode(
                params, cfg, features, lang, compute,
                beam_width=beam_w, max_tokens=224,
            )
        return greedy_decode(params, cfg, features, lang, compute, max_tokens=224)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((BATCH, 480_000)) * 0.1).astype(np.float32)
    )
    lang = jnp.full((BATCH,), cfg.lang_token_start, jnp.int32)

    mode = os.environ.get("BENCH_MODE", "headline")
    if mode == "breakdown":
        # fresh-process attribution run (spawned below, or invoked manually)
        bd_batch = min(BATCH, int(os.environ.get("BENCH_BREAKDOWN_BATCH", str(BATCH))))
        # in breakdown mode a failure must be LOUD: exit non-zero so the
        # parent (or a calling harness) can distinguish it (ADVICE r2)
        breakdown = _stage_breakdown(
            cfg, compute, params, audio[:bd_batch], lang[:bd_batch]
        )
        breakdown["batch"] = bd_batch
        breakdown.update(_roofline_accounting(cfg, compute, bd_batch, breakdown))
        print(json.dumps(breakdown))
        return

    # warmup / compile
    result = step(params, audio, lang)
    np.asarray(result.tokens)  # host fetch = sync on every backend

    times = []
    for _ in range(TIMED_ITERS):
        t0 = time.perf_counter()
        result = step(params, audio, lang)
        np.asarray(result.tokens)
        times.append(time.perf_counter() - t0)
    t_min, t_mean = min(times), sum(times) / len(times)

    audio_seconds = BATCH * SECONDS_PER_UTTERANCE
    value = audio_seconds / t_min

    # the breakdown subprocess times the GREEDY pipeline; running it under
    # a BENCH_BEAM headline would stamp the beam headline next to greedy
    # stage numbers and clobber the committed greedy artifact (r5 review)
    if beam_w <= 1 and os.environ.get("BENCH_BREAKDOWN", "1") != "0":
        _run_breakdown_subprocess(BATCH, t_min)

    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(value / TARGET_AUDIO_S_PER_S, 3),
                "min": round(t_min, 4),
                "mean": round(t_mean, 4),
                "iters": TIMED_ITERS,
            }
        )
    )


def _run_breakdown_subprocess(batch: int, headline_s: float) -> None:
    """Stage attribution in a fresh process at the headline batch; on
    failure (stage-sliced programs can't share buffers like the one-jit
    headline, and an OOM poisons this backend's allocator in-process)
    retry once at half batch, recording the fallback in the JSON."""
    out_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_BREAKDOWN.json")
    attempted = []
    for bd_batch in (batch, max(1, batch // 2)):
        env = dict(os.environ)
        env["BENCH_MODE"] = "breakdown"
        env["BENCH_BREAKDOWN_BATCH"] = str(bd_batch)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        attempted.append(bd_batch)
        if proc.returncode == 0 and proc.stdout.strip():
            breakdown = json.loads(proc.stdout.strip().splitlines()[-1])
            breakdown["headline_ms"] = round(headline_s * 1e3, 1)
            breakdown["headline_batch"] = batch
            if bd_batch != batch:
                breakdown["batch_fallback"] = (
                    f"breakdown OOM'd at headline batch {batch}; ran at {bd_batch}"
                )
            with open(out_path, "w") as f:
                json.dump(breakdown, f, indent=1)
            print(json.dumps({"breakdown_ms": breakdown}), file=sys.stderr)
            return
        print(
            json.dumps(
                {"breakdown_error": proc.stderr[-500:], "batch": bd_batch}
            ),
            file=sys.stderr,
        )
        if bd_batch == max(1, batch // 2):
            break


def _roofline_accounting(cfg, compute, batch: int, breakdown: dict) -> dict:
    """Bytes read per decode step at this batch + achieved HBM bandwidth
    (VERDICT r2 items 1/10: track the distance to speed-of-light)."""
    d, f, nl = cfg.n_text_state, cfg.ffn_dim, cfg.n_text_layer
    ctx = 256  # right-sized self cache (whisper.greedy_decode)
    t_cross = 1536 if cfg.n_audio_ctx == 1500 else cfg.n_audio_ctx
    weights = (3 * d * d + 3 * d * d + 2 * d * f) * nl  # int8 codes
    scales = weights // 32 * 4
    if compute.self_kv_packed:
        from whisper_burn_tpu.models.decoder import self_kv_groups

        # two int4 K+V per byte + 2G f32 per-channel-group scales per token
        self_kv = batch * ctx * (d + 8 * self_kv_groups(d)) * nl
    elif compute.quantized_self_kv:
        self_kv = batch * ctx * (2 * d + 8) * nl
    else:
        self_kv = 2 * batch * ctx * d * 2 * nl
    cross_mult = 1 if compute.kv_packed else (2 if compute.quantized_kv else 4)
    cross_kv = batch * t_cross * d * cross_mult * nl
    if compute.quantized_logits:
        logits = cfg.n_vocab_padded * d + cfg.n_vocab_padded * d // 32 * 4
    else:
        logits = cfg.n_vocab_padded * d * 2
    total = weights + scales + self_kv + cross_kv + logits
    per_tok_s = breakdown.get("decode_per_token_us", 0.0) * 1e-6
    return {
        "bytes_per_step": total,
        "bytes_per_step_gb": {
            "weights_int8": round(weights / 1e9, 3),
            "scales_f32": round(scales / 1e9, 3),
            "self_kv": round(self_kv / 1e9, 3),
            "cross_kv": round(cross_kv / 1e9, 3),
            "logits_emb": round(logits / 1e9, 3),
        },
        "decode_achieved_gbps": round(total / per_tok_s / 1e9, 1) if per_tok_s else None,
        "decode_pct_hbm_roofline": round(100 * (total / HBM_GBPS) / per_tok_s, 1)
        if per_tok_s
        else None,
    }


def _stage_breakdown(cfg, compute, params, audio, lang) -> dict:
    """Per-stage wall-clock attribution via CUMULATIVE-PREFIX programs
    (VERDICT r4 #4): {mel, encoder, crossfill, prefill, decode,
    decode_per_token_us}.

    The r3/r4 stage-SLICED version (one jit per stage, caches handed
    between programs with donation) OOM'd at the headline batch 128 — two
    live copies of the 11 GB cache cross program boundaries no matter how
    donation is arranged. Instead, each prefix program runs stages
    0..k inside ONE jit (identical buffer economy to the headline, which
    fits at 128) and returns only a small reduction; stage k's time is the
    difference of consecutive prefix timings (min over iters, clamped at
    0). The diffs also charge each stage the fusion context it has in the
    real headline program rather than stage-sliced dispatch overhead.
    ``BENCH_BREAKDOWN_MODE=sliced`` selects the old attribution as a
    cross-check at batches where two cache copies fit."""
    if os.environ.get("BENCH_BREAKDOWN_MODE") == "sliced":
        return _stage_breakdown_sliced(cfg, compute, params, audio, lang)
    return _stage_breakdown_cumulative(cfg, compute, params, audio, lang)


def _stage_breakdown_cumulative(cfg, compute, params, audio, lang) -> dict:
    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.audio.mel import MelFrontend
    from whisper_burn_tpu.models.config import SOT
    from whisper_burn_tpu.models.decoder import (
        decode_step,
        fill_cross_cache,
        init_cache,
        prefill,
    )
    from whisper_burn_tpu.models.encoder import encode
    from whisper_burn_tpu.models.whisper import PROMPT_LEN

    max_tokens = 224
    mel_frontend = MelFrontend(n_mels=cfg.n_mels, norm="slaney")
    b = audio.shape[0]
    ctx = min(cfg.n_text_ctx, max(64, -(-(PROMPT_LEN + max_tokens) // 64) * 64))

    def _prompt(lang):
        return jnp.stack(
            [
                jnp.full((b,), SOT, jnp.int32),
                lang,
                jnp.full((b,), cfg.transcribe_token, jnp.int32),
                jnp.full((b,), cfg.no_timestamps_token, jnp.int32),
            ],
            axis=1,
        )

    # each prefix returns a tiny reduction so outputs stay negligible but
    # every stage's arrays are fully materialized (no dead-code shortcuts)
    @jax.jit
    def upto_mel(p, audio, lang):
        return jnp.sum(mel_frontend(audio))

    @jax.jit
    def upto_encoder(p, audio, lang):
        return jnp.sum(encode(p, mel_frontend(audio), cfg, compute))

    @jax.jit
    def upto_crossfill(p, audio, lang):
        enc_out = encode(p, mel_frontend(audio), cfg, compute)
        cache = fill_cross_cache(
            p, cfg, enc_out, init_cache(cfg, b, compute, ctx=ctx), compute
        )
        return jnp.sum(cache.cross_k.astype(jnp.float32)) + jnp.sum(
            cache.cross_v.astype(jnp.float32)
        )

    @jax.jit
    def upto_prefill(p, audio, lang):
        enc_out = encode(p, mel_frontend(audio), cfg, compute)
        cache = fill_cross_cache(
            p, cfg, enc_out, init_cache(cfg, b, compute, ctx=ctx), compute
        )
        logits, cache = prefill(p, cfg, _prompt(lang), cache, compute)
        return jnp.sum(logits) + jnp.sum(cache.self_k.astype(jnp.float32))

    @jax.jit
    def upto_decode(p, audio, lang):
        enc_out = encode(p, mel_frontend(audio), cfg, compute)
        cache = fill_cross_cache(
            p, cfg, enc_out, init_cache(cfg, b, compute, ctx=ctx), compute
        )
        logits, cache = prefill(p, cfg, _prompt(lang), cache, compute)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def body(k, carry):
            tok, cache = carry
            logits, cache = decode_step(
                p, cfg, tok, PROMPT_LEN + k - 1, cache, compute
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        tok, _ = jax.lax.fori_loop(1, max_tokens, body, (first, cache))
        return jnp.sum(tok)

    prefixes = [
        ("mel", upto_mel),
        ("encoder", upto_encoder),
        ("crossfill", upto_crossfill),
        ("prefill", upto_prefill),
        ("decode", upto_decode),
    ]
    iters = int(os.environ.get("BENCH_BREAKDOWN_ITERS", "3"))
    cum: dict[str, float] = {}
    for name, fn in prefixes:
        float(fn(params, audio, lang))  # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(params, audio, lang))  # scalar fetch = full sync
            best = min(best, time.perf_counter() - t0)
        cum[name] = best

    ms, prev = {}, 0.0
    for name, _ in prefixes:
        ms[name] = round(max(cum[name] - prev, 0.0) * 1e3, 2)
        prev = cum[name]
    ms["decode_per_token_us"] = round(
        max(cum["decode"] - cum["prefill"], 0.0) / (max_tokens - 1) * 1e6, 1
    )
    return ms


def _stage_breakdown_sliced(cfg, compute, params, audio, lang) -> dict:
    """The r3/r4 stage-sliced attribution (kept for cross-checking at
    batches where two cache copies fit; OOMs at the headline batch)."""
    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.audio.mel import MelFrontend
    from whisper_burn_tpu.models.config import SOT
    from whisper_burn_tpu.models.decoder import (
        decode_step,
        fill_cross_cache,
        init_cache,
        prefill,
    )
    from whisper_burn_tpu.models.encoder import encode
    from whisper_burn_tpu.models.whisper import PROMPT_LEN
    from whisper_burn_tpu.utils.profiling import StageTimer

    max_tokens = 224
    mel_frontend = MelFrontend(n_mels=cfg.n_mels, norm="slaney")
    b = audio.shape[0]

    mel_fn = jax.jit(mel_frontend)
    enc_fn = jax.jit(lambda p, m: encode(p, m, cfg, compute))

    @jax.jit
    def crossfill_fn(p, enc_out):
        ctx = min(cfg.n_text_ctx, max(64, -(-(PROMPT_LEN + max_tokens) // 64) * 64))
        cache = init_cache(cfg, b, compute, ctx=ctx)
        return fill_cross_cache(p, cfg, enc_out, cache, compute)

    # the Large-V3 B=128 cache is ~10.7 GB — two live copies exceed the
    # 16 GB chip, so every stage consuming a cache donates it and the
    # warmup outputs are dropped before the timed pass
    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_fn(p, cache, lang):
        prompt = jnp.stack(
            [
                jnp.full((b,), SOT, jnp.int32),
                lang,
                jnp.full((b,), cfg.transcribe_token, jnp.int32),
                jnp.full((b,), cfg.no_timestamps_token, jnp.int32),
            ],
            axis=1,
        )
        return prefill(p, cfg, prompt, cache, compute)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_fn(p, first, cache):
        def body(k, carry):
            tok, cache = carry
            logits, cache = decode_step(p, cfg, tok, PROMPT_LEN + k - 1, cache, compute)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        return jax.lax.fori_loop(1, max_tokens, body, (first, cache))

    # compile everything first so the timed pass measures steady-state
    mel = mel_fn(audio)
    cache = crossfill_fn(params, enc_fn(params, mel))
    logits, cache = prefill_fn(params, cache, lang)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out = decode_fn(params, first, cache)
    jax.block_until_ready(out)
    del cache, logits, out

    timer = StageTimer(sync=True)
    with timer.stage("mel"):
        mel = mel_fn(audio)
        jax.block_until_ready(mel)
    with timer.stage("encoder"):
        enc_out = enc_fn(params, mel)
        jax.block_until_ready(enc_out)
    with timer.stage("crossfill"):
        cache = crossfill_fn(params, enc_out)
        jax.block_until_ready(cache.cross_k)
    with timer.stage("prefill"):
        logits, cache = prefill_fn(params, cache, lang)
        jax.block_until_ready(logits)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    with timer.stage("decode"):
        out = decode_fn(params, first, cache)
        jax.block_until_ready(out)

    ms = {k: round(v * 1e3, 2) for k, v in timer.totals.items()}
    ms["decode_per_token_us"] = round(timer.totals["decode"] / (max_tokens - 1) * 1e6, 1)
    return ms


if __name__ == "__main__":
    sys.exit(main())
