"""Per-stage timing of the bench workload on the real chip.

Times (separately jitted): mel frontend, encoder, cross-KV fill, prompt
prefill, a single decode step, and the full 224-token greedy loop —
against the HBM speed-of-light estimate for each.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def timeit(fn, *args, iters=3, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.audio.mel import MelFrontend
    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.decoder import (
        decode_step,
        fill_cross_cache,
        init_cache,
        prefill,
    )
    from whisper_burn_tpu.models.encoder import encode
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.models.whisper import PROMPT_LEN, greedy_decode
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import enable_compilation_cache, prepare_params

    enable_compilation_cache()
    cfg = WhisperConfig.large_v3()
    compute = Compute.fastest()
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)
    mel_frontend = MelFrontend(n_mels=cfg.n_mels, norm="slaney")

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((BATCH, 480_000)) * 0.1).astype(np.float32))

    t_mel = timeit(jax.jit(mel_frontend.__call__), audio)
    feats = jax.jit(mel_frontend.__call__)(audio)
    print(f"mel      : {t_mel*1e3:8.1f} ms")

    enc_fn = jax.jit(functools.partial(encode, cfg=cfg, compute=compute))
    t_enc = timeit(enc_fn, params, feats)
    enc_out = enc_fn(params, feats)
    print(f"encoder  : {t_enc*1e3:8.1f} ms")
    del audio, feats  # HBM is tight at B=64: cache alone is ~13.5 GB

    ctx = 256

    @jax.jit
    def fill_fn(p, e):
        c = init_cache(cfg, BATCH, compute, ctx=ctx)  # zeros elided by XLA
        return fill_cross_cache(p, cfg, e, c, compute)

    cache = fill_fn(params, enc_out)
    jax.block_until_ready(cache)
    del cache
    t0 = time.perf_counter()
    cache = fill_fn(params, enc_out)
    jax.block_until_ready(cache)
    t_fill = time.perf_counter() - t0
    print(f"crossfill: {t_fill*1e3:8.1f} ms")
    del enc_out

    prompt = jnp.full((BATCH, PROMPT_LEN), 50258, jnp.int32)
    pre_fn = jax.jit(
        lambda p, t, c: prefill(p, cfg, t, c, compute), donate_argnums=(2,)
    )
    logits, cache = pre_fn(params, prompt, cache)
    jax.block_until_ready(cache)
    t0 = time.perf_counter()
    logits, cache = pre_fn(params, prompt, cache)
    jax.block_until_ready(cache)
    t_pre = time.perf_counter() - t0
    print(f"prefill  : {t_pre*1e3:8.1f} ms")

    tok = jnp.full((BATCH,), 50258, jnp.int32)
    step_fn = jax.jit(
        lambda p, t, pos, c: decode_step(p, cfg, t, pos, c, compute),
        donate_argnums=(3,),
    )
    pos = jnp.asarray(100, jnp.int32)
    for _ in range(3):
        logits, cache = step_fn(params, tok, pos, cache)
    jax.block_until_ready(cache)
    t0 = time.perf_counter()
    for _ in range(40):
        logits, cache = step_fn(params, tok, pos, cache)
    jax.block_until_ready(cache)
    t_step = (time.perf_counter() - t0) / 40
    print(f"1 step   : {t_step*1e3:8.3f} ms  (x224 = {t_step*224*1e3:6.0f} ms)")

    # speed-of-light estimate for one decode step at this batch
    L, D = cfg.n_text_layer, cfg.n_text_state
    self_b = 2 * BATCH * ctx * D * 2 * L
    cross_b = 2 * BATCH * 1536 * D * 1 * L
    w_b = (D * 3 * D + 3 * D * D + 2 * D * 4 * D) * L  # int8 repacked
    logit_b = 51866 * D * 2
    tot = (self_b + cross_b + w_b + logit_b) / 819e9
    print(
        f"  SoL    : {tot*1e3:8.3f} ms (self {self_b/819e6:.2f} cross {cross_b/819e6:.2f} w {w_b/819e6:.2f} logits {logit_b/819e6:.2f})"
    )

    del cache, logits
    full = jax.jit(
        lambda p, a, lang: greedy_decode(
            p, cfg, mel_frontend(a), lang, compute, max_tokens=224
        )
    )
    audio = jnp.asarray(
        (rng.standard_normal((BATCH, 480_000)) * 0.1).astype(np.float32)
    )
    lang = jnp.full((BATCH,), cfg.lang_token_start, jnp.int32)
    t_full = timeit(full, params, audio, lang, iters=2)
    print(f"full     : {t_full*1e3:8.1f} ms -> {BATCH*30/t_full:.0f} audio-s/s")


if __name__ == "__main__":
    main()
