"""Headline benchmark: audio-seconds/s per chip, Large-V3 Q4_0 greedy decode.

Runs the full compiled transcription step (log-mel -> encoder -> prefill ->
224-token greedy while_loop) on one chip with a 128-utterance data-parallel
batch, bf16 compute, flash prefill attention in the encoder, fused-QKV
Pallas Q4 matmuls, the flash-decode attention kernel, an int4-packed
cross-KV cache built layer-streamed (per-channel scales folded outside the
kernel), and a per-token int8 self-KV cache (scales applied inside the
decode kernel) — the memory halving that fits B=128 on one 16 GB chip.
Override via env: BENCH_BATCH, BENCH_KV=bf16. Weights are
fabricated-quantized at real Large-V3 shapes (no checkpoint download is
possible in this environment; the arithmetic/bandwidth profile is
identical to a real Q4_0 checkpoint). Random weights never emit EOT early,
so every stream decodes all 224 tokens — this measures the *worst-case*
decode; real audio exits at EOT and only gets faster.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the 100x-real-time-per-chip target from BASELINE.md (the
reference publishes no numbers, SURVEY §6).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
SECONDS_PER_UTTERANCE = 30.0
TIMED_ITERS = 3
TARGET_AUDIO_S_PER_S = 100.0  # BASELINE.md: >=100x real-time per chip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.audio.mel import MelFrontend
    from whisper_burn_tpu.transcribe import enable_compilation_cache

    enable_compilation_cache()
    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.models.whisper import greedy_decode
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import prepare_params

    cfg = WhisperConfig.large_v3()
    kv = os.environ.get("BENCH_KV", "int4")
    compute = {
        "bf16": Compute.fast(),
        "int8": Compute.fastest(),
        "int4": Compute.fastest(kv_bits=4),
    }[kv]
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)
    mel_frontend = MelFrontend(n_mels=cfg.n_mels, norm="slaney")

    @jax.jit
    def step(params, audio, lang):
        features = mel_frontend(audio)
        return greedy_decode(params, cfg, features, lang, compute, max_tokens=224)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((BATCH, 480_000)) * 0.1).astype(np.float32)
    )
    lang = jnp.full((BATCH,), cfg.lang_token_start, jnp.int32)

    # warmup / compile
    result = step(params, audio, lang)
    result.tokens.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(TIMED_ITERS):
        result = step(params, audio, lang)
    result.tokens.block_until_ready()
    elapsed = time.perf_counter() - t0

    audio_seconds = BATCH * SECONDS_PER_UTTERANCE * TIMED_ITERS
    value = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(value / TARGET_AUDIO_S_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
