"""In-situ decode-step timing under kernel block-size knobs (round 5).

The r4 roofline work measured each kernel in isolation (90-92%), but the
XPlane trace shows the decode step itself at ~66% — the gap lives BETWEEN
kernels (prologue fills, launch serialization, small-grid pipelining).
Block sizes that win in isolation are not necessarily the in-situ optimum,
so this harness times the REAL serving decode loop (same construction as
scripts/trace_decode.py) under the kernel env knobs:

    WB_SELF_G   self/merged attention batch-group (default 8)
    WB_CROSS_G  cross kT attention batch-group (default 4)
    WB_FFN_BF   fused FFN f-tile (default widest <= 7 MB budget)

Timing uses the chained-fori_loop + scalar-fetch protocol (the tunneled
backend returns from block_until_ready at ENQUEUE): per-step time =
(wall(n2 steps) - wall(n1 steps)) / (n2 - n1), min over reps.

Usage: BENCH_BATCH=64 python scripts/exp_insitu.py [--n1 32] [--n2 96]
       [--reps 3] (knobs via env)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=32)
    ap.add_argument("--n2", type=int, default=96)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("WB_NO_STORE"):
        # A/B hook: disable the in-kernel cache write-back (decoder falls
        # back to the r4 deferred slot writer) to isolate its effect
        import whisper_burn_tpu.ops.pallas_attention as _pa

        _pa.merged_store_ok = lambda *a, **k: False

    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.decoder import (
        decode_step,
        fill_cross_cache,
        init_cache,
        prefill,
    )
    from whisper_burn_tpu.models.encoder import encode
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.models.whisper import PROMPT_LEN
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import enable_compilation_cache, prepare_params

    enable_compilation_cache()
    cfg = WhisperConfig.large_v3()
    compute = Compute.fastest(kv_bits=4).replace(quantized_logits=True, w8a8=True)
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((BATCH, cfg.n_mels, 3000)).astype(np.float32) * 0.1
    )
    lang = jnp.full((BATCH,), cfg.lang_token_start, jnp.int32)
    enc_out = jax.jit(lambda p, m: encode(p, m, cfg, compute))(params, mel)

    @jax.jit
    def setup(p, enc_out, lang):
        cache = init_cache(cfg, BATCH, compute, ctx=256)
        cache = fill_cross_cache(p, cfg, enc_out, cache, compute)
        from whisper_burn_tpu.models.config import SOT

        prompt = jnp.stack(
            [
                jnp.full((BATCH,), SOT, jnp.int32),
                lang,
                jnp.full((BATCH,), cfg.transcribe_token, jnp.int32),
                jnp.full((BATCH,), cfg.no_timestamps_token, jnp.int32),
            ],
            axis=1,
        )
        logits, cache = prefill(p, cfg, prompt, cache, compute)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    first, cache = setup(params, enc_out, lang)
    jax.block_until_ready((first, cache))

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(p, tok, cache, n):
        def body(k, carry):
            tok, cache = carry
            logits, cache = decode_step(p, cfg, tok, PROMPT_LEN + (k % 200), cache, compute)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
        return jnp.sum(tok)

    float(run(params, first, cache, args.n1))  # compile both programs
    float(run(params, first, cache, args.n2))
    t1s, t2s = [], []
    for _ in range(args.reps):
        t0 = time.time(); float(run(params, first, cache, args.n1)); t1s.append(time.time() - t0)
        t0 = time.time(); float(run(params, first, cache, args.n2)); t2s.append(time.time() - t0)
    us = (min(t2s) - min(t1s)) / (args.n2 - args.n1) * 1e6
    knobs = {k: os.environ.get(k) for k in ("WB_SELF_G", "WB_CROSS_G", "WB_FFN_BF")}
    print(json.dumps({"batch": BATCH, "us_per_step": round(us, 1), "knobs": knobs}))


if __name__ == "__main__":
    main()
