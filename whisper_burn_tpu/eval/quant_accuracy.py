"""Quantization-accuracy measurement core (VERDICT r1 item 3).

Teacher-forced per-step comparison of quantized serving variants against
an f32 reference — the offline proxy for BASELINE.md's WER target (no
real checkpoint exists in this environment). The CLI sweep lives in
scripts/accuracy_sweep.py; tests/test_accuracy.py enforces floors both on
a small in-CI sweep and on the committed ACCURACY.json produced on TPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from whisper_burn_tpu.models.config import SOT, WhisperConfig
from whisper_burn_tpu.models.decoder import (
    decode_step,
    fill_cross_cache,
    init_cache,
    prefill,
)
from whisper_burn_tpu.models.encoder import encode
from whisper_burn_tpu.models.whisper import PROMPT_LEN, greedy_decode
from whisper_burn_tpu.ops import Compute


@functools.partial(jax.jit, static_argnames=("cfg", "compute", "steps"))
def forced_logits(params, cfg: WhisperConfig, mel, langs, tokens, compute: Compute, steps: int):
    """Teacher-forced per-step logits.

    ``tokens: [B, steps]`` — the reference trajectory. Returns
    ``[steps, B, Vp]`` f32: row 0 is the prefill (post-prompt) logits, row
    k the logits after feeding ``tokens[:, k-1]`` at cache position
    ``PROMPT_LEN + k - 1`` (mirrors the greedy loop in models/whisper.py).
    Teacher forcing isolates per-step numerical error from trajectory
    divergence compounding.
    """
    b = mel.shape[0]
    enc_out = encode(params, mel, cfg, compute)
    ctx = min(cfg.n_text_ctx, max(64, -(-(PROMPT_LEN + steps) // 64) * 64))
    cache = init_cache(cfg, b, compute, ctx=ctx)
    cache = fill_cross_cache(params, cfg, enc_out, cache, compute)
    prompt = jnp.stack(
        [
            jnp.full((b,), SOT, jnp.int32),
            langs.astype(jnp.int32),
            jnp.full((b,), cfg.transcribe_token, jnp.int32),
            jnp.full((b,), cfg.no_timestamps_token, jnp.int32),
        ],
        axis=1,
    )
    logits0, cache = prefill(params, cfg, prompt, cache, compute)

    def step(cache, xs):
        tok, pos = xs
        logits, cache = decode_step(params, cfg, tok, pos, cache, compute)
        return cache, logits

    positions = PROMPT_LEN + jnp.arange(steps - 1)
    _, rest = jax.lax.scan(step, cache, (tokens[:, : steps - 1].T, positions))
    return jnp.concatenate([logits0[None], rest], axis=0)


def compare_variant(
    ref_logits: np.ndarray,  # [steps, B, V] from the reference run
    valid: np.ndarray,  # [steps, B] bool pre-EOT mask
    params,
    cfg: WhisperConfig,
    mel,
    langs,
    ref_tokens,
    compute: Compute,
    steps: int,
) -> dict:
    """Teacher-force one variant and report agreement/drift vs reference."""
    lg = np.asarray(
        forced_logits(params, cfg, mel, langs, ref_tokens, compute, steps)
    )[:, :, : cfg.n_vocab]
    ref_arg = ref_logits.argmax(-1)
    agree = float((lg.argmax(-1) == ref_arg)[valid].mean())
    drift = np.abs(lg - ref_logits)[valid]
    ref_std = float(ref_logits[valid].std())
    return dict(
        token_agreement=agree,
        max_logit_drift=float(drift.max()),
        mean_logit_drift=float(drift.mean()),
        norm_drift=float(drift.max() / ref_std),
    )


def reference_run(params_f32, cfg: WhisperConfig, mel, langs, ref_compute: Compute, steps: int):
    """Greedy trajectory + teacher-forced logits of the f32 reference."""
    ref = greedy_decode(params_f32, cfg, mel, langs, ref_compute, max_tokens=steps)
    ref_tokens = jnp.asarray(ref.tokens)
    n_gen = np.asarray(ref.n_generated)
    ref_lg = np.asarray(
        forced_logits(params_f32, cfg, mel, langs, ref_tokens, ref_compute, steps)
    )[:, :, : cfg.n_vocab]
    valid = np.arange(steps)[:, None] < np.maximum(n_gen, 1)[None, :]
    return ref_tokens, ref_lg, valid
