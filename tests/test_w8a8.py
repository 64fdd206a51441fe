"""W8A8 large-M matmul path (VERDICT r2 item 3: encoder MFU).

int8 x int8 -> int32 MXU contraction with per-row activation scales and
per-column weight scales (ops/linear.w8a8_matmul), weight copies built
from the Q4 repack by models/params.attach_w8a8.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.models import WhisperConfig, greedy_decode, random_params
from whisper_burn_tpu.models.params import _w8_from_q4, attach_w8a8
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend
from whisper_burn_tpu.ops.linear import w8a8_matmul
from whisper_burn_tpu.ops.q4_matmul import dequant_weight


def test_w8_from_q4_reconstruction():
    rng = np.random.default_rng(0)
    qw = rng.integers(-8, 8, (2, 64, 96)).astype(np.int8)
    scales = rng.uniform(0.01, 0.05, (2, 2, 96)).astype(np.float32)
    qw8, s8 = _w8_from_q4(qw, scales)
    w = qw[0].astype(np.float32) * np.repeat(scales[0], 32, axis=0)
    recon = qw8[0].astype(np.float32) * s8[0]
    # int8 per-column requant of the dequantized Q4 weight: error <= s8/2
    # (+ f32 noise at exact .5 rounding boundaries)
    assert np.max(np.abs(recon - w) / np.maximum(s8[0], 1e-12)) <= 0.501


def test_w8a8_matmul_matches_f32():
    rng = np.random.default_rng(1)
    k, n, m = 128, 64, 16
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    s8 = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    qw8 = jnp.asarray(np.clip(np.round(w / s8), -127, 127).astype(np.int8))
    y = np.asarray(w8a8_matmul(x, qw8, jnp.asarray(s8), Compute.parity()))
    ref = np.asarray(x) @ w
    # two int8 quantizations (activation + weight): ~1% relative error
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_w8a8_greedy_decode_end_to_end(monkeypatch):
    """Full greedy decode with the W8A8 path forced on (threshold lowered
    so the tiny config's encoder takes it): tokens track the bf16 run."""
    import whisper_burn_tpu.ops.linear as linear_mod

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16, n_text_ctx=64)
    params = random_params(cfg, seed=0, quantized=True)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(
        rng.standard_normal((4, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)
    )
    lang = jnp.full((4,), cfg.lang_token_start, jnp.int32)

    base = Compute.fast().replace(backend=KernelBackend.XLA)
    r0 = greedy_decode(params, cfg, mel, lang, base, max_tokens=12)

    monkeypatch.setattr(linear_mod, "LARGE_M", 1)  # tiny M takes the path
    w8 = base.replace(w8a8=True)
    aug = attach_w8a8(params)
    assert "qw8" in aug["encoder"]["blocks"]["attn_q"]
    assert "qw8" in aug["decoder"]["blocks"]["xattn_k"]
    assert "qw8" not in aug["decoder"]["blocks"]["attn_q"]  # decode stays Q4
    r1 = greedy_decode(aug, cfg, mel, lang, w8, max_tokens=12)
    agree = (np.asarray(r0.tokens) == np.asarray(r1.tokens)).mean()
    assert agree >= 0.75, agree  # int8 encoder wobble, not divergence


def test_w8a8_ignored_without_prepared_weights():
    """compute.w8a8 without qw8 leaves falls back to the Q4 path (the
    flag only redirects shapes that actually carry the int8 copies)."""
    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16, n_text_ctx=64)
    params = random_params(cfg, seed=0, quantized=True)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)
    )
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)
    c = Compute.parity().replace(backend=KernelBackend.XLA, w8a8=True)
    base = Compute.parity().replace(backend=KernelBackend.XLA)
    r0 = greedy_decode(params, cfg, mel, lang, base, max_tokens=6)
    r1 = greedy_decode(params, cfg, mel, lang, c, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))
