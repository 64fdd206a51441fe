"""Model-layer tests on a tiny random config (CPU).

The reference has no model tests (SURVEY §4); coverage here extends per the
survey's implication list: shape contracts, prefill/step consistency, the
greedy loop's masking semantics, and quantized-vs-dense equivalence.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.models import (
    EOT,
    SOT,
    WhisperConfig,
    compute_cross_kv,
    decode_step,
    encode,
    greedy_decode,
    init_cache,
    prefill,
    random_params,
)
from whisper_burn_tpu.models.whisper import detect_language
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend

CFG = WhisperConfig.tiny_test()
COMPUTE = Compute.parity().replace(backend=KernelBackend.XLA)


@pytest.fixture(scope="module")
def params():
    return random_params(CFG, seed=0, quantized=False)


def _mel(b=2, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, CFG.n_mels, CFG.n_audio_ctx * 2)).astype(np.float32))


def test_encode_shape(params):
    out = encode(params, _mel(), CFG, COMPUTE)
    assert out.shape == (2, CFG.n_audio_ctx, CFG.n_audio_state)
    assert np.all(np.isfinite(np.asarray(out)))


def test_prefill_then_steps_matches_full_prefill(params):
    """Incremental decode must reproduce the batched-prompt path — the
    KV-cache analogue of the reference's forward_prompt == decode_step chain."""
    rng = np.random.default_rng(2)
    enc_out = encode(params, _mel(), CFG, COMPUTE)
    seq = rng.integers(0, 1000, size=(2, 9)).astype(np.int32)
    seq[:, 0] = SOT

    ck, cv = compute_cross_kv(params, CFG, enc_out, COMPUTE)

    # path A: prefill the whole 9-token sequence
    cache_a = init_cache(CFG, 2, COMPUTE)._replace(cross_k=ck, cross_v=cv)
    logits_a, _ = prefill(params, CFG, jnp.asarray(seq), cache_a, COMPUTE)

    # path B: prefill 4, then 5 single steps
    cache_b = init_cache(CFG, 2, COMPUTE)._replace(cross_k=ck, cross_v=cv)
    _, cache_b = prefill(params, CFG, jnp.asarray(seq[:, :4]), cache_b, COMPUTE)
    logits_b = None
    for pos in range(4, 9):
        logits_b, cache_b = decode_step(
            params, CFG, jnp.asarray(seq[:, pos]), jnp.asarray(pos), cache_b, COMPUTE
        )

    a, b = np.asarray(logits_a), np.asarray(logits_b)
    np.testing.assert_allclose(
        a[:, : CFG.n_vocab], b[:, : CFG.n_vocab], atol=2e-4, rtol=1e-4
    )


def test_greedy_decode_contract(params):
    lang = jnp.full((2,), CFG.lang_token_start, jnp.int32)
    res = greedy_decode(params, CFG, _mel(), lang, COMPUTE, max_tokens=12)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 12)
    n_gen = np.asarray(res.n_generated)

    for row, n in zip(toks, n_gen):
        # EOT never appears among counted tokens; all trailing slots are EOT
        assert np.all(row[:n] != EOT)
        assert np.all(row[n:] == EOT)
    # determinism
    res2 = greedy_decode(params, CFG, _mel(), lang, COMPUTE, max_tokens=12)
    np.testing.assert_array_equal(toks, np.asarray(res2.tokens))
    # padded vocab ids can never be sampled
    assert toks.max() < CFG.n_vocab


def test_min_tokens_eot_suppression(params):
    """The first 3 samples are never EOT (src/model/whisper.rs:96-122)."""
    lang = jnp.full((2,), CFG.lang_token_start, jnp.int32)
    res = greedy_decode(params, CFG, _mel(seed=5), lang, COMPUTE, max_tokens=8)
    toks = np.asarray(res.tokens)
    assert np.all(toks[:, :3] != EOT)


def test_detect_language_in_range(params):
    enc_out = encode(params, _mel(), CFG, COMPUTE)
    cache = init_cache(CFG, 2, COMPUTE)
    ck, cv = compute_cross_kv(params, CFG, enc_out, COMPUTE)
    cache = cache._replace(cross_k=ck, cross_v=cv)
    lang = np.asarray(detect_language(params, CFG, cache, COMPUTE))
    assert np.all(lang >= CFG.lang_token_start)
    assert np.all(lang < CFG.lang_token_end)


def test_greedy_decode_auto_matches_explicit(params):
    """detect=True with the detected token == explicit run with that token."""
    mel = _mel(seed=7)
    auto = greedy_decode(
        params, CFG, mel, jnp.full((2,), -1, jnp.int32), COMPUTE, detect=True, max_tokens=8
    )
    explicit = greedy_decode(
        params, CFG, mel, auto.lang_tokens, COMPUTE, max_tokens=8
    )
    np.testing.assert_array_equal(np.asarray(auto.tokens), np.asarray(explicit.tokens))


def test_quantized_matches_dequantized_dense():
    """A quantized model == a dense model built from its dequantized weights
    (the fused path changes layout, not values; src/gguf/tests.rs:413-480)."""
    import jax

    qparams = random_params(CFG, seed=3, quantized=True)

    def dequant(p):
        if isinstance(p, dict) and "qw" in p:
            qw, scales = p["qw"], p["scales"]  # possibly stacked: [L, K, N]
            w = qw.astype(np.float32) * np.repeat(scales, 32, axis=-2)
            out = {"w": w}
            if "b" in p:
                out["b"] = p["b"]
            return out
        if isinstance(p, dict):
            return {k: dequant(v) for k, v in p.items()}
        return p

    dparams = dequant(qparams)
    mel = _mel(seed=4)
    lang = jnp.full((2,), CFG.lang_token_start, jnp.int32)
    rq = greedy_decode(qparams, CFG, mel, lang, COMPUTE, max_tokens=6)
    rd = greedy_decode(dparams, CFG, mel, lang, COMPUTE, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(rq.tokens), np.asarray(rd.tokens))

    eq = encode(qparams, mel, CFG, COMPUTE)
    ed = encode(dparams, mel, CFG, COMPUTE)
    np.testing.assert_allclose(np.asarray(eq), np.asarray(ed), atol=1e-5)


def test_flash_decode_path_matches_xla():
    """The Pallas flash-decode path (interpret mode on CPU) reproduces the
    XLA einsum path token-for-token."""
    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)  # tileable T_enc
    params = random_params(cfg, seed=11, quantized=False)
    rng = np.random.default_rng(12)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)
    )
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)

    xla = greedy_decode(params, cfg, mel, lang, COMPUTE, max_tokens=10)
    flash = greedy_decode(
        params, cfg, mel, lang,
        Compute.parity().replace(backend=KernelBackend.PALLAS),
        max_tokens=10,
    )
    np.testing.assert_array_equal(np.asarray(xla.tokens), np.asarray(flash.tokens))


def test_jit_greedy_decode(params):
    """The whole transcription is one compiled program (static cfg/compute)."""
    import functools
    import jax

    fn = jax.jit(
        functools.partial(greedy_decode, max_tokens=8),
        static_argnames=("cfg", "compute"),
    )
    mel = _mel(seed=9)
    lang = jnp.full((2,), CFG.lang_token_start, jnp.int32)
    res = fn(params, CFG, mel, lang, COMPUTE)
    ref = greedy_decode(params, CFG, mel, lang, COMPUTE, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref.tokens))


def test_fused_qkv_matches_unfused(params):
    """fuse_attention_params changes matmul shape, not results."""
    from whisper_burn_tpu.models.params import fuse_attention_params

    fused = fuse_attention_params(params)
    blocks = fused["decoder"]["blocks"]
    assert "attn_qkv" in blocks and "attn_q" not in blocks
    assert "xattn_kv" in blocks and "xattn_k" not in blocks

    mel = _mel(seed=21)
    lang = jnp.full((2,), CFG.lang_token_start, jnp.int32)
    a = greedy_decode(params, CFG, mel, lang, COMPUTE, max_tokens=8)
    b = greedy_decode(fused, CFG, mel, lang, COMPUTE, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    ea = encode(params, mel, CFG, COMPUTE)
    eb = encode(fused, mel, CFG, COMPUTE)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=2e-5)


def test_int8_cross_kv_close_to_bf16():
    """Compute.fastest()'s int8 cross cache tracks the full-precision path."""
    from whisper_burn_tpu.models.decoder import fill_cross_cache

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=31, quantized=False)
    mel = _mel(seed=32)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    enc_out = encode(params, mel, cfg, COMPUTE)

    def run(compute):
        cache = init_cache(cfg, 2, compute)
        cache = fill_cross_cache(params, cfg, enc_out, cache, compute)
        prompt = jnp.tile(jnp.asarray([[SOT, 50259, 50359, 50363]], jnp.int32), (2, 1))
        logits, cache = prefill(params, cfg, prompt, cache, compute)
        return np.asarray(logits)[:, : cfg.n_vocab]

    base = run(COMPUTE)
    quant = run(COMPUTE.replace(kv_dtype=jnp.int8))
    scale = np.abs(base).max()
    assert np.abs(base - quant).max() < 0.02 * scale + 0.05


def test_int4_cross_kv_close_to_bf16():
    """kv_bits=4 packs two positions per byte; logits stay close to the
    full-precision path (per-channel absmax/7 scales)."""
    from whisper_burn_tpu.models.decoder import fill_cross_cache

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=31, quantized=False)
    mel = _mel(seed=32)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    enc_out = encode(params, mel, cfg, COMPUTE)

    def run(compute):
        cache = init_cache(cfg, 2, compute)
        cache = fill_cross_cache(params, cfg, enc_out, cache, compute)
        prompt = jnp.tile(jnp.asarray([[SOT, 50259, 50359, 50363]], jnp.int32), (2, 1))
        logits, cache = prefill(params, cfg, prompt, cache, compute)
        # one decode step through the packed path as well
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        step_logits, _ = decode_step(params, cfg, tok, jnp.asarray(4), cache, compute)
        return np.asarray(logits)[:, : cfg.n_vocab], np.asarray(step_logits)[:, : cfg.n_vocab]

    base, base_step = run(COMPUTE)
    quant, quant_step = run(COMPUTE.replace(kv_dtype=jnp.int8, kv_bits=4))
    packed_cache = init_cache(cfg, 2, COMPUTE.replace(kv_dtype=jnp.int8, kv_bits=4))
    assert packed_cache.cross_v.dtype == jnp.uint8
    assert packed_cache.cross_v.shape[2] == 8  # 16 positions / 2 per byte
    scale = np.abs(base).max()
    assert np.abs(base - quant).max() < 0.05 * scale + 0.1
    assert np.abs(base_step - quant_step).max() < 0.05 * np.abs(base_step).max() + 0.1


def test_int8_self_kv_close_to_bf16():
    """Compute.fastest()'s per-token int8 self cache tracks the bf16-cache
    path through a multi-step greedy decode (flash and XLA paths both
    quantize on write, dequantize on read)."""
    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=41, quantized=False)
    mel = _mel(seed=42)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)

    base = greedy_decode(
        params, cfg, mel, lang, COMPUTE.replace(self_kv_dtype=None), max_tokens=8
    )
    quant = greedy_decode(
        params, cfg, mel, lang, COMPUTE.replace(self_kv_dtype=jnp.int8), max_tokens=8
    )
    # random tiny-model logits are close to argmax ties; require most tokens
    # to agree rather than exact equality
    agree = np.mean(np.asarray(base.tokens) == np.asarray(quant.tokens))
    assert agree >= 0.75, (base.tokens, quant.tokens)


def test_int8_self_kv_prefill_roundtrip():
    """Prefill writes quantized self-KV whose dequantized values match the
    bf16 cache within int8 resolution."""
    from whisper_burn_tpu.models.decoder import fill_cross_cache

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=43, quantized=False)
    mel = _mel(seed=44)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    enc_out = encode(params, mel, cfg, COMPUTE)
    prompt = jnp.tile(jnp.asarray([[SOT, 50259, 50359, 50363]], jnp.int32), (2, 1))

    def run(compute):
        cache = init_cache(cfg, 2, compute)
        cache = fill_cross_cache(params, cfg, enc_out, cache, compute)
        _, cache = prefill(params, cfg, prompt, cache, compute)
        return cache

    base = run(COMPUTE.replace(self_kv_dtype=None))
    quant = run(COMPUTE.replace(self_kv_dtype=jnp.int8))
    assert quant.self_k.dtype == jnp.int8
    assert quant.self_kv_scale.shape == quant.self_k.shape[:3] + (2,)
    k_deq = np.asarray(quant.self_k).astype(np.float32) * np.asarray(
        quant.self_kv_scale[..., 0:1]
    )
    k_ref = np.asarray(base.self_k).astype(np.float32)
    t = prompt.shape[1]
    amax = np.abs(k_ref[:, :, :t]).max(axis=-1, keepdims=True)
    np.testing.assert_allclose(
        k_deq[:, :, :t], k_ref[:, :, :t], atol=1e-6 + (amax / 127).max()
    )


def test_int4_self_kv_close_to_bf16():
    """self_kv_bits=4 packs channel pairs per byte (per-token absmax/7
    scales); greedy tokens track the bf16-cache path."""
    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=41, quantized=False)
    mel = _mel(seed=42)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)

    packed = COMPUTE.replace(self_kv_dtype=jnp.int8, self_kv_bits=4)
    cache = init_cache(cfg, 2, packed)
    assert cache.self_k.dtype == jnp.uint8
    assert cache.self_k.shape[-1] == cfg.n_text_state // 2

    base = greedy_decode(
        params, cfg, mel, lang, COMPUTE.replace(self_kv_dtype=None), max_tokens=8
    )
    quant = greedy_decode(params, cfg, mel, lang, packed, max_tokens=8)
    agree = np.mean(np.asarray(base.tokens) == np.asarray(quant.tokens))
    assert agree >= 0.75, (base.tokens, quant.tokens)


def test_int4_self_kv_pallas_matches_xla():
    """The packed single-pass kernel (bias-trick unpack, interpret mode)
    tracks the XLA unpack path through a greedy decode."""
    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=41, quantized=False)
    mel = _mel(seed=42)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)

    xla = greedy_decode(
        params, cfg, mel, lang,
        COMPUTE.replace(self_kv_dtype=jnp.int8, self_kv_bits=4),
        max_tokens=8,
    )
    flash = greedy_decode(
        params, cfg, mel, lang,
        Compute.parity().replace(
            backend=KernelBackend.PALLAS, self_kv_dtype=jnp.int8, self_kv_bits=4
        ),
        max_tokens=8,
    )
    agree = np.mean(np.asarray(xla.tokens) == np.asarray(flash.tokens))
    assert agree >= 0.75, (xla.tokens, flash.tokens)


def test_mixed_selfkv_8k4v_close_and_pallas_matches_xla():
    """self_kv_vbits=4 (int8 keys + int4-group values): cache dtypes/widths
    split per side, greedy tracks the bf16-cache path, and the Pallas
    mixed-mode kernel reproduces the XLA unpack path."""
    from whisper_burn_tpu.models.decoder import self_kv_groups

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=41, quantized=False)
    mel = _mel(seed=42)[:, : cfg.n_mels, : cfg.n_audio_ctx * 2]
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)

    mixed = COMPUTE.replace(self_kv_dtype=jnp.int8, self_kv_vbits=4)
    cache = init_cache(cfg, 2, mixed)
    d = cfg.n_text_state
    assert cache.self_k.dtype == jnp.int8 and cache.self_k.shape[-1] == d
    assert cache.self_v.dtype == jnp.uint8 and cache.self_v.shape[-1] == d // 2
    assert cache.self_kv_scale.shape[-1] == 1 + self_kv_groups(d)

    base = greedy_decode(
        params, cfg, mel, lang, COMPUTE.replace(self_kv_dtype=None), max_tokens=8
    )
    quant = greedy_decode(params, cfg, mel, lang, mixed, max_tokens=8)
    agree = np.mean(np.asarray(base.tokens) == np.asarray(quant.tokens))
    assert agree >= 0.75, (base.tokens, quant.tokens)

    flash = greedy_decode(
        params, cfg, mel, lang,
        Compute.parity().replace(
            backend=KernelBackend.PALLAS, self_kv_dtype=jnp.int8, self_kv_vbits=4
        ),
        max_tokens=8,
    )
    xla = greedy_decode(
        params, cfg, mel, lang,
        COMPUTE.replace(self_kv_dtype=jnp.int8, self_kv_vbits=4),
        max_tokens=8,
    )
    np.testing.assert_array_equal(np.asarray(flash.tokens), np.asarray(xla.tokens))


def test_growing_cache_matches_single_phase(params):
    """The two-phase growing self cache (whisper.greedy_decode grow_cache)
    produces identical tokens to the single-phase run — padded keys are
    masked on every path, so the phase split is pure traffic shaping.
    max_tokens=124 -> ctx=128, phase-1 ctx=64 (the grow path engages)."""
    lang = jnp.full((2,), CFG.lang_token_start, jnp.int32)
    mel = _mel(seed=17)
    grown = greedy_decode(params, CFG, mel, lang, COMPUTE, max_tokens=124)
    single = greedy_decode(
        params, CFG, mel, lang, COMPUTE, max_tokens=124, grow_cache=False
    )
    np.testing.assert_array_equal(np.asarray(grown.tokens), np.asarray(single.tokens))
    np.testing.assert_array_equal(
        np.asarray(grown.n_generated), np.asarray(single.n_generated)
    )


def test_int4k_int8v_selfkv_rejected_at_construction():
    """Compute(self_kv_bits=4, self_kv_vbits=8) — int4 keys / int8 values —
    has no kernel or cache layout anywhere in the stack; Compute rejects it
    at construction instead of failing with a trace-time TypeError
    (ADVICE r4). The supported mixed mode (8K/4V) still constructs."""
    with pytest.raises(ValueError, match="self_kv_vbits"):
        Compute.parity().replace(
            self_kv_dtype=jnp.int8, self_kv_bits=4, self_kv_vbits=8
        )
    Compute.parity().replace(
        self_kv_dtype=jnp.int8, self_kv_bits=8, self_kv_vbits=4
    )


def test_in_kernel_cache_writeback_matches_deferred_writer():
    """The r5 store path (merged kernel writes the quantized current token
    into the aliased cache in-place, caches threaded through the scan
    carry) produces tokens identical to the deferred slot-writer path —
    the quantization math is shared, so the caches must be bit-identical
    too. Gate sanity: the serving int8 config takes the store path."""
    from whisper_burn_tpu.ops.pallas_attention import merged_store_ok

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    params = random_params(cfg, seed=21, quantized=False)
    rng = np.random.default_rng(22)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)
    )
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)

    serving = Compute.parity().replace(
        backend=KernelBackend.PALLAS, self_kv_dtype=jnp.int8
    )
    cache = init_cache(cfg, 2, serving)
    assert merged_store_ok(cache.self_k, cache.self_v, cache.self_kv_scale, 2)

    stored = greedy_decode(params, cfg, mel, lang, serving, max_tokens=10)
    deferred = greedy_decode(
        params, cfg, mel, lang,
        COMPUTE.replace(self_kv_dtype=jnp.int8),  # XLA path: slot writer
        max_tokens=10,
    )
    np.testing.assert_array_equal(
        np.asarray(stored.tokens), np.asarray(deferred.tokens)
    )
