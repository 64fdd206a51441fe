"""GGUF -> params loader tests, including the quantized path."""

import numpy as np

from whisper_burn_tpu.gguf.convert import convert_state_dict
from whisper_burn_tpu.gguf.loader import load_whisper_from_gguf
from whisper_burn_tpu.gguf.quant import dequantize_q4_0, quantize_q4_0


def _synthetic_state(d=256, n_mels=8, n_audio_ctx=6, n_text_ctx=8, layers=1, vocab=512):
    """HF-style state dict big enough (d>=256) to trigger Q4_0 quantization."""
    rng = np.random.default_rng(0)
    f = 4 * d
    s = {}

    def lin(prefix, n, k, bias=True):
        s[f"{prefix}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        if bias:
            s[f"{prefix}.bias"] = rng.standard_normal(n).astype(np.float32) * 0.01

    def ln(prefix):
        s[f"{prefix}.weight"] = np.ones(d, np.float32)
        s[f"{prefix}.bias"] = np.zeros(d, np.float32)

    s["model.encoder.conv1.weight"] = rng.standard_normal((d, n_mels, 3)).astype(np.float32)
    s["model.encoder.conv1.bias"] = np.zeros(d, np.float32)
    s["model.encoder.conv2.weight"] = rng.standard_normal((d, d, 3)).astype(np.float32)
    s["model.encoder.conv2.bias"] = np.zeros(d, np.float32)
    s["model.encoder.embed_positions.weight"] = rng.standard_normal((n_audio_ctx, d)).astype(np.float32)
    s["model.decoder.embed_positions.weight"] = rng.standard_normal((n_text_ctx, d)).astype(np.float32)
    s["model.decoder.embed_tokens.weight"] = rng.standard_normal((vocab, d)).astype(np.float32)

    for side, n_layers, cross in (("encoder", layers, False), ("decoder", layers, True)):
        for i in range(n_layers):
            p = f"model.{side}.layers.{i}"
            ln(f"{p}.self_attn_layer_norm")
            lin(f"{p}.self_attn.q_proj", d, d)
            lin(f"{p}.self_attn.k_proj", d, d, bias=False)  # no k bias in Whisper
            lin(f"{p}.self_attn.v_proj", d, d)
            lin(f"{p}.self_attn.out_proj", d, d)
            if cross:
                ln(f"{p}.encoder_attn_layer_norm")
                lin(f"{p}.encoder_attn.q_proj", d, d)
                lin(f"{p}.encoder_attn.k_proj", d, d, bias=False)
                lin(f"{p}.encoder_attn.v_proj", d, d)
                lin(f"{p}.encoder_attn.out_proj", d, d)
            ln(f"{p}.final_layer_norm")
            lin(f"{p}.fc1", f, d)
            lin(f"{p}.fc2", d, f)
    s["model.encoder.layer_norm.weight"] = np.ones(d, np.float32)
    s["model.encoder.layer_norm.bias"] = np.zeros(d, np.float32)
    s["model.decoder.layer_norm.weight"] = np.ones(d, np.float32)
    s["model.decoder.layer_norm.bias"] = np.zeros(d, np.float32)
    s["proj_out.weight"] = s["model.decoder.embed_tokens.weight"]  # tied, dropped
    return s


def test_quantized_roundtrip_through_container():
    state = _synthetic_state()
    blob = convert_state_dict(state, n_lang=99).to_bytes()
    loaded = load_whisper_from_gguf(blob)
    cfg, params = loaded.config, loaded.params

    assert cfg.n_audio_state == 256
    assert cfg.n_audio_head == 4  # head_dim 64
    assert cfg.n_vocab == 512
    assert cfg.n_lang == 99
    assert cfg.n_audio_layer == 1 and cfg.n_text_layer == 1

    blocks = params["decoder"]["blocks"]
    # big mats were quantized...
    assert "qw" in blocks["attn_q"] and blocks["attn_q"]["qw"].dtype == np.int8
    assert blocks["attn_q"]["qw"].shape == (1, 256, 256)  # stacked [L, K, N]
    assert blocks["fc1"]["qw"].shape == (1, 256, 1024)
    # ...biases stayed f32, key has none
    assert blocks["attn_q"]["b"].dtype == np.float32
    assert "b" not in blocks["attn_k"]
    # non-quantized leaves intact
    assert params["encoder"]["conv1"]["w"].shape == (256, 8, 3)
    np.testing.assert_array_equal(
        params["decoder"]["tok_emb"][:512],
        state["model.decoder.embed_tokens.weight"],
    )
    # padded vocab rows are zero
    assert np.all(params["decoder"]["tok_emb"][512:] == 0)

    # quantized weight reconstructs the block-dequant oracle exactly
    w = state["model.decoder.layers.0.self_attn.q_proj.weight"]  # [N, K]
    oracle = dequantize_q4_0(quantize_q4_0(w), w.size).reshape(w.shape)
    qw, sc = blocks["attn_q"]["qw"][0], blocks["attn_q"]["scales"][0]
    recon = qw.astype(np.float32) * np.repeat(sc, 32, axis=0)  # [K, N]
    np.testing.assert_array_equal(recon.T, oracle)


def test_dense_small_model_stays_f32():
    state = _synthetic_state(d=64, vocab=128)
    blob = convert_state_dict(state).to_bytes()
    loaded = load_whisper_from_gguf(blob)
    blocks = loaded.params["decoder"]["blocks"]
    assert "w" in blocks["attn_q"]  # below the quant threshold
    np.testing.assert_array_equal(
        blocks["attn_q"]["w"][0].T,
        state["model.decoder.layers.0.self_attn.q_proj.weight"],
    )
