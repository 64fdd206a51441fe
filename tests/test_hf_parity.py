"""Architecture parity against transformers' Whisper (random weights, offline).

A randomly initialized HF WhisperForConditionalGeneration is converted
through our full checkpoint path (state_dict -> GGUF bytes -> loader ->
params) and compared against HF's own forward — this pins conv semantics,
positional embeddings, attention masking/scaling, pre-norm order, tied
logits, and the name mapping in one shot. Weights stay F32 (dims < 256
escape the quant policy) so agreement is tight.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from whisper_burn_tpu.gguf.convert import convert_state_dict, hf_name_to_gguf, should_quantize
from whisper_burn_tpu.gguf.loader import load_whisper_from_gguf
from whisper_burn_tpu.models import compute_cross_kv, decode_step, encode, init_cache, prefill
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend

COMPUTE = Compute.parity().replace(backend=KernelBackend.XLA)

D_MODEL = 64  # one 64-dim head (head_dim=64 across the Whisper family)
N_VOCAB = 51865


@pytest.fixture(scope="module")
def hf_and_ours():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=N_VOCAB,
        num_mel_bins=8,
        encoder_layers=2,
        encoder_attention_heads=1,
        decoder_layers=2,
        decoder_attention_heads=1,
        d_model=D_MODEL,
        encoder_ffn_dim=4 * D_MODEL,
        decoder_ffn_dim=4 * D_MODEL,
        max_source_positions=12,
        max_target_positions=16,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()

    state = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    blob = convert_state_dict(state, n_lang=99).to_bytes()
    loaded = load_whisper_from_gguf(blob)
    # exact GELU to match HF's activation
    cfg = loaded.config.replace(gelu="erf")
    assert cfg.n_audio_layer == 2 and cfg.n_text_layer == 2
    assert cfg.n_mels == 8 and cfg.n_audio_state == D_MODEL
    return hf, cfg, loaded.params


def test_name_mapping_examples():
    cases = {
        "model.encoder.layers.3.self_attn.q_proj.weight": "encoder.blocks.3.attn.query.weight",
        "model.encoder.layers.0.fc1.bias": "encoder.blocks.0.mlp.0.bias",
        "model.decoder.layers.7.encoder_attn.k_proj.weight": "decoder.blocks.7.cross_attn.key.weight",
        "model.decoder.layers.1.encoder_attn_layer_norm.weight": "decoder.blocks.1.cross_attn_ln.weight",
        "model.decoder.layers.2.final_layer_norm.bias": "decoder.blocks.2.mlp_ln.bias",
        "model.encoder.layer_norm.weight": "encoder.ln_post.weight",
        "model.decoder.layer_norm.weight": "decoder.ln.weight",
        "model.decoder.embed_tokens.weight": "decoder.token_embedding.weight",
        "model.encoder.embed_positions.weight": "encoder.positional_embedding",
        "proj_out.weight": None,
    }
    for hf_name, expected in cases.items():
        assert hf_name_to_gguf(hf_name) == expected, hf_name


def test_quant_policy():
    assert should_quantize("encoder.blocks.0.attn.query.weight", (1280, 1280))
    assert should_quantize("decoder.blocks.0.mlp.0.weight", (5120, 1280))
    assert not should_quantize("decoder.blocks.0.mlp.0.bias", (5120,))
    assert not should_quantize("decoder.token_embedding.weight", (51865, 1280))
    assert not should_quantize("encoder.blocks.0.attn_ln.weight", (1280,))
    assert not should_quantize("encoder.conv1.weight", (1280, 384))
    assert not should_quantize("encoder.blocks.0.attn.query.weight", (255, 1280))


def test_encoder_parity(hf_and_ours):
    hf, cfg, params = hf_and_ours
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)

    with torch.no_grad():
        theirs = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encode(params, jnp.asarray(mel), cfg, COMPUTE))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_decoder_teacher_forced_parity(hf_and_ours):
    """Prefill + incremental steps reproduce HF's full-sequence logits."""
    hf, cfg, params = hf_and_ours
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)
    seq = rng.integers(0, N_VOCAB, size=(2, 10)).astype(np.int32)

    with torch.no_grad():
        out = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(seq.astype(np.int64)),
        )
        theirs = out.logits.numpy()  # [2, 10, V]

    enc_out = encode(params, jnp.asarray(mel), cfg, COMPUTE)
    cache = init_cache(cfg, 2, COMPUTE)
    ck, cv = compute_cross_kv(params, cfg, enc_out, COMPUTE)
    cache = cache._replace(cross_k=ck, cross_v=cv)
    logits, cache = prefill(params, cfg, jnp.asarray(seq[:, :4]), cache, COMPUTE)
    np.testing.assert_allclose(
        np.asarray(logits)[:, :N_VOCAB], theirs[:, 3], atol=2e-3, rtol=1e-2
    )
    for pos in range(4, 10):
        logits, cache = decode_step(
            params, cfg, jnp.asarray(seq[:, pos]), jnp.asarray(pos), cache, COMPUTE
        )
        np.testing.assert_allclose(
            np.asarray(logits)[:, :N_VOCAB], theirs[:, pos], atol=2e-3, rtol=1e-2
        )
