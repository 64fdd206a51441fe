"""eval.hf_oracle round-trip: GGUF write-back makes HF an exact oracle.

Pins (at toy dims, D=256 so the Q4_0 policy actually quantizes) that
``writeback_gguf_to_hf`` really lands the dequantized Q4 weights in the HF
model, and that afterwards HF ``generate()`` and our parity-compute greedy
decode agree token-for-token — the protocol scripts/hf_realdims_parity.py
runs at real Large-V3 width (VERDICT r4 #1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from whisper_burn_tpu.eval.hf_oracle import (
    build_hf_fixture,
    convert_and_load,
    hf_generate_greedy,
    writeback_gguf_to_hf,
)
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend

COMPUTE = Compute.parity().replace(backend=KernelBackend.XLA)
DIMS = dict(
    d_model=256, n_heads=4, n_mels=8, vocab=51865,
    enc_layers=2, dec_layers=2, n_audio_ctx=16, n_text_ctx=64,
)


@pytest.fixture(scope="module")
def oracle():
    hf = build_hf_fixture(**DIMS)
    before = hf.model.encoder.layers[0].self_attn.q_proj.weight.detach().clone()
    blob, loaded = convert_and_load(hf)
    writeback_gguf_to_hf(hf, blob)
    return hf, before, loaded


def test_writeback_applies_quantization(oracle):
    hf, before, loaded = oracle
    after = hf.model.encoder.layers[0].self_attn.q_proj.weight.detach()
    # a >=256-wide matrix went through Q4_0: values must have moved...
    assert not torch.equal(before, after)
    assert (before - after).abs().max() < 0.1  # ...but only by quant error
    # embeddings escape the quant policy: write-back restores them exactly
    emb = hf.model.decoder.embed_tokens.weight.detach()
    assert torch.equal(emb, hf.proj_out.weight.detach())  # tie preserved


def test_post_writeback_generate_matches_ours(oracle):
    """Both stacks now run identical effective weights: token-exact."""
    from whisper_burn_tpu.models.whisper import greedy_decode

    hf, _, loaded = oracle
    cfg = loaded.config.replace(gelu="erf")
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
        np.float32
    )
    langs = np.array([50259, 50261], np.int32)
    theirs = hf_generate_greedy(hf, cfg, mel, langs, max_new=16)
    res = greedy_decode(
        loaded.params, cfg, jnp.asarray(mel), jnp.asarray(langs), COMPUTE,
        max_tokens=16,
    )
    ours, n_gen = np.asarray(res.tokens), np.asarray(res.n_generated)
    for i in range(2):
        np.testing.assert_array_equal(ours[i][: n_gen[i]], theirs[i])
