"""Real-dims token-parity oracle against HuggingFace Whisper (offline).

The environment cannot download real checkpoints (PARITY_STATUS.json), so
this module builds the strongest offline substitute (VERDICT r4 #1): a
random-init HF ``WhisperForConditionalGeneration`` at real Large-V3 *width*
(D=1280, 20 heads, dh=64, 128 mels, vocab 51866 — layer count reduced to
fit the offline environment), pushed through the FULL production intake
path (``convert_state_dict`` -> Q4_0 GGUF -> ``load_whisper_from_gguf``),
with the same GGUF **dequantized back into the HF model** so both stacks
run identical effective weights. HF ``generate()`` is then an independent
implementation of the reference greedy protocol
(/root/reference/src/model/whisper.rs:104-127) to pin ours against,
token for token.

Used by scripts/hf_realdims_parity.py (the HF_PARITY.md artifact) and
tests/test_hf_oracle.py (round-trip write-back pinned at toy dims).
"""

from __future__ import annotations

import numpy as np

from whisper_burn_tpu.gguf.convert import convert_state_dict, hf_name_to_gguf
from whisper_burn_tpu.gguf.loader import load_whisper_from_gguf
from whisper_burn_tpu.gguf.reader import GgufReader


def build_hf_fixture(
    *,
    d_model: int = 1280,
    n_heads: int = 20,
    n_mels: int = 128,
    vocab: int = 51866,
    enc_layers: int = 4,
    dec_layers: int = 4,
    n_audio_ctx: int = 1500,
    n_text_ctx: int = 448,
    seed: int = 0,
):
    """Random HF Whisper at the requested dims, decoder embeddings
    diversified (plain init yields degenerate single-token greedy
    trajectories — same trick as tests/test_hf_parity.py)."""
    import torch
    import transformers

    hf_cfg = transformers.WhisperConfig(
        vocab_size=vocab,
        num_mel_bins=n_mels,
        encoder_layers=enc_layers,
        encoder_attention_heads=n_heads,
        decoder_layers=dec_layers,
        decoder_attention_heads=n_heads,
        d_model=d_model,
        encoder_ffn_dim=4 * d_model,
        decoder_ffn_dim=4 * d_model,
        max_source_positions=n_audio_ctx,
        max_target_positions=n_text_ctx,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    with torch.no_grad():
        hf.model.decoder.embed_tokens.weight.normal_(0, 0.2)
        hf.model.decoder.embed_positions.weight.normal_(0, 1.0)
    return hf


def convert_and_load(hf, *, n_lang: int | None = None):
    """HF model -> Q4_0 GGUF bytes -> our loader. Returns
    ``(gguf_bytes, LoadedModel)`` — the production intake path end to end."""
    state = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    if n_lang is None:
        n_lang = 100 if hf.config.num_mel_bins >= 128 else 99
    blob = convert_state_dict(state, n_lang=n_lang).to_bytes()
    return blob, load_whisper_from_gguf(blob)


def writeback_gguf_to_hf(hf, gguf_bytes: bytes) -> None:
    """Dequantize every GGUF tensor back into the HF model, in place.

    After this, HF runs the SAME effective (Q4_0-rounded) weights our
    loader serves, so parity-compute greedy decodes must match
    token-for-token — quantization is no longer a confound.
    """
    import torch

    r = GgufReader.from_bytes(gguf_bytes)
    state = {k: v.clone() for k, v in hf.state_dict().items()}
    for hf_name in list(state):
        gguf_name = hf_name_to_gguf(hf_name)
        if gguf_name is None:
            continue
        arr = r.tensor_f32(gguf_name)
        assert tuple(arr.shape) == tuple(state[hf_name].shape), (
            hf_name, gguf_name, arr.shape, state[hf_name].shape)
        state[hf_name] = torch.from_numpy(np.ascontiguousarray(arr))
    # proj_out is tied to the token embedding (not stored in GGUF); keep
    # the tied pair consistent explicitly so load order cannot clobber it
    if "proj_out.weight" in state:
        state["proj_out.weight"] = state["model.decoder.embed_tokens.weight"]
    hf.load_state_dict(state)
    hf.eval()


def hf_generate_greedy(hf, cfg, mel: np.ndarray, langs: np.ndarray, *,
                       max_new: int, num_beams: int = 1) -> list[np.ndarray]:
    """HF ``generate()`` under the reference decode protocol: forced
    4-token prompt [SOT, lang, TRANSCRIBE, NO_TS], EOT banned for the
    first MIN_TOKENS=3 samples, greedy/beam, stop at EOT
    (/root/reference/src/model/whisper.rs:62-127). Returns per-stream
    generated ids with the prompt and EOT stripped."""
    import torch
    import transformers

    from whisper_burn_tpu.models.config import EOT, SOT

    b = mel.shape[0]
    prompt = np.stack(
        [
            np.full(b, SOT),
            langs.astype(np.int64),
            np.full(b, cfg.transcribe_token),
            np.full(b, cfg.no_timestamps_token),
        ],
        axis=1,
    )
    gc = transformers.GenerationConfig(
        do_sample=False,
        num_beams=num_beams,
        min_new_tokens=3,
        max_new_tokens=max_new,
        eos_token_id=EOT,
        pad_token_id=EOT,
        begin_suppress_tokens=None,
        forced_decoder_ids=None,
        length_penalty=1.0,
        early_stopping=False,
    )
    with torch.no_grad():
        gen = hf.generate(
            input_features=torch.from_numpy(np.asarray(mel, np.float32)),
            decoder_input_ids=torch.from_numpy(prompt),
            generation_config=gc,
        ).numpy()
    rows = []
    for t in gen:  # HF's Whisper generate returns generated-only tokens
        rows.append(t[: int(np.argmax(t == EOT))] if (t == EOT).any() else t)
    return rows


def agreement(ours: np.ndarray, n_gen: int, theirs: np.ndarray) -> float:
    """Per-step token agreement over the union of generated regions."""
    n = max(int(n_gen), len(theirs))
    if n == 0:
        return 1.0
    hits = sum(
        1
        for i in range(n)
        if i < int(n_gen) and i < len(theirs) and int(ours[i]) == int(theirs[i])
    )
    return hits / n
