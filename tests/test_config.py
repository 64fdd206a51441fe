"""Config presets and derived-token-id contracts (SURVEY §2.6.5)."""

from whisper_burn_tpu.languages import ALL_LANGUAGES, lang_token_id, language_from_code
from whisper_burn_tpu.models.config import EOT, MAX_TOKENS, MIN_TOKENS, SOT, WhisperConfig


def test_shared_token_ids():
    assert SOT == 50258 and EOT == 50257
    assert MAX_TOKENS == 224 and MIN_TOKENS == 3


def test_large_v3_preset():
    cfg = WhisperConfig.large_v3()
    assert (cfg.n_mels, cfg.n_audio_state, cfg.n_audio_head) == (128, 1280, 20)
    assert (cfg.n_audio_layer, cfg.n_text_layer) == (32, 32)
    assert (cfg.n_audio_ctx, cfg.n_text_ctx) == (1500, 448)
    assert cfg.n_lang == 100
    # Large V3: TRANSCRIBE=50360, NO_TS=50364 (src/model/config.rs:65-75)
    assert cfg.transcribe_token == 50360
    assert cfg.no_timestamps_token == 50364
    assert (cfg.lang_token_start, cfg.lang_token_end) == (50259, 50359)
    assert cfg.head_dim == 64 and cfg.ffn_dim == 5120
    assert cfg.n_vocab_padded % 128 == 0 and cfg.n_vocab_padded >= cfg.n_vocab


def test_medium_preset():
    cfg = WhisperConfig.medium()
    assert (cfg.n_mels, cfg.n_audio_state, cfg.n_audio_head) == (80, 1024, 16)
    assert (cfg.n_audio_layer, cfg.n_text_layer) == (24, 24)
    assert cfg.n_lang == 99
    # Medium: TRANSCRIBE=50359, NO_TS=50363
    assert cfg.transcribe_token == 50359
    assert cfg.no_timestamps_token == 50363
    assert cfg.head_dim == 64


def test_large_v3_turbo_preset():
    cfg = WhisperConfig.large_v3_turbo()
    assert cfg.n_audio_layer == 32
    assert cfg.n_text_layer == 4  # "6x faster" (src/lib.rs:8-9)
    assert cfg.transcribe_token == 50360


def test_language_table():
    assert len(ALL_LANGUAGES) == 101  # Auto + 99 reference languages + yue
    assert ALL_LANGUAGES[0].code is None
    assert lang_token_id("en") == 50259
    assert lang_token_id("su") == 50357  # last reference entry
    assert language_from_code("fr").token_id == 50265
    assert language_from_code("nonsense").code is None  # falls back to Auto
    assert language_from_code(None).code is None
    # token ids are contiguous and unique
    ids = [l.token_id for l in ALL_LANGUAGES[1:]]
    assert ids == list(range(50259, 50359))


def test_cantonese_n_lang_gate():
    """Large-V3's 100th language is reachable; Medium rejects it cleanly
    (VERDICT r1 item 7; reference anchor src/model/config.rs:78-80)."""
    import pytest

    assert lang_token_id("yue") == 50358
    assert lang_token_id("yue", n_lang=100) == 50358
    with pytest.raises(ValueError):
        lang_token_id("yue", n_lang=99)  # Medium has no Cantonese token
    assert lang_token_id("su", n_lang=99) == 50357  # boundary still in range
