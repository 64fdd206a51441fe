"""Whisper model configurations and derived token ids.

Contract from the reference (src/model/config.rs, src/model/whisper.rs:13-20):

* SOT=50258, EOT=50257 shared across models
* TRANSCRIBE = 50260 + n_lang (50359 Medium / 50360 Large V3)
* NO_TIMESTAMPS = TRANSCRIBE + 4 (50363 / 50364)
* language tokens occupy [50259, 50259 + n_lang)
* head_dim = state / heads (= 64 everywhere), ffn_dim = 4 * state
* decode caps: 224 generated tokens, 448 text context
"""

from __future__ import annotations

from dataclasses import dataclass

SOT = 50258  # start of transcript (src/model/whisper.rs:14)
EOT = 50257  # end of transcript (src/model/whisper.rs:15)
MAX_TOKENS = 224  # generation cap (src/model/whisper.rs:20)
MIN_TOKENS = 3  # EOT suppressed for the first 3 samples (src/model/whisper.rs:97)

_LANE = 128  # TPU lane width; vocab is padded to a multiple for the MXU


@dataclass(frozen=True)
class WhisperConfig:
    """Hyperparameters (reference: src/model/config.rs:5-28).

    Frozen + hashable so it can ride through ``jax.jit`` as a static arg.
    """

    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int
    n_vocab: int
    n_lang: int
    # "tanh" follows the reference's approximation (src/model/layers.rs:35-41);
    # "erf" is the exact GELU that OpenAI/HF Whisper actually uses.
    gelu: str = "tanh"

    # -- presets -----------------------------------------------------------

    @classmethod
    def large_v3(cls) -> "WhisperConfig":
        """Whisper Large V3, 1.55B params (src/model/config.rs:32-46)."""
        return cls(
            n_mels=128,
            n_audio_ctx=1500,
            n_audio_state=1280,
            n_audio_head=20,
            n_audio_layer=32,
            n_text_ctx=448,
            n_text_state=1280,
            n_text_head=20,
            n_text_layer=32,
            n_vocab=51865,
            n_lang=100,
        )

    @classmethod
    def large_v3_turbo(cls) -> "WhisperConfig":
        """Large V3 Turbo, 809M params: 4 decoder layers ("6x faster",
        reference src/lib.rs:8-9)."""
        return cls.large_v3().replace(n_text_layer=4)

    @classmethod
    def medium(cls) -> "WhisperConfig":
        """Whisper Medium, 769M params (src/model/config.rs:49-63)."""
        return cls(
            n_mels=80,
            n_audio_ctx=1500,
            n_audio_state=1024,
            n_audio_head=16,
            n_audio_layer=24,
            n_text_ctx=448,
            n_text_state=1024,
            n_text_head=16,
            n_text_layer=24,
            n_vocab=51865,
            n_lang=99,
        )

    @classmethod
    def tiny_test(cls, n_vocab: int = 51865, n_lang: int = 99) -> "WhisperConfig":
        """Miniature config for unit tests (not a real Whisper variant)."""
        return cls(
            n_mels=8,
            n_audio_ctx=12,
            n_audio_state=64,
            n_audio_head=2,
            n_audio_layer=2,
            n_text_ctx=16,
            n_text_state=64,
            n_text_head=2,
            n_text_layer=2,
            n_vocab=n_vocab,
            n_lang=n_lang,
        )

    def replace(self, **kwargs) -> "WhisperConfig":
        from dataclasses import replace as _replace

        return _replace(self, **kwargs)

    # -- derived token ids (src/model/config.rs:65-80) ---------------------

    @property
    def transcribe_token(self) -> int:
        # layout: SOT(50258), langs(50259..+n_lang), TRANSLATE, TRANSCRIBE
        return 50260 + self.n_lang

    @property
    def translate_token(self) -> int:
        return 50259 + self.n_lang

    @property
    def no_timestamps_token(self) -> int:
        return self.transcribe_token + 4

    @property
    def lang_token_start(self) -> int:
        return 50259

    @property
    def lang_token_end(self) -> int:
        return 50259 + self.n_lang

    # -- derived dims ------------------------------------------------------

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def ffn_dim(self) -> int:
        return self.n_audio_state * 4

    @property
    def n_vocab_padded(self) -> int:
        """Vocab rounded up to the TPU lane width for the tied output matmul."""
        return (self.n_vocab + _LANE - 1) // _LANE * _LANE
