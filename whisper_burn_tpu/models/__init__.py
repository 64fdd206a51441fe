"""Whisper model layer (L2): config, params, encoder, decoder, greedy loop."""

from whisper_burn_tpu.models.config import (
    EOT,
    MAX_TOKENS,
    MIN_TOKENS,
    SOT,
    WhisperConfig,
)
from whisper_burn_tpu.models.decoder import (
    KVCache,
    compute_cross_kv,
    decode_step,
    init_cache,
    prefill,
)
from whisper_burn_tpu.models.encoder import encode
from whisper_burn_tpu.models.params import count_params, random_params, stack_layers
from whisper_burn_tpu.models.beam import BeamResult, beam_decode
from whisper_burn_tpu.models.whisper import GreedyResult, detect_language, greedy_decode

__all__ = [
    "EOT",
    "SOT",
    "MAX_TOKENS",
    "MIN_TOKENS",
    "WhisperConfig",
    "KVCache",
    "init_cache",
    "compute_cross_kv",
    "prefill",
    "decode_step",
    "encode",
    "random_params",
    "stack_layers",
    "count_params",
    "GreedyResult",
    "greedy_decode",
    "BeamResult",
    "beam_decode",
    "detect_language",
]
