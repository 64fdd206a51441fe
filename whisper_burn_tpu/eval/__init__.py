"""Evaluation tooling: WER, text normalization, manifest runners.

The reference ships no WER tooling (SURVEY §5: the only metric is a
per-utterance ``inference_ms``); BASELINE.md's accuracy target (WER within
0.1 abs on LibriSpeech test-clean) needs these.
"""

from whisper_burn_tpu.eval.wer import normalize_text, wer, word_errors

__all__ = ["wer", "word_errors", "normalize_text"]
