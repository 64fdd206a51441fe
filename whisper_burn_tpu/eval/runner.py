"""Manifest evaluation runner with per-utterance checkpoint/resume.

Manifest = JSONL, one ``{"id": ..., "audio": "/path.wav", "text": "ref"}``
per line (LibriSpeech-style corpora convert to this trivially). Results
stream to ``<out>.results.jsonl`` as they complete, and a re-run resumes
from finished ids — the batch-job checkpointing the reference lacks
(SURVEY §5: a partial download restarts; here partial evals don't).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

from whisper_burn_tpu.audio.io import load_wav
from whisper_burn_tpu.eval.wer import wer


@dataclass
class EvalSummary:
    n_utterances: int
    wer: float
    audio_seconds: float
    inference_seconds: float

    @property
    def rtf(self) -> float:
        """Real-time factor: audio seconds processed per wall second."""
        return self.audio_seconds / max(self.inference_seconds, 1e-9)


def read_manifest(path: str | Path) -> Iterator[dict]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def evaluate_manifest(
    pipeline,
    manifest_path: str | Path,
    *,
    results_path: str | Path | None = None,
    batch_size: int = 8,
    language: str | None = "en",
    resume: bool = True,
) -> EvalSummary:
    """Transcribe a manifest in fixed-size batches and report corpus WER.

    ``pipeline``: a :class:`whisper_burn_tpu.transcribe.WhisperPipeline`.
    """
    manifest = list(read_manifest(manifest_path))
    if results_path is None:
        results_path = str(manifest_path) + ".results.jsonl"
    results_path = Path(results_path)

    done: dict[str, dict] = {}
    if resume and results_path.exists():
        for row in read_manifest(results_path):
            done[str(row["id"])] = row

    todo = [row for row in manifest if str(row["id"]) not in done]

    from whisper_burn_tpu import native_host

    with results_path.open("a") as out:
        for start in range(0, len(todo), batch_size):
            chunk = todo[start : start + batch_size]
            # native parallel feeder: decode + resample + frame the whole
            # batch in C++ threads (native/whisper_host.cpp wh_load_batch);
            # the per-file Python path is the fallback and the oracle
            chunk_samples = getattr(pipeline, "chunk_samples", None)
            fed = (
                native_host.load_batch([row["audio"] for row in chunk], chunk_samples)
                if chunk_samples
                else None
            )
            if fed is not None and (fed[1] == 0).all():
                batch_arr, _, lengths = fed
                audios = list(batch_arr)
                durations = [float(n) / 16000.0 for n in lengths]
            else:
                loaded = [load_wav(row["audio"]) for row in chunk]
                audios = loaded
                durations = [a.duration_s for a in loaded]
            results = pipeline.transcribe_batch(
                audios, [language] * len(chunk)
            )
            for row, dur, res in zip(chunk, durations, results):
                rec = {
                    "id": str(row["id"]),
                    "text": res.text,
                    "ref": row.get("text", ""),
                    "audio_s": dur,
                    # TranscribeResult.inference_ms is already amortized
                    # over the real batch size (transcribe.py)
                    "inference_ms": res.inference_ms,
                }
                done[rec["id"]] = rec
                out.write(json.dumps(rec) + "\n")
            out.flush()  # checkpoint: a killed run resumes from here

    rows = [done[str(row["id"])] for row in manifest if str(row["id"]) in done]
    refs = [r["ref"] for r in rows]
    hyps = [r["text"] for r in rows]
    return EvalSummary(
        n_utterances=len(rows),
        wer=wer(refs, hyps, language=language) if rows else 0.0,
        audio_seconds=sum(r["audio_s"] for r in rows),
        inference_seconds=sum(r["inference_ms"] for r in rows) / 1000.0,
    )
