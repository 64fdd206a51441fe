"""End-to-end transcription pipeline: audio -> mel -> encode -> decode -> text.

Counterpart of the reference's src/transcribe.rs, restructured TPU-first:
the mel frontend, encoder, prefill, and the whole greedy loop compile into
**one** jitted program per (batch, detect) signature — no host round-trips
between stages (the reference crosses CPU->GPU at upload and GPU->CPU every
decoded token, src/transcribe.rs:66-82 + SURVEY §3.1).

Pipeline steps mirror src/transcribe.rs:34-107:
resample to 16 kHz -> pad/truncate to 480,000 samples -> log-mel
[B, n_mels, 3000] -> greedy decode -> filter ids < EOT -> BPE decode -> trim.

``frontend`` selects the numerics profile:

* ``"openai"`` (default): slaney-normed mel + exact GELU — what the actual
  Whisper checkpoints were trained with; best WER.
* ``"reference"``: unnormalized mel + tanh GELU — bit-parity with the
  reference implementation's own frontend (src/audio/mel.rs:308-309,
  src/model/layers.rs:35-41).

Long audio (> 30 s) is handled by 30-second chunking with the chunks run
as one data-parallel batch (the reference truncates instead,
src/transcribe.rs:49-51).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from whisper_burn_tpu.audio.io import AudioBuffer
from whisper_burn_tpu.audio.mel import WHISPER_HOP, MelFrontend, pad_or_trim
from whisper_burn_tpu.audio.resample import resample_to_16k
from whisper_burn_tpu.gguf.loader import LoadedModel
from whisper_burn_tpu.languages import lang_token_id
from whisper_burn_tpu.models.config import MAX_TOKENS, WhisperConfig
from whisper_burn_tpu.models.params import Params
from whisper_burn_tpu.models.beam import beam_decode
from whisper_burn_tpu.models.whisper import greedy_decode
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.tokenizer import WhisperTokenizer


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled XLA executables across processes (first compile of
    the full Large-V3 pipeline is expensive; repeat CLI invocations become
    instant). Called by the pipeline constructor; safe to call twice."""
    path = path or os.path.expanduser("~/.cache/whisper_burn_tpu/xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass


@dataclass
class TranscribeResult:
    text: str
    # batch-amortized per-utterance device time (batch wall / real batch
    # size) — a result from a batch of 64 reports 1/64th of the batch wall,
    # so serving stats and eval agree without re-dividing (VERDICT r3 #8).
    # The full batch wall time lives in the profile path (StageTimer
    # "device_step") and ServingStats.
    inference_ms: float
    tokens: np.ndarray  # generated ids (EOT-trimmed)
    lang_token: int


def quantize_logit_embedding(tok_emb) -> dict:
    """int8 copy of the tied embedding for the decode logits matmul.

    ``tok_emb [Vp, D]`` -> ``{"qw": int8 [D, Vp512], "scales": f32
    [D/32, Vp512]}`` — the ops/q4_matmul layout (codes + 32-block
    absmax/127 scales along K=D), so the same fused Pallas kernel that
    serves the projections also serves the logits. The vocab axis is
    pre-padded to the kernel's wide-N tile (512): the wrapper otherwise
    pads the 66 MB weight operand EVERY decode step (XPlane trace, r4).
    Padded columns (>= n_vocab anyway) quantize to exact zeros and are
    -inf-masked by decoder._logits.
    """
    w = np.asarray(tok_emb, np.float32).T  # [D, Vp]
    k, n = w.shape
    assert k % 32 == 0, k
    n_pad = -(-n // 512) * 512
    if n_pad != n:
        w = np.concatenate([w, np.zeros((k, n_pad - n), np.float32)], axis=1)
        n = n_pad
    w3 = w.reshape(k // 32, 32, n)
    s = np.maximum(np.abs(w3).max(axis=1), 1e-12) / 127.0  # [K/32, N]
    qw = np.clip(np.round(w3 / s[:, None, :]), -127, 127).astype(np.int8)
    return {"qw": qw.reshape(k, n), "scales": s.astype(np.float32)}


def prepare_params(
    params: Params, compute: Compute, fuse: bool = True, tp: int = 1
) -> Params:
    """Serving-time param preparation: fuse q/k/v projections into wide
    matmuls (models/params.fuse_attention_params), move on-device, and cast
    dense weights/embeddings to the compute dtype once (so the decode loop
    streams bf16, not f32). LayerNorm params, biases, and quant scales stay
    f32. Under tensor parallelism pass ``tp`` = model-axis size so the
    fused N axis is built shard-interleaved (correct for the shard_map
    route in parallel/sharded.py).
    """
    if fuse:
        from whisper_burn_tpu.models.params import fuse_attention_params

        params = fuse_attention_params(params, tp=tp)

    if compute.w8a8:
        from whisper_burn_tpu.models.params import attach_w8a8

        params = attach_w8a8(params)

    if compute.quantized_logits and "tok_emb_q" not in params["decoder"]:
        params = {
            **params,
            "decoder": {
                **params["decoder"],
                "tok_emb_q": quantize_logit_embedding(
                    params["decoder"]["tok_emb"]
                ),
            },
        }

    def cast(path, x):
        leaf = path[-1].key if path else ""
        if leaf in ("w", "tok_emb", "pos"):
            return jnp.asarray(x, compute.dtype)
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(cast, params)


def _norm_word(w: str) -> str:
    return w.strip(".,!?;:\"'").lower()


def stitch_texts(texts: Sequence[str], min_match: int = 2, max_match: int = 24) -> str:
    """Merge transcripts of overlapping audio windows into one text.

    Consecutive windows share ``overlap_seconds`` of audio, so the head of
    each transcript repeats the tail of the previous one. For each join,
    find the longest ``k`` (``min_match <= k <= max_match``) where the last
    ``k`` words of the accumulated text equal the first ``k`` words of the
    next transcript (case/punctuation-insensitive) and drop that duplicated
    prefix. If no aligned run exists (silence in the overlap, or decode
    divergence) the texts are joined as-is — never dropping unseen words.

    A word *split* by the previous window's hard cut is decoded whole by
    the next window; because the split fragment rarely matches, alignment
    is also attempted with the previous window's final word excluded, and
    that (likely fragmentary) word is dropped when the next window's
    overlap region covers it.
    """
    out_words: list[str] = []
    for text in texts:
        words = text.split()
        if not out_words:
            out_words = words
            continue
        if not words:
            continue

        def match_len(base: list[str]) -> int:
            limit = min(len(base), len(words), max_match)
            for k in range(limit, min_match - 1, -1):
                if [_norm_word(w) for w in base[-k:]] == [
                    _norm_word(w) for w in words[:k]
                ]:
                    return k
            return 0

        k = match_len(out_words)
        if k:
            out_words.extend(words[k:])
            continue
        # boundary-split word: retry with the (fragmentary) final word of
        # the previous window removed
        k = match_len(out_words[:-1])
        if k:
            out_words = out_words[:-1] + words[k:]
        else:
            out_words.extend(words)
    return " ".join(out_words).strip()


class WhisperPipeline:
    """Stateful convenience wrapper holding params + jit caches.

    Counterpart of the reference's ``InferenceState`` (src/transcribe.rs:26-31).
    """

    def __init__(
        self,
        model: LoadedModel | tuple[WhisperConfig, Params],
        tokenizer: WhisperTokenizer | None = None,
        compute: Compute | None = None,
        frontend: str = "openai",
        max_tokens: int = MAX_TOKENS,
        beam_width: int = 1,
        task: str = "transcribe",
        bucket_batches: bool = True,
        mesh=None,
        profile: bool = False,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh`` with (data, model)
        axes — the pipeline then shards params Megatron-style over
        ``model``, splits utterance batches over ``data``, and compiles the
        decode through shard_map (parallel/sharded.py) so the one-call
        ``transcribe()`` surface (src/transcribe.rs:34) runs at pod scale.

        ``profile``: accumulate per-stage wall-clock times (audio prep /
        device step / detokenize) in ``self.stage_timer`` and throughput in
        ``self.throughput`` — the counterpart of the reference's tracing
        spans (src/transcribe.rs:39-92); read with :meth:`profile_report`.
        """
        if isinstance(model, LoadedModel):
            cfg, params = model.config, model.params
        else:
            cfg, params = model
        if frontend == "openai":
            cfg = cfg.replace(gelu="erf")
            mel_norm = "slaney"
        elif frontend == "reference":
            cfg = cfg.replace(gelu="tanh")
            mel_norm = None
        else:
            raise ValueError(f"unknown frontend {frontend!r}")

        enable_compilation_cache()
        self.config = cfg
        self.compute = compute or Compute.parity()
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.beam_width = beam_width
        self.task = task
        # round batch sizes up to powers of two (padding with silence) so
        # arbitrary batch sizes reuse a handful of compiled programs
        self.bucket_batches = bucket_batches
        self.mesh = mesh
        tp = 1
        if mesh is not None:
            from whisper_burn_tpu.parallel import validate_tp

            tp = validate_tp(cfg, mesh)
        self.params = prepare_params(params, self.compute, tp=tp)
        if mesh is not None:
            from whisper_burn_tpu.parallel import shard_params_tp

            self.params = shard_params_tp(self.params, mesh)
        self.mel = MelFrontend(n_mels=cfg.n_mels, norm=mel_norm, dtype=jnp.float32)
        # 30 s (480,000 samples) for real models; derived from the audio
        # context so miniature test configs work too (frames = 2 * n_audio_ctx,
        # src/transcribe.rs:21-24).
        self.chunk_samples = cfg.n_audio_ctx * 2 * WHISPER_HOP
        self._jitted: dict[tuple[int, bool], object] = {}
        self.profile = profile
        from whisper_burn_tpu.utils.profiling import StageTimer, ThroughputMeter

        self.stage_timer = StageTimer(sync=True) if profile else None
        self.throughput = ThroughputMeter() if profile else None

    # -- compiled entry ----------------------------------------------------

    def _fn(self, batch: int, detect: bool):
        key = (batch, detect)
        if key not in self._jitted:
            cfg, compute, mel = self.config, self.compute, self.mel
            max_tokens, beam_width = self.max_tokens, self.beam_width
            task, mesh = self.task, self.mesh

            if mesh is not None:
                tp = mesh.shape.get("model", 1)
                compute = compute.replace(
                    tp=tp, tp_axis="model" if tp > 1 else None
                )

            def decode(params, features, lang_tokens):
                if beam_width > 1:
                    return beam_decode(
                        params, cfg, features, lang_tokens, compute,
                        beam_width=beam_width, detect=detect,
                        max_tokens=max_tokens, task=task,
                    )
                return greedy_decode(
                    params, cfg, features, lang_tokens, compute,
                    detect=detect, max_tokens=max_tokens, task=task,
                )

            def body(params, audio, lang_tokens):
                features = mel(audio)  # [B(/data), n_mels, 3000]
                return decode(params, features, lang_tokens)

            if mesh is None:
                self._jitted[key] = jax.jit(body)
            else:
                from jax.sharding import PartitionSpec as P

                from whisper_burn_tpu.parallel.sharding import param_pspecs

                def run(params, audio, lang_tokens):
                    # the mel frontend is per-utterance, so it lives inside
                    # the shard_map body: audio shards over `data` and mel
                    # never materializes unsharded
                    return jax.shard_map(
                        body,
                        mesh=mesh,
                        in_specs=(param_pspecs(params), P("data"), P("data")),
                        out_specs=P("data"),
                        check_vma=False,
                    )(params, audio, lang_tokens)

                self._jitted[key] = jax.jit(run)
        return self._jitted[key]

    # -- public API --------------------------------------------------------

    def transcribe(
        self, audio: AudioBuffer | np.ndarray, language: str | None = "auto"
    ) -> TranscribeResult:
        """Transcribe one utterance (<= 30 s; longer input is truncated like
        the reference — use :meth:`transcribe_long` for full coverage)."""
        return self.transcribe_batch([audio], [language])[0]

    def transcribe_batch(
        self,
        audios: Sequence[AudioBuffer | np.ndarray],
        languages: Sequence[str | None] | None = None,
    ) -> list[TranscribeResult]:
        """Transcribe a batch of utterances in one compiled call."""
        import contextlib

        stage = self.stage_timer.stage if self.profile else (
            lambda name: contextlib.nullcontext()
        )
        if self.profile:
            self.throughput.begin()

        b = len(audios)
        if languages is None:
            languages = ["auto"] * b
        with stage("audio_prep"):
            samples = np.stack([self._prep_audio(a) for a in audios])
        lang_tokens = np.array([self._lang_token(l) for l in languages], np.int32)
        detect = bool((lang_tokens < 0).any())

        data = 1 if self.mesh is None else self.mesh.shape.get("data", 1)
        padded_b = b
        if self.bucket_batches and b > 1:
            padded_b = 1 << (b - 1).bit_length()  # next power of two
        if data > 1:
            # per-shard bucketing: every data shard gets the same
            # power-of-two utterance count
            per_shard = -(-padded_b // data)
            per_shard = 1 << max(0, per_shard - 1).bit_length() if per_shard > 1 else 1
            padded_b = data * per_shard
        if padded_b != b:
            pad = padded_b - b
            samples = np.concatenate(
                [samples, np.zeros((pad,) + samples.shape[1:], samples.dtype)]
            )
            lang_tokens = np.concatenate(
                [lang_tokens, np.full(pad, 50259, np.int32)]
            )

        fn = self._fn(padded_b, detect)
        start = time.perf_counter()
        with stage("device_step"):
            result = fn(self.params, jnp.asarray(samples), jnp.asarray(lang_tokens))
            tokens = np.asarray(result.tokens)  # blocks
        ms = (time.perf_counter() - start) * 1000.0 / b  # amortized/utterance
        n_gen = np.asarray(result.n_generated)
        langs = np.asarray(result.lang_tokens)

        out = []
        with stage("detokenize"):
            for i in range(b):
                ids = tokens[i, : n_gen[i]]
                text = (
                    self.tokenizer.decode_transcription(ids) if self.tokenizer else ""
                )
                out.append(TranscribeResult(text, ms, ids, int(langs[i])))
        if self.profile:
            self.throughput.end(
                audio_seconds=b * samples.shape[1] / 16000.0,
                tokens=int(n_gen[:b].sum()),
            )
        return out

    def transcribe_long(
        self,
        audio: AudioBuffer | np.ndarray,
        language: str | None = "auto",
        overlap_seconds: float = 5.0,
    ) -> TranscribeResult:
        """Chunked transcription for arbitrary-length audio.

        Windows of 30 s with ``overlap_seconds`` of shared audio between
        consecutive windows, processed as one data-parallel batch, then
        word-level stitched (:func:`stitch_texts`): a word cut by a window
        boundary appears whole in the next window, and the duplicated
        overlap region is deduped by longest word-sequence match. The
        reference truncates to one window (src/transcribe.rs:49-51);
        ``overlap_seconds=0`` reproduces the round-2 naive concatenation.
        """
        samples = self._to_16k(audio)
        n = len(samples)
        overlap = min(int(overlap_seconds * 16000), self.chunk_samples // 2)
        stride = self.chunk_samples - overlap if n > self.chunk_samples else self.chunk_samples
        starts = list(range(0, max(n - overlap, 1), stride))
        chunks = [samples[i : i + self.chunk_samples] for i in starts]
        results = self.transcribe_batch(
            [np.asarray(c, np.float32) for c in chunks],
            [language] * len(chunks),
        )
        texts = [r.text for r in results]
        text = stitch_texts(texts) if overlap and len(texts) > 1 else " ".join(
            t for t in texts if t
        ).strip()
        return TranscribeResult(
            text=text,
            inference_ms=sum(r.inference_ms for r in results),
            tokens=np.concatenate([r.tokens for r in results]),
            lang_token=results[0].lang_token,
        )

    def profile_report(self) -> str:
        """Per-stage timings + throughput counters (requires profile=True)."""
        if not self.profile:
            return "profiling disabled (construct with profile=True)"
        lines = [self.stage_timer.report()]
        lines.append(
            f"throughput: {self.throughput.audio_s_per_s:.1f} audio-s/s, "
            f"{self.throughput.tokens_per_s:.1f} tok/s over "
            f"{self.throughput.wall_seconds:.2f}s"
        )
        return "\n".join(lines)

    # -- helpers -----------------------------------------------------------

    def _to_16k(self, audio: AudioBuffer | np.ndarray) -> np.ndarray:
        if isinstance(audio, AudioBuffer):
            if audio.sample_rate != 16000:
                audio = resample_to_16k(audio)
            return audio.samples
        return np.asarray(audio, np.float32)

    def _prep_audio(self, audio: AudioBuffer | np.ndarray) -> np.ndarray:
        return pad_or_trim(self._to_16k(audio), self.chunk_samples)

    def _lang_token(self, language: str | None) -> int:
        if language is None or language == "auto":
            return -1
        return lang_token_id(language, n_lang=self.config.n_lang)
