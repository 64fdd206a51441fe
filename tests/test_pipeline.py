"""End-to-end pipeline tests with a synthetic model + tokenizer."""

import numpy as np
import pytest

from whisper_burn_tpu.audio.io import AudioBuffer, load_wav
from whisper_burn_tpu.gguf.loader import LoadedModel
from whisper_burn_tpu.models import WhisperConfig, random_params
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend
from whisper_burn_tpu.tokenizer import WhisperTokenizer
from whisper_burn_tpu.transcribe import WhisperPipeline

TEST_WAV = "/root/reference/test.wav"


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    """Minimal byte-level BPE tokenizer covering ids the tiny model samples."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(vocab_size=400, special_tokens=[])
    tok.train_from_iterator(
        ["hello world this is a tiny whisper test corpus"] * 8, trainer
    )
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return WhisperTokenizer.from_file(path)


@pytest.fixture(scope="module")
def model():
    # real Whisper-style vocab so the special tokens exist
    cfg = WhisperConfig.tiny_test()
    params = random_params(cfg, seed=0, quantized=True)
    return LoadedModel(config=cfg, params=params)


@pytest.fixture(scope="module")
def pipeline(model, tokenizer):
    compute = Compute.parity().replace(backend=KernelBackend.XLA)
    return WhisperPipeline(model, tokenizer, compute=compute, max_tokens=8)


def _tone(seconds=1.0, rate=16000, hz=440.0):
    t = np.arange(int(seconds * rate)) / rate
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_transcribe_single(pipeline):
    res = pipeline.transcribe(_tone(), language="en")
    assert isinstance(res.text, str)
    assert res.inference_ms > 0
    assert res.lang_token == 50259
    assert len(res.tokens) <= 8
    # deterministic
    res2 = pipeline.transcribe(_tone(), language="en")
    np.testing.assert_array_equal(res.tokens, res2.tokens)
    assert res.text == res2.text


def test_transcribe_batch_matches_single(pipeline):
    a, b = _tone(hz=440), _tone(hz=220)
    batch = pipeline.transcribe_batch([a, b], ["en", "de"])
    solo = pipeline.transcribe(a, language="en")
    np.testing.assert_array_equal(batch[0].tokens, solo.tokens)
    assert batch[1].lang_token == 50261


def test_transcribe_resamples(pipeline):
    buf = AudioBuffer(_tone(rate=44100), sample_rate=44100)
    res = pipeline.transcribe(buf, language="en")
    assert isinstance(res.text, str)


def test_transcribe_long_chunks(pipeline):
    """65 s of audio -> 3 chunks, one batched call, concatenated text."""
    audio = np.tile(_tone(seconds=1.0), 65).astype(np.float32)
    res = pipeline.transcribe_long(audio, language="en")
    assert isinstance(res.text, str)
    assert res.tokens.ndim == 1


def test_transcribe_test_wav(pipeline):
    """The reference parity fixture runs through the whole stack."""
    buf = load_wav(TEST_WAV)
    res = pipeline.transcribe(buf, language="en")
    assert res.inference_ms > 0


def test_auto_language_detection(pipeline):
    res = pipeline.transcribe(_tone(), language="auto")
    assert 50259 <= res.lang_token < 50259 + pipeline.config.n_lang


def test_profile_mode_reports_stages(model, tokenizer):
    """profile=True accumulates per-stage timings + throughput (the
    reference's tracing-span equivalent, SURVEY §5; VERDICT r1 item 10)."""
    compute = Compute.parity().replace(backend=KernelBackend.XLA)
    pipe = WhisperPipeline(
        model, tokenizer, compute=compute, max_tokens=8, profile=True
    )
    pipe.transcribe(_tone(), language="en")
    report = pipe.profile_report()
    for stage in ("audio_prep", "device_step", "detokenize", "throughput:"):
        assert stage in report, report
    assert pipe.throughput.audio_seconds > 0
    assert pipe.throughput.tokens > 0
    # a second call accumulates
    pipe.transcribe(_tone(hz=300), language="en")
    assert pipe.stage_timer.counts["device_step"] == 2


def test_reference_frontend_profile(model, tokenizer):
    compute = Compute.parity().replace(backend=KernelBackend.XLA)
    pipe = WhisperPipeline(
        model, tokenizer, compute=compute, frontend="reference", max_tokens=6
    )
    assert pipe.config.gelu == "tanh"
    res = pipe.transcribe(_tone(), language="en")
    assert isinstance(res.text, str)


def test_tokenizer_roundtrip(tokenizer):
    ids = tokenizer.encode("hello world")
    assert tokenizer.decode(ids).strip() == "hello world"
    # decode_transcription filters special/eot ids
    assert tokenizer.decode_transcription(list(ids) + [50257, 50258]) == "hello world"


def test_pipeline_beam_search(model, tokenizer):
    from whisper_burn_tpu.ops.compute import KernelBackend

    compute = Compute.parity().replace(backend=KernelBackend.XLA)
    pipe = WhisperPipeline(
        model, tokenizer, compute=compute, max_tokens=6, beam_width=3
    )
    res = pipe.transcribe(_tone(), language="en")
    assert isinstance(res.text, str)
    assert len(res.tokens) <= 6


def test_batch_bucketing_pads_to_power_of_two(pipeline):
    """A 3-utterance batch compiles the 4-wide program and results match."""
    a, b, c = _tone(hz=300), _tone(hz=400), _tone(hz=500)
    results = pipeline.transcribe_batch([a, b, c], ["en", "en", "en"])
    assert len(results) == 3
    solo = pipeline.transcribe(a, language="en")
    np.testing.assert_array_equal(results[0].tokens, solo.tokens)
    assert (4, False) in pipeline._jitted  # bucketed signature


def test_translate_task(model, tokenizer):
    compute = Compute.parity().replace(backend=KernelBackend.XLA)
    pipe = WhisperPipeline(
        model, tokenizer, compute=compute, max_tokens=6, task="translate"
    )
    res = pipe.transcribe(_tone(), language="de")
    assert isinstance(res.text, str)


def test_stitch_texts_dedupes_overlap():
    from whisper_burn_tpu.transcribe import stitch_texts

    assert (
        stitch_texts(["the quick brown fox jumps", "brown fox jumps over the lazy dog"])
        == "the quick brown fox jumps over the lazy dog"
    )
    # punctuation/case-insensitive matching, original casing preserved
    assert (
        stitch_texts(["Hello there, General Kenobi.", "general kenobi you are bold"])
        == "Hello there, General Kenobi. you are bold"
    )


def test_stitch_texts_boundary_split_word():
    from whisper_burn_tpu.transcribe import stitch_texts

    # window 1 ends in a fragment of a word cut by the window boundary;
    # window 2 decodes it whole — the fragment is dropped, nothing dupes
    assert (
        stitch_texts(["we ran the transcri", "ran the transcription engine"])
        == "we ran the transcription engine"
    )


def test_stitch_texts_no_overlap_falls_back_to_join():
    from whisper_burn_tpu.transcribe import stitch_texts

    assert stitch_texts(["completely different", "texts here"]) == (
        "completely different texts here"
    )
    assert stitch_texts(["", "only second"]) == "only second"


def test_transcribe_long_overlapping_windows(pipeline, monkeypatch):
    """Windows advance by chunk - overlap and cover the full signal."""
    seen = {}
    orig = pipeline.transcribe_batch

    def spy(audios, languages=None):
        seen["n"] = len(audios)
        seen["lens"] = [len(a) for a in audios]
        return orig(audios, languages)

    monkeypatch.setattr(pipeline, "transcribe_batch", spy)
    audio = np.tile(_tone(seconds=1.0), 65).astype(np.float32)
    res = pipeline.transcribe_long(audio, language="en", overlap_seconds=5.0)
    assert isinstance(res.text, str)
    chunk = pipeline.chunk_samples
    overlap = min(5 * 16000, chunk // 2)  # impl clamps to half a window
    stride = chunk - overlap
    import math

    expected = math.ceil((len(audio) - overlap) / stride)
    assert seen["n"] == expected
    assert all(l <= chunk for l in seen["lens"])
