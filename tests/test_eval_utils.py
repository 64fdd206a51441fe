"""WER, eval runner (with resume), profiling utils, checkpoint cache."""

import json

import numpy as np
import pytest

from whisper_burn_tpu.eval import normalize_text, wer, word_errors
from whisper_burn_tpu.eval.runner import evaluate_manifest
from whisper_burn_tpu.utils import StageTimer, ThroughputMeter


def test_normalize_text():
    # default: the full Whisper English normalizer (contractions expand)
    assert normalize_text("  Hello, WORLD!  ") == "hello world"
    assert normalize_text("don't. STOP") == "do not stop"
    assert normalize_text("one hundred and fifty dollars") == "$150"
    # basic mode: casefold + punctuation strip only
    assert normalize_text("don't. STOP", basic=True) == "don't stop"


def test_word_errors_and_wer():
    assert word_errors("a b c", "a b c") == (0, 3)
    assert word_errors("a b c", "a x c") == (1, 3)
    assert word_errors("a b c", "a c") == (1, 3)
    assert word_errors("a b c", "a b c d") == (1, 3)
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer(["a b", "c d"], ["a x", "c d"]) == pytest.approx(0.25)
    # empty reference: all hypothesis words are insertions
    assert word_errors("", "x y") == (2, 0)


def test_throughput_meter():
    m = ThroughputMeter()
    m.begin()
    m.end(audio_seconds=30.0, tokens=100)
    assert m.audio_s_per_s > 0
    assert m.tokens_per_s > 0


def test_stage_timer():
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()


class _FakeResult:
    def __init__(self, text):
        self.text = text
        self.inference_ms = 10.0
        self.tokens = np.array([1, 2])
        self.lang_token = 50259


class _FakePipeline:
    def __init__(self):
        self.calls = 0

    def transcribe_batch(self, audios, languages):
        self.calls += 1
        return [_FakeResult("hello world") for _ in audios]


def test_evaluate_manifest_with_resume(tmp_path):
    from whisper_burn_tpu.audio.io import AudioBuffer, save_wav

    wavs = []
    for i in range(3):
        p = tmp_path / f"{i}.wav"
        save_wav(p, AudioBuffer(np.zeros(1600, np.float32), 16000))
        wavs.append(p)
    manifest = tmp_path / "manifest.jsonl"
    with manifest.open("w") as f:
        for i, p in enumerate(wavs):
            f.write(json.dumps({"id": i, "audio": str(p), "text": "hello world"}) + "\n")

    pipe = _FakePipeline()
    summary = evaluate_manifest(pipe, manifest, batch_size=2)
    assert summary.n_utterances == 3
    assert summary.wer == 0.0
    assert summary.audio_seconds == pytest.approx(0.3)
    assert pipe.calls == 2  # batches of 2 + 1

    # resume: nothing left to do
    pipe2 = _FakePipeline()
    summary2 = evaluate_manifest(pipe2, manifest, batch_size=2)
    assert pipe2.calls == 0
    assert summary2.n_utterances == 3


def test_repacked_cache_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_loader import _synthetic_state

    from whisper_burn_tpu.gguf.cache import load_repacked, load_whisper
    from whisper_burn_tpu.gguf.convert import convert_state_dict

    gguf_path = tmp_path / "m.gguf"
    convert_state_dict(_synthetic_state(), n_lang=99).write(gguf_path)

    assert load_repacked(gguf_path) is None  # cold
    m1 = load_whisper(gguf_path)  # populates the cache
    m2 = load_repacked(gguf_path)
    assert m2 is not None
    assert m2.config == m1.config
    import jax

    for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # invalidation on source change
    gguf_path.write_bytes(gguf_path.read_bytes() + b"\x00" * 32)
    assert load_repacked(gguf_path) is None


def test_download_file_atomic_and_skip(tmp_path):
    from whisper_burn_tpu.download import download_file, list_installed_models

    src = tmp_path / "src.bin"
    src.write_bytes(b"x" * 1000)
    dest = tmp_path / "models" / "m.gguf"
    seen = []
    out = download_file(src.as_uri(), dest, progress=lambda r, t: seen.append(r))
    assert out.read_bytes() == b"x" * 1000
    assert seen and seen[-1] == 1000
    assert not dest.with_suffix(".gguf.tmp").exists()

    # skip-if-exists: source change is NOT re-fetched
    src.write_bytes(b"y" * 5)
    download_file(src.as_uri(), dest)
    assert out.read_bytes() == b"x" * 1000

    installed = list_installed_models(tmp_path / "models")
    assert len(installed) == 1 and installed[0][1] == 1000


def test_app_config_roundtrip(tmp_path):
    from whisper_burn_tpu.app_config import AppConfig, load_config, save_config

    p = tmp_path / "cfg" / "config.json"
    assert load_config(p) == AppConfig()  # missing -> defaults
    cfg = AppConfig(model="m.gguf", language="fr", beam_width=5, compute="fastest")
    save_config(cfg, p)
    assert not p.with_suffix(".json.tmp").exists()
    assert load_config(p) == cfg
    # corrupt file -> defaults, no raise
    p.write_text("{not json")
    assert load_config(p) == AppConfig()
    # unknown keys ignored (forward compat)
    p.write_text('{"language": "de", "bogus": 1}')
    assert load_config(p).language == "de"
