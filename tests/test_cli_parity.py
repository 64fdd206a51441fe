"""`cli parity` — the real-weights readiness harness (VERDICT r2 item 5).

Exercised up to the download boundary with a synthetic on-disk GGUF:
record -> compare (PASS) -> tampered baseline (FAIL) -> missing weights /
offline (SKIP, exit 0). The same command pointed at a real Large-V3
checkpoint reproduces BASELINE configs 1-3 (token-exact greedy on
/root/reference/test.wav, src/transcribe.rs:34-107).
"""

import json
import tempfile

import pytest

from whisper_burn_tpu.cli import main
from whisper_burn_tpu.gguf.convert import convert_state_dict
from tests.test_loader import _synthetic_state

TEST_WAV = "/root/reference/test.wav"


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    state = _synthetic_state(d=256, n_audio_ctx=16, n_text_ctx=64)
    path = tmp_path_factory.mktemp("parity") / "model-q4.gguf"
    path.write_bytes(convert_state_dict(state, n_lang=99).to_bytes())
    return str(path)


def _run(argv):
    # Never let a test invocation clobber the tracked PARITY_STATUS.json
    # (the default --status-out is CWD-relative; ADVICE r4): route it to
    # a throwaway file unless the test asserts on it explicitly.
    if "--status-out" not in argv:
        argv = argv + [
            "--status-out",
            tempfile.mktemp(prefix="parity_status_", suffix=".json"),
        ]
    return main(argv)


def test_parity_record_then_pass(gguf_path, tmp_path):
    expected = str(tmp_path / "expected.json")
    rc = _run(
        ["parity", "--model", gguf_path, "--audio", TEST_WAV,
         "--expected", expected, "--record", "--max-tokens", "6"]
    )
    assert rc == 0
    payload = json.loads(open(expected).read())
    assert payload["tokens"] and payload["language"] == "en"

    rc = _run(
        ["parity", "--model", gguf_path, "--audio", TEST_WAV,
         "--expected", expected, "--max-tokens", "6"]
    )
    assert rc == 0  # token-exact PASS against the recorded baseline


def test_parity_detects_divergence(gguf_path, tmp_path):
    expected = str(tmp_path / "expected.json")
    _run(["parity", "--model", gguf_path, "--audio", TEST_WAV,
          "--expected", expected, "--record", "--max-tokens", "6"])
    payload = json.loads(open(expected).read())
    payload["tokens"][0] += 1  # tamper
    open(expected, "w").write(json.dumps(payload))
    rc = _run(["parity", "--model", gguf_path, "--audio", TEST_WAV,
               "--expected", expected, "--max-tokens", "6"])
    assert rc == 1  # FAIL is a nonzero exit


def test_parity_skips_when_weights_missing(tmp_path):
    rc = _run(["parity", "--model", str(tmp_path / "nope.gguf"),
               "--audio", TEST_WAV, "--expected", str(tmp_path / "e.json")])
    assert rc == 0  # SKIP, not a failure


def test_parity_skips_when_offline(tmp_path, monkeypatch):
    """No --model and the model download unavailable -> SKIP (exit 0)."""
    import whisper_burn_tpu.download as dl

    def boom(*a, **k):
        raise OSError("no network")

    monkeypatch.setattr(dl, "download_model", boom)
    rc = _run(["parity", "--models-dir", str(tmp_path),
               "--audio", TEST_WAV, "--expected", str(tmp_path / "e.json")])
    assert rc == 0


def test_parity_offline_status_records_fallback_chain(tmp_path, monkeypatch):
    """The SKIP record lists every intake step tried (VERDICT r4 #8)."""
    import whisper_burn_tpu.download as dl

    def boom(*a, **k):
        raise OSError("no network")

    monkeypatch.setattr(dl, "download_model", boom)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf_home"))  # empty cache
    status = tmp_path / "status.json"
    rc = _run(["parity", "--models-dir", str(tmp_path),
               "--audio", TEST_WAV, "--expected", str(tmp_path / "e.json"),
               "--status-out", str(status)])
    assert rc == 0
    rec = json.loads(status.read_text())
    assert rec["status"] == "SKIP"
    steps = [s["step"] for s in rec["attempted"]]
    assert steps == ["download", "hf_cache_scan"]


def test_parity_accepts_hf_checkpoint_dir(tmp_path):
    """--model pointed at a local HF safetensors dir converts in-process
    and runs the same parity flow (VERDICT r4 #8)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=8,
        encoder_layers=2, encoder_attention_heads=1,
        decoder_layers=2, decoder_attention_heads=1,
        d_model=64, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=16, max_target_positions=64,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    hf_dir = tmp_path / "hf_ckpt"
    hf.save_pretrained(hf_dir)

    status = tmp_path / "status.json"
    rc = _run(["parity", "--model", str(hf_dir),
               "--models-dir", str(tmp_path / "models"),
               "--audio", TEST_WAV,
               "--expected", str(tmp_path / "expected.json"),
               "--record", "--max-tokens", "4",
               "--status-out", str(status)])
    assert rc == 0
    converted = list((tmp_path / "models").glob("*.gguf"))
    assert len(converted) == 1
