"""Audio frontend tests against independent oracles.

The reference ships no audio tests; per SURVEY §4 we extend coverage here:
torch.stft is the STFT oracle and transformers' WhisperFeatureExtractor is
the end-to-end log-mel oracle (both offline-capable).
"""

import numpy as np
import pytest

from whisper_burn_tpu.audio import AudioBuffer, load_wav, resample, save_wav
from whisper_burn_tpu.audio.mel import (
    WHISPER_CHUNK_SAMPLES,
    MelFrontend,
    hann_window,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    pad_or_trim,
)

TEST_WAV = "/root/reference/test.wav"


def test_hann_window_periodic():
    import torch

    w = hann_window(400)
    torch_w = torch.hann_window(400, periodic=True).numpy()
    np.testing.assert_allclose(w, torch_w, atol=1e-6)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 100.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    # Slaney constants: 1000 Hz -> mel 15.0
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-9)


def test_stft_power_matches_torch():
    """Framed-matmul DFT == torch.stft(center=True, reflect, periodic hann),
    with the last frame dropped (src/audio/mel.rs:199)."""
    import torch

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.5

    fe = MelFrontend(n_mels=80)
    x = np.pad(audio, 200, mode="reflect")
    starts = np.arange(fe.num_frames(len(audio))) * 160
    frames = x[starts[:, None] + np.arange(400)[None, :]]
    re = frames @ np.asarray(fe._cos)
    im = frames @ np.asarray(fe._sin)
    power = re**2 + im**2  # [F, 201]

    t = torch.stft(
        torch.from_numpy(audio),
        n_fft=400,
        hop_length=160,
        window=torch.hann_window(400, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    t_power = t.abs().pow(2).numpy().T[:-1]  # drop last frame
    assert power.shape == t_power.shape
    np.testing.assert_allclose(power, t_power, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_slaney_filterbank_matches_transformers(n_mels):
    from transformers import WhisperFeatureExtractor

    fx = WhisperFeatureExtractor(feature_size=n_mels)
    ours = mel_filterbank(n_mels=n_mels, norm="slaney")
    np.testing.assert_allclose(ours, fx.mel_filters, atol=2e-7)


def test_none_norm_filterbank_matches_reference_formulas():
    """norm=None triangles == a direct port of the reference's loop
    (src/audio/mel.rs:272-313)."""
    n_fft, n_mels, sr, fmax = 400, 16, 16000, 8000.0
    n_freqs = n_fft // 2 + 1
    mel_pts = np.linspace(0.0, float(hz_to_mel(fmax)), n_mels + 2)
    hz = np.array([float(mel_to_hz(m)) for m in mel_pts])
    freqs = np.arange(n_freqs) * sr / n_fft
    ref = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, c, up = hz[i], hz[i + 1], hz[i + 2]
        for j, f in enumerate(freqs):
            if lo <= f <= c and c > lo:
                ref[i, j] = (f - lo) / (c - lo)
            elif c < f <= up and up > c:
                ref[i, j] = (up - f) / (up - c)
    ours = mel_filterbank(n_fft=n_fft, n_mels=n_mels, norm=None)
    np.testing.assert_allclose(ours, ref.T, atol=1e-6)


def test_log_mel_matches_whisper_feature_extractor():
    """End-to-end parity with HF WhisperFeatureExtractor (the canonical
    OpenAI-Whisper frontend) on a 30 s padded utterance."""
    from transformers import WhisperFeatureExtractor

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(30720) * 0.2).astype(np.float32)
    padded = pad_or_trim(audio)
    assert padded.shape == (WHISPER_CHUNK_SAMPLES,)

    fe = MelFrontend(n_mels=80, norm="slaney")
    ours = np.asarray(fe(padded))
    assert ours.shape == (80, 3000)

    fx = WhisperFeatureExtractor(feature_size=80)
    theirs = fx(audio, sampling_rate=16000, return_tensors="np")["input_features"][0]
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_mel_on_test_wav():
    """The parity fixture: mono 16 kHz, 30720 samples, 1.92 s
    (SURVEY §2.5 test asset)."""
    from transformers import WhisperFeatureExtractor

    buf = load_wav(TEST_WAV)
    assert buf.sample_rate == 16000
    assert len(buf.samples) == 30720
    assert abs(buf.duration_s - 1.92) < 1e-6

    fe = MelFrontend(n_mels=128, norm="slaney")
    ours = np.asarray(fe(pad_or_trim(buf.samples)))
    fx = WhisperFeatureExtractor(feature_size=128)
    theirs = fx(buf.samples, sampling_rate=16000, return_tensors="np")["input_features"][0]
    assert ours.shape == theirs.shape == (128, 3000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_mel_batched_per_utterance_clamp():
    """The max-8 clamp is per utterance, not per batch."""
    rng = np.random.default_rng(2)
    quiet = (rng.standard_normal(WHISPER_CHUNK_SAMPLES) * 1e-4).astype(np.float32)
    loud = (rng.standard_normal(WHISPER_CHUNK_SAMPLES) * 0.9).astype(np.float32)
    fe = MelFrontend(n_mels=80)
    batched = np.asarray(fe(np.stack([quiet, loud])))
    solo_quiet = np.asarray(fe(quiet))
    solo_loud = np.asarray(fe(loud))
    np.testing.assert_allclose(batched[0], solo_quiet, atol=1e-6)
    np.testing.assert_allclose(batched[1], solo_loud, atol=1e-6)


def test_num_frames_property():
    fe = MelFrontend(n_mels=80)
    assert fe.num_frames(WHISPER_CHUNK_SAMPLES) == 3000
    assert fe.num_frames(16000) == 100
    # general: floor(n / hop)
    for n in [400, 401, 1000, 31999]:
        assert fe.num_frames(n) == n // 160


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal(1600) * 0.5).astype(np.float32)
    buf = AudioBuffer(samples=samples, sample_rate=16000)
    p = tmp_path / "x.wav"
    save_wav(p, buf)
    loaded = load_wav(p)
    assert loaded.sample_rate == 16000
    # round-to-nearest on save, /32768 on load -> worst case ~1.5 LSB;
    # out-of-range samples are clamped on save (src/audio/io.rs:117-137)
    np.testing.assert_allclose(
        loaded.samples, np.clip(samples, -1.0, 1.0), atol=1.5 / 32768
    )


def test_wav_stereo_downmix(tmp_path):
    import wave

    left = np.full(100, 0.5, dtype=np.float32)
    right = np.full(100, -0.25, dtype=np.float32)
    inter = np.empty(200, dtype="<i2")
    inter[0::2] = (left * 32767).astype("<i2")
    inter[1::2] = (right * 32767).astype("<i2")
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(inter.tobytes())
    buf = load_wav(p)
    assert buf.sample_rate == 44100
    np.testing.assert_allclose(buf.samples, np.full(100, 0.125), atol=1e-3)


def test_resample_preserves_tone():
    """A 440 Hz tone resampled 44.1k -> 16k keeps its frequency."""
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = resample(AudioBuffer(tone, sr_in), 16000)
    assert out.sample_rate == 16000
    assert abs(len(out.samples) - 16000) <= 2
    spec = np.abs(np.fft.rfft(out.samples[:16000]))
    peak_hz = np.argmax(spec) * 16000 / 16000
    assert abs(peak_hz - 440.0) < 2.0
