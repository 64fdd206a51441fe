"""Native C++ host library vs the pure-Python oracles.

Builds native/libwhisper_host.so on demand (g++ is part of the image);
skips if the toolchain is unavailable.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module")
def native():
    if not (NATIVE_DIR / "libwhisper_host.so").exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("native toolchain unavailable")
    from whisper_burn_tpu import native_host

    if not native_host.available():
        pytest.skip("native library failed to load")
    return native_host


def test_repack_bit_exact(native):
    from whisper_burn_tpu.gguf.quant import quantize_q4_0, unpack_q4_0

    rng = np.random.default_rng(0)
    n_out, k_in = 96, 160
    w = rng.standard_normal((n_out, k_in)).astype(np.float32)
    raw = quantize_q4_0(w)
    qw, sc = native.repack_q4_0(raw, n_out, k_in)

    q, d = unpack_q4_0(raw, n_out * k_in)
    np.testing.assert_array_equal(qw, q.reshape(n_out, k_in).T)
    np.testing.assert_array_equal(sc, d.reshape(n_out, k_in // 32).T)


def test_wav_matches_python(native, tmp_path):
    import os

    from whisper_burn_tpu.audio.io import AudioBuffer, save_wav

    rng = np.random.default_rng(1)
    samples = (rng.standard_normal(3200) * 0.4).astype(np.float32)
    p = tmp_path / "x.wav"
    save_wav(p, AudioBuffer(samples, 16000))

    out, rate = native.load_wav(p)
    assert rate == 16000
    # python stdlib path as oracle (force-fallback)
    os.environ["WHISPER_TPU_NATIVE"] = "0"
    try:
        import importlib

        import whisper_burn_tpu.native_host as nh

        nh._lib = None
        from whisper_burn_tpu.audio.io import load_wav

        ref = load_wav(p)
    finally:
        os.environ.pop("WHISPER_TPU_NATIVE")
        nh._lib = None
    np.testing.assert_allclose(out, ref.samples, atol=1e-7)


def test_wav_test_fixture(native):
    out, rate = native.load_wav("/root/reference/test.wav")
    assert rate == 16000 and len(out) == 30720


def test_resample_close_to_scipy(native):
    from scipy.signal import resample_poly as sp

    t = np.arange(44100) / 44100
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    ours = native.resample_poly(tone, 160, 441)
    theirs = sp(tone.astype(np.float64), 160, 441)
    n = min(len(ours), len(theirs))
    assert np.abs(ours[:n] - theirs[:n]).max() < 2e-3


def test_repack_rejects_bad_k(native):
    assert native.repack_q4_0(b"\x00" * 18, 1, 33) is None


def test_load_batch_parallel_feeder(native, tmp_path):
    """wh_load_batch: N files decoded + resampled + framed in parallel ==
    the per-file Python path (load_wav -> resample_to_16k -> pad_or_trim)."""
    from whisper_burn_tpu.audio.io import AudioBuffer, load_wav, save_wav
    from whisper_burn_tpu.audio.mel import pad_or_trim
    from whisper_burn_tpu.audio.resample import resample_to_16k

    rng = np.random.default_rng(7)
    paths, rates, lengths = [], [16000, 8000, 22050], [12000, 5000, 40000]
    for i, (rate, n) in enumerate(zip(rates, lengths)):
        samples = (rng.standard_normal(n) * 0.3).astype(np.float32)
        p = tmp_path / f"a{i}.wav"
        save_wav(p, AudioBuffer(samples=samples, sample_rate=rate))
        paths.append(p)

    target = 16000
    out = native.load_batch(paths, target)
    assert out is not None, "library missing wh_load_batch (rebuild native/)"
    batch, statuses, lengths = out
    assert batch.shape == (3, target)
    np.testing.assert_array_equal(statuses, 0)
    # true pre-framing 16 kHz lengths: 12000@16k, 5000@8k -> 10000, 40000@22050 -> ~29025
    assert lengths[0] == 12000 and lengths[1] == 10000
    assert abs(lengths[2] - 40000 * 16000 // 22050) <= 2

    for i, p in enumerate(paths):
        audio = load_wav(p)
        if audio.sample_rate != 16000:
            audio = resample_to_16k(audio)
        expect = pad_or_trim(audio.samples, target)
        # save_wav writes 16-bit PCM; both paths decode the same ints, so
        # agreement is tight (resampler designs are scipy-identical)
        np.testing.assert_allclose(batch[i], expect, atol=2e-4)

    # missing file -> nonzero per-file status, others unaffected
    batch2, statuses2, _ = native.load_batch([paths[0], tmp_path / "nope.wav"], target)
    assert statuses2[0] == 0 and statuses2[1] != 0
