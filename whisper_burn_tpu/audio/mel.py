"""Log-mel spectrogram frontend as a jit-able, batched JAX transform.

Numerical contract (reference: src/audio/mel.rs, SURVEY §2.6.3):

* 16 kHz audio, ``n_fft=400``, ``hop=160``, periodic Hann window (:316-321)
* reflect padding of ``n_fft/2`` samples per side — torch ``center=True``
  semantics (:179-193)
* power spectrum -> Slaney-scale triangular mel filterbank (:244-313)
* Whisper log-normalization: ``log10`` floored at 1e-10, clamp to the
  per-utterance ``max - 8``, then ``(x + 4) / 4`` (:126-157)
* ``n_frames = (len + 2*pad - n_fft) / hop`` — 3000 frames for 30 s
  (:167-171), i.e. the last torch-STFT frame is dropped

TPU-first design: instead of a scalar FFT loop per frame (the reference's
rustfft path, :196-227), the STFT is a framed **matmul against
window-folded DFT bases** — ``re = frames @ (diag(w) C)``,
``im = frames @ (diag(w) S)`` — which XLA tiles straight onto the MXU and
fuses with the mel projection. The whole frontend is one compiled program,
batched over utterances.

Note on ``norm``: the reference builds the filterbank with **no area
normalization** (src/audio/mel.rs:308-309) while OpenAI Whisper's shipped
``mel_filters.npz`` uses librosa's default ``norm='slaney'``. Both are
supported; ``norm="slaney"`` is the default since that is what the actual
Whisper checkpoints were trained with (and what WER parity on LibriSpeech
requires); pass ``norm=None`` for bit-parity with the reference's own
frontend.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

WHISPER_SAMPLE_RATE = 16_000
WHISPER_N_FFT = 400
WHISPER_HOP = 160
WHISPER_CHUNK_SAMPLES = 480_000  # 30 s (src/transcribe.rs:21)
WHISPER_MEL_FRAMES = 3000  # src/transcribe.rs:24


def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney/O'Shaughnessy Hz->mel (src/audio/mel.rs:244-255)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f < min_log_hz, f / f_sp, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep)


def mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    """Slaney/O'Shaughnessy mel->Hz (src/audio/mel.rs:257-269)."""
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m < min_log_mel, m * f_sp, min_log_hz * np.exp(logstep * (m - min_log_mel)))


def mel_filterbank(
    sample_rate: int = WHISPER_SAMPLE_RATE,
    n_fft: int = WHISPER_N_FFT,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular Slaney-scale mel filterbank ``[n_freqs, n_mels]``.

    Matches the reference construction (src/audio/mel.rs:272-313) for
    ``norm=None`` and librosa/OpenAI-Whisper for ``norm='slaney'``.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)  # [n_mels + 2]
    fft_freqs = np.arange(n_freqs, dtype=np.float64) * sample_rate / n_fft

    lower = hz_pts[:-2][None, :]  # [1, n_mels]
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = fft_freqs[:, None]  # [n_freqs, 1]

    up_slope = (f - lower) / np.maximum(center - lower, 1e-30)
    down_slope = (upper - f) / np.maximum(upper - center, 1e-30)
    fb = np.maximum(0.0, np.minimum(up_slope, down_slope))

    if norm == "slaney":
        # area-normalize each triangle to unit "energy" (librosa enorm)
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown mel norm {norm!r}")
    return fb.astype(np.float32)  # [n_freqs, n_mels]


def hann_window(length: int = WHISPER_N_FFT) -> np.ndarray:
    """Periodic Hann window (torch default; src/audio/mel.rs:316-321)."""
    i = np.arange(length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / length))).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis matrices ``C, S: [n_fft, n_freqs]`` such that
    ``rfft(x)[k] = x @ C[:, k] - 1j * (x @ S[:, k])``."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang), np.sin(ang)


def pad_or_trim(samples: np.ndarray, length: int = WHISPER_CHUNK_SAMPLES) -> np.ndarray:
    """Zero-pad or truncate the trailing axis to ``length``
    (src/transcribe.rs:46-52)."""
    n = samples.shape[-1]
    if n == length:
        return samples
    if n > length:
        return samples[..., :length]
    pad = [(0, 0)] * (samples.ndim - 1) + [(0, length - n)]
    return np.pad(samples, pad)


class MelFrontend:
    """Batched Whisper log-mel transform: ``[B, n_samples] -> [B, n_mels, n_frames]``.

    Precomputes window-folded DFT bases and the mel filterbank on the host;
    ``__call__`` is pure jnp and can sit inside an outer ``jax.jit`` (the
    pipeline jits it together with the encoder).
    """

    def __init__(
        self,
        n_mels: int = 128,
        norm: str | None = "slaney",
        sample_rate: int = WHISPER_SAMPLE_RATE,
        n_fft: int = WHISPER_N_FFT,
        hop_length: int = WHISPER_HOP,
        dtype: jnp.dtype = jnp.float32,
    ):
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.sample_rate = sample_rate

        window = hann_window(n_fft).astype(np.float64)
        cos_b, sin_b = _dft_bases(n_fft)
        # fold the analysis window into the DFT bases: (x*w) @ C == x @ (wC)
        self._cos = jnp.asarray(window[:, None] * cos_b, dtype=dtype)
        self._sin = jnp.asarray(window[:, None] * sin_b, dtype=dtype)
        self._mel_fb = jnp.asarray(
            mel_filterbank(sample_rate, n_fft, n_mels, norm=norm), dtype=dtype
        )

    def num_frames(self, n_samples: int) -> int:
        """(padded_len - n_fft) / hop (src/audio/mel.rs:167-171)."""
        return (n_samples + 2 * (self.n_fft // 2) - self.n_fft) // self.hop_length

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Compute the normalized log-mel spectrogram.

        ``audio``: float ``[B, n]`` (or ``[n]``) at 16 kHz.
        Returns ``[B, n_mels, n_frames]`` (``[n_mels, n_frames]`` if unbatched),
        already transposed to the model's input layout (src/transcribe.rs:66-71).
        """
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        n = audio.shape[-1]
        pad = self.n_fft // 2
        n_frames = self.num_frames(n)

        x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        starts = np.arange(n_frames) * self.hop_length
        idx = starts[:, None] + np.arange(self.n_fft)[None, :]  # [F, n_fft]
        frames = x[:, idx]  # [B, F, n_fft]

        # Precision.HIGHEST: on TPU the default f32 matmul runs single-pass
        # bf16 on the MXU (~1e-2 relative error), which is visible after
        # log10 at low-energy cells; the frontend is parity-critical and
        # tiny relative to the encoder, so force full f32 accuracy.
        dot = functools.partial(
            jnp.matmul, precision=jax.lax.Precision.HIGHEST
        )
        re = dot(frames, self._cos)  # [B, F, n_freqs]
        im = dot(frames, self._sin)
        power = re * re + im * im
        mel = dot(power, self._mel_fb)  # [B, F, n_mels]

        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        log_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)  # per utterance
        log_spec = jnp.maximum(log_spec, log_max - 8.0)
        out = (log_spec + 4.0) / 4.0
        out = jnp.swapaxes(out, 1, 2)  # [B, n_mels, F]
        return out[0] if squeeze else out
