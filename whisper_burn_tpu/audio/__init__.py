"""Audio frontend: WAV I/O, resampling, and the log-mel spectrogram.

TPU-native counterpart of the reference's src/audio/ (io.rs, resample.rs,
mel.rs). I/O and resampling are host-side numpy/scipy; the mel transform is
a jit-able JAX function built on framed matmuls so the whole frontend can
run on-device and batch across utterances.
"""

from whisper_burn_tpu.audio.io import AudioBuffer, load_wav, save_wav
from whisper_burn_tpu.audio.mel import MelFrontend
from whisper_burn_tpu.audio.resample import resample, resample_to_16k

__all__ = [
    "AudioBuffer",
    "load_wav",
    "save_wav",
    "resample",
    "resample_to_16k",
    "MelFrontend",
]
