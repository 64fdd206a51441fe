"""whisper_burn_tpu — a TPU-native Whisper inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference `whisper-burn` Rust/wgpu stack (/root/reference): Q4_0 GGUF
checkpoint loading, the full Whisper encoder/decoder with KV-cached greedy
decoding, the mel-spectrogram audio frontend, and a transcription pipeline —
engineered TPU-first:

- fixed shapes everywhere; the whole decode loop is a single compiled
  ``lax.while_loop`` with a preallocated, donated KV cache and on-device
  argmax (the reference syncs GPU->CPU every token,
  reference: src/model/decoder.rs:294-295,346-347 — the latency sin this
  design removes),
- Q4_0 weights repacked at load time into MXU-friendly ``int8[K, N]`` +
  per-block scales, consumed by a fused Pallas dequant-matmul kernel,
- batching and scale-out via ``jax.sharding`` meshes (data-parallel
  utterances, optional tensor-parallel weights) instead of host threads.

Layer map (mirrors SURVEY.md §1, all TPU-native):
  L0  XLA:TPU + Pallas/Mosaic        (replaces the vendored cubecl-wgpu runtime)
  L1  ops/ + gguf/                   (quantized tensors + fused kernels)
  L2  models/                        (Whisper architecture)
  L3  audio/ + tokenizer + pipeline  (audio -> text orchestration)
  L4  cli                            (batch/serving entry points; the egui
                                      desktop app is out of scope per BASELINE)
"""

from whisper_burn_tpu.languages import ALL_LANGUAGES, Language, language_from_code

__version__ = "0.1.0"

__all__ = [
    "ALL_LANGUAGES",
    "Language",
    "language_from_code",
    "__version__",
]
