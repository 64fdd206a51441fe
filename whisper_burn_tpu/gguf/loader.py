"""GGUF -> model-params pytree loader.

Counterpart of the reference's ``load_whisper_from_gguf``
(src/gguf/loader.rs:26-46): walks the GGUF tensor-name convention
(``encoder.blocks.{i}.attn.query.weight`` etc., established by the
converter) and assembles the params structure documented in
models/params.py. Q4_0 tensors are repacked for TPU (gguf/repack.py);
F32/F16 weights are transposed to ``[K, N]`` apply layout; biases are
optional per-tensor (src/gguf/loader.rs:137-145).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from whisper_burn_tpu.gguf.reader import GgmlDtype, GgufReader
from whisper_burn_tpu.gguf.repack import repack_q4_0
from whisper_burn_tpu.models.config import WhisperConfig
from whisper_burn_tpu.models.params import Params, stack_layers


@dataclass
class LoadedModel:
    config: WhisperConfig
    params: Params  # numpy leaves; jit/device_put moves them


def _linear(r: GgufReader, prefix: str) -> Params:
    """Load ``{prefix}.weight`` (+ optional ``.bias``) as a linear param dict.

    Q4_0 -> repacked int8+scales; F32/F16 -> dense ``w: [K, N]``
    (checkpoint stores ``[N, K]``, src/gguf/loader.rs:126-130).
    """
    info = r.tensor_info(f"{prefix}.weight")
    n_out, k_in = info.shape
    if info.dtype is GgmlDtype.Q4_0:
        qt = repack_q4_0(r.tensor_data(info.name), n_out, k_in)
        p: Params = {"qw": qt.qw, "scales": qt.scales}
    else:
        p = {"w": np.ascontiguousarray(r.tensor_f32(info.name).T)}
    bias_name = f"{prefix}.bias"
    if bias_name in r.tensors:
        p["b"] = r.tensor_f32(bias_name)
    return p


def _ln(r: GgufReader, prefix: str) -> Params:
    return {"g": r.tensor_f32(f"{prefix}.weight"), "b": r.tensor_f32(f"{prefix}.bias")}


def _attn(r: GgufReader, prefix: str, tag: str) -> Params:
    return {
        f"{tag}_q": _linear(r, f"{prefix}.query"),
        f"{tag}_k": _linear(r, f"{prefix}.key"),
        f"{tag}_v": _linear(r, f"{prefix}.value"),
        f"{tag}_o": _linear(r, f"{prefix}.out"),
    }


def _block(r: GgufReader, prefix: str, cross: bool) -> Params:
    p: Params = {
        "attn_ln": _ln(r, f"{prefix}.attn_ln"),
        **_attn(r, f"{prefix}.attn", "attn"),
        "mlp_ln": _ln(r, f"{prefix}.mlp_ln"),
        "fc1": _linear(r, f"{prefix}.mlp.0"),
        "fc2": _linear(r, f"{prefix}.mlp.2"),
    }
    if cross:
        p["xattn_ln"] = _ln(r, f"{prefix}.cross_attn_ln")
        p.update(_attn(r, f"{prefix}.cross_attn", "xattn"))
    return p


def _count_blocks(r: GgufReader, side: str) -> int:
    n = 0
    while f"{side}.blocks.{n}.attn_ln.weight" in r.tensors:
        n += 1
    return n


def infer_config(r: GgufReader) -> WhisperConfig:
    """Derive the architecture from tensor shapes + optional metadata.

    The reference hardcodes presets selected by filename
    (src/native/app.rs:60-63); shape inference covers any Whisper variant
    in one path (head_dim is 64 across the family,
    src/model/attention.rs:30).
    """
    tok = r.tensor_info("decoder.token_embedding.weight")
    n_vocab, d = tok.shape
    n_mels = r.tensor_info("encoder.conv1.weight").shape[1]
    n_audio_ctx = r.tensor_info("encoder.positional_embedding").shape[0]
    n_text_ctx = r.tensor_info("decoder.positional_embedding").shape[0]
    meta = r.metadata
    n_lang = int(meta.get("whisper.n_lang", 100 if n_mels >= 128 else 99))
    return WhisperConfig(
        n_mels=n_mels,
        n_audio_ctx=n_audio_ctx,
        n_audio_state=d,
        n_audio_head=d // 64,
        n_audio_layer=int(meta.get("whisper.encoder.layer_count", 0)) or _count_blocks(r, "encoder"),
        n_text_ctx=n_text_ctx,
        n_text_state=d,
        n_text_head=d // 64,
        n_text_layer=int(meta.get("whisper.decoder.layer_count", 0)) or _count_blocks(r, "decoder"),
        n_vocab=n_vocab,
        n_lang=n_lang,
    )


def load_whisper_from_gguf(source: str | Path | bytes) -> LoadedModel:
    """Parse a GGUF checkpoint into (config, params).

    ``source``: file path or in-memory GGUF bytes.
    """
    r = GgufReader.from_bytes(source) if isinstance(source, bytes) else GgufReader.open(source)
    cfg = infer_config(r)

    enc_blocks = [_block(r, f"encoder.blocks.{i}", cross=False) for i in range(cfg.n_audio_layer)]
    dec_blocks = [_block(r, f"decoder.blocks.{i}", cross=True) for i in range(cfg.n_text_layer)]

    tok_emb = r.tensor_f32("decoder.token_embedding.weight")
    padded = np.zeros((cfg.n_vocab_padded, cfg.n_text_state), np.float32)
    padded[: cfg.n_vocab] = tok_emb

    params: Params = {
        "encoder": {
            "conv1": {
                "w": r.tensor_f32("encoder.conv1.weight"),
                "b": r.tensor_f32("encoder.conv1.bias"),
            },
            "conv2": {
                "w": r.tensor_f32("encoder.conv2.weight"),
                "b": r.tensor_f32("encoder.conv2.bias"),
            },
            "pos": r.tensor_f32("encoder.positional_embedding"),
            "blocks": stack_layers(enc_blocks),
            "ln_post": _ln(r, "encoder.ln_post"),
        },
        "decoder": {
            "tok_emb": padded,
            "pos": r.tensor_f32("decoder.positional_embedding"),
            "blocks": stack_layers(dec_blocks),
            "ln": _ln(r, "decoder.ln"),
        },
    }
    return LoadedModel(config=cfg, params=params)
