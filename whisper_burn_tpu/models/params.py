"""Parameter pytree structure, stacking, and random initialization.

The whole model is a nested dict of arrays (pytree) so pjit/shard_map can
annotate shardings leaf-by-leaf. Per-layer blocks are **stacked along a
leading layer axis** and consumed with ``lax.scan`` — one traced layer
instead of 32, which keeps XLA compile times flat in depth.

Structure (D = n_state, F = ffn_dim = 4D, V = n_vocab_padded,
L = layer count; ``lin`` = quantized ``{qw, scales, b?}`` or dense
``{w, b?}``, see ops/linear.py):

    params = {
      "encoder": {
        "conv1": {"w": [D, n_mels, 3], "b": [D]},
        "conv2": {"w": [D, D, 3], "b": [D]},
        "pos": [n_audio_ctx, D],                  # sinusoidal, from ckpt
        "blocks": {                                # stacked over L
          "attn_ln": {"g": [L, D], "b": [L, D]},
          "attn_q": lin, "attn_k": lin, "attn_v": lin, "attn_o": lin,
          "mlp_ln": {"g", "b"}, "fc1": lin[D->F], "fc2": lin[F->D],
        },
        "ln_post": {"g": [D], "b": [D]},
      },
      "decoder": {
        "tok_emb": [V, D],                         # padded rows are zero
        "pos": [n_text_ctx, D],                    # learned, from ckpt
        "blocks": { ...encoder block keys...,
          "xattn_ln": {"g", "b"},
          "xattn_q": lin, "xattn_k": lin (no bias), "xattn_v": lin,
          "xattn_o": lin,
        },
        "ln": {"g": [D], "b": [D]},
      },
    }

Tensor-name mapping from GGUF lives in gguf/loader.py; the reference
assembles the same structure imperatively (src/gguf/loader.rs:284-377).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax

from whisper_burn_tpu.gguf.repack import repack_f32
from whisper_burn_tpu.models.config import WhisperConfig

Params = dict[str, Any]


def stack_layers(layers: list[Params]) -> Params:
    """Stack a list of identical per-layer pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def _rand_linear(
    rng: np.random.Generator, k: int, n: int, *, quantized: bool, bias: bool, scale: float = 0.05
) -> Params:
    w = rng.standard_normal((n, k)).astype(np.float32) * scale  # [N, K] ckpt layout
    if quantized:
        qt = repack_f32(w)
        p: Params = {"qw": qt.qw, "scales": qt.scales}
    else:
        p = {"w": np.ascontiguousarray(w.T)}
    if bias:
        p["b"] = rng.standard_normal(n).astype(np.float32) * 0.01
    return p


def _rand_ln(rng: np.random.Generator, d: int) -> Params:
    return {
        "g": 1.0 + rng.standard_normal(d).astype(np.float32) * 0.02,
        "b": rng.standard_normal(d).astype(np.float32) * 0.02,
    }


def _rand_block(
    rng: np.random.Generator, d: int, f: int, *, cross: bool, quantized: bool,
    scale: float = 0.05,
) -> Params:
    lin = lambda k, n, bias: _rand_linear(
        rng, k, n, quantized=quantized, bias=bias, scale=scale
    )
    p = {
        "attn_ln": _rand_ln(rng, d),
        "attn_q": lin(d, d, True),
        "attn_k": lin(d, d, False),
        "attn_v": lin(d, d, True),
        "attn_o": lin(d, d, True),
        "mlp_ln": _rand_ln(rng, d),
        "fc1": lin(d, f, True),
        "fc2": lin(f, d, True),
    }
    if cross:
        p.update(
            xattn_ln=_rand_ln(rng, d),
            xattn_q=lin(d, d, True),
            xattn_k=lin(d, d, False),
            xattn_v=lin(d, d, True),
            xattn_o=lin(d, d, True),
        )
    return p


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal encoder positions (for tests; real checkpoints
    ship this tensor, src/model/encoder.rs:59)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def random_params(
    cfg: WhisperConfig, seed: int = 0, *, quantized: bool = True
) -> Params:
    """Random model parameters with the real structure (test fixture)."""
    rng = np.random.default_rng(seed)
    d, f = cfg.n_audio_state, cfg.ffn_dim

    enc_blocks = [
        _rand_block(rng, d, f, cross=False, quantized=quantized)
        for _ in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _rand_block(rng, d, f, cross=True, quantized=quantized)
        for _ in range(cfg.n_text_layer)
    ]

    tok_emb = np.zeros((cfg.n_vocab_padded, d), dtype=np.float32)
    tok_emb[: cfg.n_vocab] = rng.standard_normal((cfg.n_vocab, d)).astype(np.float32) * 0.02

    return {
        "encoder": {
            "conv1": {
                "w": rng.standard_normal((d, cfg.n_mels, 3)).astype(np.float32) * 0.05,
                "b": np.zeros(d, np.float32),
            },
            "conv2": {
                "w": rng.standard_normal((d, d, 3)).astype(np.float32) * 0.02,
                "b": np.zeros(d, np.float32),
            },
            "pos": sinusoidal_positions(cfg.n_audio_ctx, d),
            "blocks": stack_layers(enc_blocks),
            "ln_post": _rand_ln(rng, d),
        },
        "decoder": {
            "tok_emb": tok_emb,
            "pos": rng.standard_normal((cfg.n_text_ctx, d)).astype(np.float32) * 0.01,
            "blocks": stack_layers(dec_blocks),
            "ln": _rand_ln(rng, d),
        },
    }


def structured_params(
    cfg: WhisperConfig, seed: int = 0, *, quantized: bool = True, v_eff: int = 64
) -> Params:
    """Accuracy-fixture params with a PEAKED logit surface (VERDICT r2 item 6).

    :func:`random_params`' i.i.d. weights at a 51k vocab produce a nearly
    flat logit surface — argmax agreement under weight quantization is
    tie-breaking noise (ACCURACY.md's unfloored ``weight_q4`` row). Two
    structural changes make the weight-quantization axis measurable:

    * block weights scale ~1/sqrt(L): the residual stream stays O(1) like
      a trained net, so Q4 error propagates additively instead of being
      amplified multiplicatively through 32 random layers;
    * the token embedding concentrates mass in the first ``v_eff`` rows
      (anchors at ~20x the tail norm): logits are peaked over an effective
      vocabulary, so only *meaningful* drift flips an argmax. ``v_eff``
      is kept SMALL (64): top-2 margins among n near-gaussian anchor
      projections shrink as n grows — at v_eff=1024 one real-dims seed
      collapsed to tie-breaking noise (0.25 agreement) while another read
      0.98 with the same logit drift.

    ``quantized`` selects the member of a matched f32/Q4 pair (same rng
    stream -> identical float weights, like :func:`random_params`).
    """
    rng = np.random.default_rng(seed)
    d, f = cfg.n_audio_state, cfg.ffn_dim
    depth = max(cfg.n_audio_layer, cfg.n_text_layer)
    scale = 0.05 / float(np.sqrt(depth))

    enc_blocks = [
        _rand_block(rng, d, f, cross=False, quantized=quantized, scale=scale)
        for _ in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _rand_block(rng, d, f, cross=True, quantized=quantized, scale=scale)
        for _ in range(cfg.n_text_layer)
    ]

    v_eff = min(v_eff, cfg.n_vocab)
    tok_emb = np.zeros((cfg.n_vocab_padded, d), dtype=np.float32)
    tok_emb[: cfg.n_vocab] = (
        rng.standard_normal((cfg.n_vocab, d)).astype(np.float32) * 0.002
    )
    # anchor rows: a clear, well-separated winner set for the logit argmax
    tok_emb[:v_eff] *= 20.0

    return {
        "encoder": {
            "conv1": {
                "w": rng.standard_normal((d, cfg.n_mels, 3)).astype(np.float32) * 0.05,
                "b": np.zeros(d, np.float32),
            },
            "conv2": {
                "w": rng.standard_normal((d, d, 3)).astype(np.float32) * 0.02,
                "b": np.zeros(d, np.float32),
            },
            "pos": sinusoidal_positions(cfg.n_audio_ctx, d),
            "blocks": stack_layers(enc_blocks),
            "ln_post": _rand_ln(rng, d),
        },
        "decoder": {
            "tok_emb": tok_emb,
            "pos": rng.standard_normal((cfg.n_text_ctx, d)).astype(np.float32) * 0.01,
            "blocks": stack_layers(dec_blocks),
            "ln": _rand_ln(rng, d),
        },
    }


def _w8_from_q4(qw: np.ndarray, scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-column int8 requant of a Q4-repacked stacked weight.

    ``qw [L, K, N] int8`` codes + ``scales [L, K/32, N]`` -> (``qw8
    [L, K, N] int8`` with per-column absmax/127 scales ``s8 [L, N]``).
    Rank-1 scales are what lets the contraction run int8 x int8 -> int32
    on the MXU with the dequant applied after (the per-32-block Q4 scales
    cannot factor out of an integer dot)."""
    L, K, N = qw.shape
    qw8 = np.empty_like(qw)
    s8 = np.empty((L, N), np.float32)
    for l in range(L):  # per layer: bounds the f32 transient to one matrix
        w = qw[l].astype(np.float32) * np.repeat(
            np.asarray(scales[l], np.float32), 32, axis=0
        )
        s8[l] = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
        qw8[l] = np.clip(np.round(w / s8[l]), -127, 127).astype(np.int8)
    return qw8, s8


def attach_w8a8(params: Params, replace: bool = True) -> Params:
    """Add int8 per-column weight copies for the large-M matmul surfaces.

    Covers every quantized encoder-block linear plus the decoder's
    cross-KV projections (the crossfill runs at M = B*1500) — the shapes
    where ops/linear routes through :func:`~whisper_burn_tpu.ops.linear.
    w8a8_matmul` when ``compute.w8a8`` is set. Decode-step matmuls
    (M = B) stay on the bandwidth-optimal Q4 Pallas path untouched.

    ``replace=True`` (the serving default) drops the Q4 codes/scales from
    the augmented tensors: these surfaces only ever run at M >= 1500 where
    the w8a8 path always serves them, so keeping both copies would cost
    ~0.73 GB of HBM for nothing (it OOM'd the B=128 headline). The net
    footprint with replace is the same as without w8a8 at all (int8 codes
    either way; the f32 group scales are even freed)."""

    def augment_blocks(blocks: Params, names) -> Params:
        out = {k: v for k, v in blocks.items()}
        for name in names:
            p = blocks.get(name)
            if p is None or "qw" not in p:
                continue
            qw8, s8 = _w8_from_q4(np.asarray(p["qw"]), np.asarray(p["scales"]))
            out[name] = {**p, "qw8": qw8, "s8": s8}
            if replace:
                out[name] = {
                    k: v for k, v in out[name].items() if k not in ("qw", "scales")
                }
        return out

    enc_names = ("attn_qkv", "attn_q", "attn_k", "attn_v", "attn_o", "fc1", "fc2")
    dec_names = ("xattn_kv", "xattn_k", "xattn_v")
    return {
        **params,
        "encoder": {
            **params["encoder"],
            "blocks": augment_blocks(params["encoder"]["blocks"], enc_names),
        },
        "decoder": {
            **params["decoder"],
            "blocks": augment_blocks(params["decoder"]["blocks"], dec_names),
        },
    }


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def _interleave_n(arrs: list[np.ndarray], tp: int) -> np.ndarray:
    """Concatenate ``[..., N]`` arrays along N, interleaved at ``tp``-shard
    granularity: output = [a0_s0 | a1_s0 | ... | a0_s1 | a1_s1 | ...] where
    ``ai_sj`` is array i's j-th N-shard. With tp=1 this is a plain concat.

    This makes fusing commute with Megatron column sharding: an equal split
    of the fused N axis into tp shards gives each shard exactly its own
    [q_shard | k_shard | v_shard] slab, so the local thirds split in
    ops/linear.qkv_proj stays correct inside shard_map bodies.
    """
    if tp == 1:
        return np.concatenate(arrs, axis=-1)
    parts = []
    for s in range(tp):
        for a in arrs:
            n = a.shape[-1]
            assert n % tp == 0, f"fused N axis {n} not divisible by tp={tp}"
            parts.append(a[..., s * n // tp : (s + 1) * n // tp])
    return np.concatenate(parts, axis=-1)


def _fuse_linears(linears: list[Params], tp: int = 1) -> Params:
    """Concatenate linears sharing an input along the output-feature axis.

    Works on stacked ``[L, K, N]`` leaves. Missing biases (Whisper's key
    projections) become zeros so the fused bias-add is exact. ``tp`` > 1
    builds the shard-interleaved layout (see :func:`_interleave_n`).
    """
    quantized = "qw" in linears[0]
    key = "qw" if quantized else "w"
    fused: Params = {key: _interleave_n([np.asarray(p[key]) for p in linears], tp)}
    if quantized:
        fused["scales"] = _interleave_n(
            [np.asarray(p["scales"]) for p in linears], tp
        )
    n_axis = [p[key].shape[-1] for p in linears]
    if any("b" in p for p in linears):
        biases = []
        for p, n in zip(linears, n_axis):
            if "b" in p:
                biases.append(np.asarray(p["b"]))
            else:
                shape = p[key].shape[:-2] + (n,)  # [L?, N]
                biases.append(np.zeros(shape, np.float32))
        fused["b"] = _interleave_n(biases, tp)
    return fused


def fuse_attention_params(params: Params, tp: int = 1) -> Params:
    """Fuse q/k/v (and cross k/v) projections into single wide matmuls.

    On this hardware a matmul has a large fixed cost at Whisper's N=1280
    (~4 ms regardless of N up to 5120), so one [K, 3D] projection runs ~3x
    faster than three [K, D] ones. The model code dispatches on the fused
    key names (``attn_qkv``, ``xattn_kv``).

    ``tp``: tensor-parallel degree. With tp > 1 the fused N axis is built
    shard-interleaved so an equal model-axis split lands each shard its own
    contiguous [q|k|v] slab — REQUIRED for (and only meaningful with) the
    shard_map path in parallel/sharded.py; such params are wrong to use
    unsharded.
    """
    out = {k: v for k, v in params.items()}

    def fuse_blocks(blocks: Params, cross: bool) -> Params:
        nb = {k: v for k, v in blocks.items()}
        nb["attn_qkv"] = _fuse_linears(
            [blocks["attn_q"], blocks["attn_k"], blocks["attn_v"]], tp
        )
        for k in ("attn_q", "attn_k", "attn_v"):
            del nb[k]
        if cross:
            nb["xattn_kv"] = _fuse_linears([blocks["xattn_k"], blocks["xattn_v"]], tp)
            del nb["xattn_k"], nb["xattn_v"]
        return nb

    out["encoder"] = {**params["encoder"], "blocks": fuse_blocks(params["encoder"]["blocks"], False)}
    out["decoder"] = {**params["decoder"], "blocks": fuse_blocks(params["decoder"]["blocks"], True)}
    return out


def _fab_linear(rng: np.random.Generator, k: int, n: int, *, bias: bool) -> Params:
    """Fabricate a quantized linear directly (int8 codes + f16-exact scales)
    without the float quantize round-trip — distributionally equivalent for
    benchmarking, ~100x faster to build at Large-V3 scale."""
    # nibble codes via raw bytes (rng.integers is ~10x slower at this scale)
    raw = np.frombuffer(rng.bytes(k * n), dtype=np.uint8)
    qw = ((raw & 0x0F).astype(np.int8) - 8).reshape(k, n)
    scales = (
        (rng.uniform(0.5, 1.5, size=(k // 32, n)) * (0.05 / 7))
        .astype(np.float16)
        .astype(np.float32)
    )
    p: Params = {"qw": qw, "scales": scales}
    if bias:
        p["b"] = rng.standard_normal(n).astype(np.float32) * 0.01
    return p


def fabricated_quantized_params(cfg: WhisperConfig, seed: int = 0) -> Params:
    """Large-model benchmark fixture: same structure/dtypes/shapes as a real
    Q4_0 checkpoint, fabricated directly (no quantize pass)."""
    rng = np.random.default_rng(seed)
    d, f = cfg.n_audio_state, cfg.ffn_dim

    def block(cross: bool) -> Params:
        p = {
            "attn_ln": _rand_ln(rng, d),
            "attn_q": _fab_linear(rng, d, d, bias=True),
            "attn_k": _fab_linear(rng, d, d, bias=False),
            "attn_v": _fab_linear(rng, d, d, bias=True),
            "attn_o": _fab_linear(rng, d, d, bias=True),
            "mlp_ln": _rand_ln(rng, d),
            "fc1": _fab_linear(rng, d, f, bias=True),
            "fc2": _fab_linear(rng, f, d, bias=True),
        }
        if cross:
            p.update(
                xattn_ln=_rand_ln(rng, d),
                xattn_q=_fab_linear(rng, d, d, bias=True),
                xattn_k=_fab_linear(rng, d, d, bias=False),
                xattn_v=_fab_linear(rng, d, d, bias=True),
                xattn_o=_fab_linear(rng, d, d, bias=True),
            )
        return p

    tok_emb = np.zeros((cfg.n_vocab_padded, d), dtype=np.float32)
    tok_emb[: cfg.n_vocab] = (
        rng.standard_normal((cfg.n_vocab, d)).astype(np.float32) * 0.02
    )
    return {
        "encoder": {
            "conv1": {
                "w": rng.standard_normal((d, cfg.n_mels, 3)).astype(np.float32) * 0.05,
                "b": np.zeros(d, np.float32),
            },
            "conv2": {
                "w": rng.standard_normal((d, d, 3)).astype(np.float32) * 0.02,
                "b": np.zeros(d, np.float32),
            },
            "pos": sinusoidal_positions(cfg.n_audio_ctx, d),
            "blocks": stack_layers([block(False) for _ in range(cfg.n_audio_layer)]),
            "ln_post": _rand_ln(rng, d),
        },
        "decoder": {
            "tok_emb": tok_emb,
            "pos": rng.standard_normal((cfg.n_text_ctx, d)).astype(np.float32) * 0.01,
            "blocks": stack_layers([block(True) for _ in range(cfg.n_text_layer)]),
            "ln": _rand_ln(rng, d),
        },
    }
