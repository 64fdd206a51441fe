"""Sharded transcription: the fast (Pallas) path under a (data, model) mesh.

The GSPMD route (jit + in_shardings, tests/test_sharding.py) lets XLA
partition the XLA-backend graph, but it cannot see through ``pallas_call``:
with model-sharded heads it would all-gather around every kernel launch —
destroying the TP win — or fail to partition outright. This module instead
wraps the whole decode in ``jax.shard_map`` so every kernel sees *local*
per-shard shapes:

* the utterance batch splits over the ``data`` axis (pure DP — zero
  decode-time communication, SURVEY §2.3);
* attention heads and the FFN hidden axis split over the ``model`` axis
  (Megatron layout, parallel/sharding.py): q/k/v/fc1 are column-parallel
  (local outputs), attn_o/xattn_o/fc2 row-parallel — the model code inserts
  one psum per projection via ``ops.linear.apply_reduce_linear`` when
  ``compute.tp_axis`` is set, riding ICI exactly like the GSPMD-inserted
  collectives would;
* the KV caches are head-sharded ([L, B/data, T, D/model]) — per-chip HBM
  decode traffic drops by the model-axis size;
* logits are computed from the replicated residual stream against the
  replicated tied embedding, so argmax/top-k and the stop logic run
  identically on every model shard (no gather needed).

The reference has no distributed anything (SURVEY §2.3) — this is the
framework's scale-out surface, with the per-shard compute served by the
same Pallas kernels as single-chip serving.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_burn_tpu.models.beam import beam_decode
from whisper_burn_tpu.models.config import MAX_TOKENS, WhisperConfig
from whisper_burn_tpu.models.params import Params
from whisper_burn_tpu.models.whisper import greedy_decode
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.parallel.sharding import param_pspecs, param_shardings


def _tp_compute(compute: Compute, mesh: Mesh) -> Compute:
    tp = mesh.shape.get("model", 1)
    return compute.replace(tp=tp, tp_axis="model" if tp > 1 else None)


def validate_tp(cfg: WhisperConfig, mesh: Mesh) -> int:
    """The model axis must divide the head counts (Megatron head sharding)
    and every quantized K-shard must stay 32-block aligned."""
    tp = mesh.shape.get("model", 1)
    if tp == 1:
        return tp
    for name, heads in (("audio", cfg.n_audio_head), ("text", cfg.n_text_head)):
        if heads % tp:
            raise ValueError(
                f"model axis {tp} does not divide n_{name}_head={heads}"
            )
    for name, k in (("state", cfg.n_audio_state), ("ffn", cfg.ffn_dim)):
        if (k // tp) % 32:
            raise ValueError(
                f"model axis {tp} breaks Q4 32-block alignment of {name}={k}"
            )
    return tp


def shard_params_tp(params: Params, mesh: Mesh) -> Params:
    """Place params on the mesh per parallel/sharding.py specs. Fused
    params (attn_qkv/xattn_kv) must have been built shard-interleaved
    (``fuse_attention_params(tp=mesh model size)``)."""
    return jax.device_put(params, param_shardings(params, mesh))


def sharded_greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    mel,
    lang_tokens,
    compute: Compute,
    mesh: Mesh,
    *,
    detect: bool = False,
    max_tokens: int = MAX_TOKENS,
    task: str = "transcribe",
    debug_replication: bool = False,
):
    """DP x TP greedy decode. ``mel: [B, n_mels, T]`` with B divisible by
    the data axis; params laid out per :func:`shard_params_tp`.

    Returns a :class:`~whisper_burn_tpu.models.whisper.GreedyResult` whose
    arrays are batch-sharded over ``data`` (replicated over ``model``).

    ``debug_replication=True`` verifies the model-axis replication claim
    in-graph (parallel/guard.py) and raises :class:`ReplicationError` if
    any output leaf diverges across model shards — the loud failure mode
    for a dropped psum that ``check_vma=False`` would otherwise hide.
    """
    fn = _build(
        cfg, compute, mesh,
        beam_width=1, detect=detect, max_tokens=max_tokens, task=task,
        length_penalty=1.0, debug_replication=debug_replication,
    )
    return _run_guarded(fn, params, mel, lang_tokens, debug_replication)


def sharded_beam_decode(
    params: Params,
    cfg: WhisperConfig,
    mel,
    lang_tokens,
    compute: Compute,
    mesh: Mesh,
    *,
    beam_width: int = 5,
    detect: bool = False,
    max_tokens: int = MAX_TOKENS,
    length_penalty: float = 1.0,
    task: str = "transcribe",
    debug_replication: bool = False,
):
    """DP x TP beam decode — beams stay colocated with their utterance's
    data shard, so hypothesis reordering is shard-local (models/beam.py)."""
    fn = _build(
        cfg, compute, mesh,
        beam_width=beam_width, detect=detect, max_tokens=max_tokens,
        task=task, length_penalty=length_penalty,
        debug_replication=debug_replication,
    )
    return _run_guarded(fn, params, mel, lang_tokens, debug_replication)


def _run_guarded(fn, params, mel, lang_tokens, debug_replication: bool):
    if not debug_replication:
        return fn(params, mel, lang_tokens)
    from whisper_burn_tpu.parallel.guard import ReplicationError

    result, mismatch = fn(params, mel, lang_tokens)
    if int(mismatch):
        raise ReplicationError(
            f"shard_map outputs diverged across model shards: {int(mismatch)} "
            "mismatching elements (a row-parallel psum is missing or broken)"
        )
    return result


@functools.lru_cache(maxsize=32)
def _build(
    cfg: WhisperConfig,
    compute: Compute,
    mesh: Mesh,
    *,
    beam_width: int,
    detect: bool,
    max_tokens: int,
    task: str,
    length_penalty: float,
    debug_replication: bool = False,
):
    """Compiled shard_map decode program (cached per static signature)."""
    validate_tp(cfg, mesh)
    local = _tp_compute(compute, mesh)
    model_size = mesh.shape.get("model", 1)

    def decode_body(p, mel_l, lang_l):
        if beam_width > 1:
            return beam_decode(
                p, cfg, mel_l, lang_l, local,
                beam_width=beam_width, detect=detect, max_tokens=max_tokens,
                length_penalty=length_penalty, task=task,
            )
        return greedy_decode(
            p, cfg, mel_l, lang_l, local,
            detect=detect, max_tokens=max_tokens, task=task,
        )

    if debug_replication and model_size > 1:
        from whisper_burn_tpu.parallel.guard import replication_mismatch

        def body(p, mel_l, lang_l):
            result = decode_body(p, mel_l, lang_l)
            return result, replication_mismatch(result, "model", model_size)

        out_specs = (P("data"), P())
    else:
        body = decode_body
        out_specs = P("data")

    def run(params, mel, lang_tokens):
        pspecs = param_pspecs(params)
        mapped = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(pspecs, P("data"), P("data")),
            # every result leaf is batch-major and model-replicated (the
            # psums make all model shards compute identical logits/tokens);
            # vma inference can't see that through the while_loop, so it is
            # disabled; replication is asserted by the token-equality tests
            # and, under debug_replication, verified in-graph per call
            out_specs=out_specs,
            check_vma=False,
        )
        out = mapped(params, mel, lang_tokens)
        if debug_replication and model_size == 1:
            import jax.numpy as jnp

            return out, jnp.zeros((), jnp.int32)  # tp=1: trivially replicated
        return out

    return jax.jit(run)


def decode_input_shardings(mesh: Mesh) -> tuple[NamedSharding, NamedSharding]:
    """(mel, lang) shardings for callers placing inputs ahead of time."""
    return (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
    )
