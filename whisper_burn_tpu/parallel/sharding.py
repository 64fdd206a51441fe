"""Sharding specs for the Whisper param pytree (GSPMD tensor parallelism).

Megatron-style layout over the mesh ``model`` axis:

* ``attn_{q,k,v}`` / ``xattn_{q,k,v}`` / ``fc1``: split by **output
  features** (= attention heads for q/k/v, ffn width for fc1) -> their
  activations come out model-sharded along D/F, so attention heads and the
  GELU run fully local;
* ``attn_o`` / ``xattn_o`` / ``fc2``: split by **input features** -> each
  shard computes a partial sum and XLA inserts one psum per block (2 per
  decoder layer + 1 per FFN), riding ICI;
* embeddings, positional tables, convs, layer norms, biases of
  input-split linears: replicated (tiny next to the block weights).

Weight leaves are stacked ``[L, ...]`` so specs carry a leading ``None``.
Head alignment: the model axis size must divide ``n_heads`` (20 for
Large-V3 -> model in {1, 2, 4, 5, 10, 20}).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_burn_tpu.models.params import Params

# linears split by output features (N axis of [K, N] apply layout). The
# fused projections (attn_qkv / xattn_kv) are column-parallel too — their N
# axis must be built shard-interleaved (models/params.fuse_attention_params
# with tp>1) for shard_map bodies, where the split is a *local* reslice.
_COL_PARALLEL = {
    "attn_q", "attn_k", "attn_v", "attn_qkv",
    "xattn_q", "xattn_k", "xattn_v", "xattn_kv",
    "fc1",
}
# linears split by input features (K axis) -> psum after
_ROW_PARALLEL = {"attn_o", "xattn_o", "fc2"}


def _leaf_spec(path, x) -> P:
    keys = [p.key for p in path if hasattr(p, "key")]
    leaf = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    stacked = "blocks" in keys  # stacked leaves carry a leading L axis

    def with_l(*spec):
        return P(None, *spec) if stacked else P(*spec)

    if parent in _COL_PARALLEL:
        if leaf in ("qw", "w", "qw8"):  # [L?, K, N]
            return with_l(None, "model")
        if leaf == "scales":  # [L?, K/32, N]
            return with_l(None, "model")
        if leaf in ("b", "s8"):  # [L?, N]
            return with_l("model")
    if parent in _ROW_PARALLEL:
        if leaf in ("qw", "w", "qw8"):
            return with_l("model", None)
        if leaf == "scales":
            return with_l("model", None)
        if leaf == "b":  # added after the psum -> replicated
            return with_l()
        if leaf == "s8":  # per-output-column dequant scale -> replicated
            return with_l(None)
    return with_l(*([None] * (x.ndim - (1 if stacked else 0))))


def param_pspecs(params: Params) -> Any:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def param_shardings(params: Params, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(params)
    )


def input_shardings(mesh: Mesh) -> tuple[NamedSharding, NamedSharding]:
    """(mel/audio sharding, lang-token sharding): batch over ``data``."""
    return (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
    )


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place params on the mesh according to :func:`param_pspecs`."""
    return jax.device_put(params, param_shardings(params, mesh))
