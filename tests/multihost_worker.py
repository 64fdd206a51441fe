"""Worker for the two-process jax.distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices. Two modes (VERDICT r2 item 4):

* ``dp_xla`` — (data=4, model=1) mesh, XLA kernels: pure data parallelism,
  the round-2 configuration.
* ``prod_tp_pallas`` — (data=2, model=2) mesh with the **model axis laid
  across the two processes**, Pallas kernels, fused QKV params, and the
  quantized-KV serving compute (int8 self-KV + int4 cross-KV): every
  row-parallel shard_map psum crosses a real process boundary — the exact
  communication pattern of a v5e pod running TP — with the in-graph
  replication guard (parallel/guard.py) verifying the outputs.

The worker runs a sharded greedy decode on its slice of the utterance
batch and checks its addressable output rows against a locally-computed
single-device oracle.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> [mode]
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon otherwise

import numpy as np


def main() -> None:
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp_xla"

    from whisper_burn_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from whisper_burn_tpu.models import WhisperConfig, greedy_decode, random_params
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.ops.compute import KernelBackend
    from whisper_burn_tpu.parallel import sharded_greedy_decode
    from whisper_burn_tpu.parallel.sharding import param_shardings

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    if mode == "prod_tp_pallas":
        # the serving configuration: Pallas kernels (interpret on CPU),
        # int8 self-KV + int4 cross-KV, fused shard-interleaved QKV
        compute = Compute.fastest(kv_bits=4).replace(backend=KernelBackend.PALLAS)
        from whisper_burn_tpu.models.params import fuse_attention_params

        raw = random_params(cfg, seed=0, quantized=True)
        # tp-interleaved fused params are only correct under model sharding;
        # the single-device oracle below must use the raw layout
        params = fuse_attention_params(raw, tp=2)
    else:
        compute = Compute.parity().replace(backend=KernelBackend.XLA)
        params = raw = random_params(cfg, seed=0, quantized=True)

    # deterministic global batch; every host builds the same full copy and
    # feeds its local slice through local_batch_to_global
    batch = 8
    rng = np.random.default_rng(1)
    mel_global = rng.standard_normal((batch, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
        np.float32
    )
    lang_global = np.full((batch,), cfg.lang_token_start, np.int32)

    print(f"proc {proc_id} init done", flush=True)
    if mode == "prod_tp_pallas":
        # (data=2, model=2) with the MODEL axis across the two processes:
        # devices[data i, model j] = process j's device i, so every TP psum
        # crosses the process boundary (a real pod's DCN/ICI hop)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        grid = np.array(devs).reshape(num_procs, 2).T  # [device, process]
        mesh = Mesh(grid, ("data", "model"))
        assert mesh.shape == {"data": 2, "model": 2}
    else:
        mesh = multihost.make_global_mesh(model=1)
        assert mesh.shape["data"] == 2 * num_procs

    sl = multihost.process_local_slice(batch)
    mel = multihost.local_batch_to_global(mesh, mel_global[sl])
    lang = multihost.local_batch_to_global(mesh, lang_global[sl])

    # place params: every host holds the full copy; make_array_from_callback
    # carves each device's shard per the Megatron pspecs (replicated specs
    # in dp_xla mode)
    shardings = param_shardings(params, mesh)
    placed = jax.tree.map(
        lambda x, s: jax.make_array_from_callback(
            np.asarray(x).shape, s, lambda idx, a=np.asarray(x): a[idx]
        ),
        params,
        shardings,
    )

    print(f"proc {proc_id} arrays built", flush=True)
    result = sharded_greedy_decode(
        placed, cfg, mel, lang, compute, mesh, max_tokens=8,
        debug_replication=(mode == "prod_tp_pallas"),
    )

    print(f"proc {proc_id} decode dispatched", flush=True)
    # single-device oracle on the full batch (local compute, no collectives)
    oracle = greedy_decode(
        raw, cfg, jnp.asarray(mel_global), jnp.asarray(lang_global),
        compute, max_tokens=8,
    )
    oracle_tokens = np.asarray(oracle.tokens)

    print(f"proc {proc_id} oracle done", flush=True)
    for shard in result.tokens.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_array_equal(
            np.asarray(shard.data), oracle_tokens[rows]
        )
    print(f"proc {proc_id} OK", flush=True)


if __name__ == "__main__":
    main()
