"""Worker for the two-process jax.distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices; the global mesh is (data=4,
model=1) over 2 processes. The worker runs a sharded greedy decode on its
half of the utterance batch and checks its addressable output rows against
a locally-computed single-device oracle.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
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

    from whisper_burn_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

    import jax.numpy as jnp

    from whisper_burn_tpu.models import WhisperConfig, greedy_decode, random_params
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.ops.compute import KernelBackend
    from whisper_burn_tpu.parallel import sharded_greedy_decode

    cfg = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
    compute = Compute.parity().replace(backend=KernelBackend.XLA)
    params = random_params(cfg, seed=0, quantized=True)

    # deterministic global batch; every host builds the same full copy and
    # feeds its local slice through local_batch_to_global
    batch = 8
    rng = np.random.default_rng(1)
    mel_global = rng.standard_normal((batch, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
        np.float32
    )
    lang_global = np.full((batch,), cfg.lang_token_start, np.int32)

    print(f"proc {proc_id} init done", flush=True)
    mesh = multihost.make_global_mesh(model=1)
    assert mesh.shape["data"] == 2 * num_procs

    sl = multihost.process_local_slice(batch)
    mel = multihost.local_batch_to_global(mesh, mel_global[sl])
    lang = multihost.local_batch_to_global(mesh, lang_global[sl])

    # replicate params across all hosts' devices
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x)
        ),
        params,
    )

    print(f"proc {proc_id} arrays built", flush=True)
    result = sharded_greedy_decode(rep, cfg, mel, lang, compute, mesh, max_tokens=8)

    print(f"proc {proc_id} decode dispatched", flush=True)
    # single-device oracle on the full batch (local compute, no collectives)
    oracle = greedy_decode(
        params, cfg, jnp.asarray(mel_global), jnp.asarray(lang_global),
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
