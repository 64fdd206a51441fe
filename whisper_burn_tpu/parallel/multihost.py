"""Multi-host initialization and batch distribution.

The reference has no distributed backend at all (SURVEY §2.3: the only
"communication" is mpsc channels between OS threads). The TPU-native
equivalent is ``jax.distributed`` + XLA collectives: every host runs the
same program, the mesh spans all chips (``data`` over DCN+ICI, ``model``
kept intra-host so TP psums ride ICI), and per-host input slices assemble
into global arrays with ``jax.make_array_from_process_local_data``.

A v5e-16 pod slice (BASELINE's target) = 4 hosts x 4 chips: call
:func:`initialize` on each host, build the mesh with
:func:`make_global_mesh`, and feed each host its shard of the utterance
batch via :func:`local_batch_to_global`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection.

    On Cloud TPU all arguments auto-detect from the metadata environment;
    pass them explicitly elsewhere. Safe to call once per process, before
    any other JAX use (``jax.process_count()`` must NOT be used as the
    idempotency check — it would itself initialize the XLA backend).
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_global_mesh(model: int = 1) -> Mesh:
    """A ``(data, model)`` mesh over every chip in the job.

    The model axis is kept within a host (chips per host is a multiple of
    any sensible TP degree) so tensor-parallel collectives never touch DCN;
    the data axis only syncs at gather time.
    """
    from whisper_burn_tpu.parallel.mesh import make_mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return make_mesh(model=model, devices=devices)


def local_batch_to_global(mesh: Mesh, local_batch: np.ndarray):
    """Assemble per-host input slices into one globally-sharded array.

    Each host passes its own ``[B_local, ...]`` slice; the result is a
    global ``[B_local * num_hosts_on_data_axis, ...]`` array sharded over
    the mesh ``data`` axis.
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def process_local_slice(n_global: int) -> slice:
    """Which rows of a global batch this host should load (even split)."""
    n_proc = jax.process_count()
    if n_global % n_proc != 0:
        raise ValueError(f"global batch {n_global} not divisible by {n_proc} hosts")
    per = n_global // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)
