"""Scale-out layer: device meshes, sharding specs, DP/TP transcription.

The reference is a single-process, single-GPU, batch-1 system (SURVEY
§2.3); all parallelism here is new TPU-native design:

* **DP** — utterance batches sharded over the mesh ``data`` axis.
* **TP** — Megatron-style weight sharding over the ``model`` axis
  (q/k/v and fc1 split by output features = heads, out-proj and fc2 split
  by input features), expressed as ``NamedSharding`` on the param pytree.
  Two execution routes: GSPMD jit (XLA inserts the collectives; XLA-backend
  graphs only) and **shard_map** (parallel/sharded.py) — the production
  route, where the Pallas kernels see local per-shard shapes and the
  row-parallel projections psum explicitly over ICI.
* No PP (the model is small per chip — a non-goal, SURVEY §2.3) and no EP
  (no MoE in Whisper).

Communication is entirely XLA collectives — there is no hand-written
transport, matching the "no NCCL/MPI" design point of the plan.
"""

from whisper_burn_tpu.parallel.mesh import make_mesh
from whisper_burn_tpu.parallel.sharded import (
    sharded_beam_decode,
    sharded_greedy_decode,
    shard_params_tp,
    validate_tp,
)
from whisper_burn_tpu.parallel.sharding import (
    input_shardings,
    param_shardings,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "input_shardings",
    "shard_params",
    "shard_params_tp",
    "sharded_greedy_decode",
    "sharded_beam_decode",
    "validate_tp",
]
