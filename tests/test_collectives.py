"""Structural communication invariants of the sharded decode (VERDICT r3 #10).

Counts collective instructions in the COMPILED shard_map decode program:

* pure DP: the zero-communication claim — no collective of any kind may
  appear in the decode program; this test fails if a future change adds
  one to the data-parallel path;
* DP x TP: communication is all-reduce (the row-parallel psums) ONLY —
  no all-gather / reduce-scatter / all-to-all / collective-permute
  (a gather would mean the Megatron layout broke and activations
  resharded mid-layer).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.models import WhisperConfig, random_params
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend
from whisper_burn_tpu.parallel import make_mesh, shard_params_tp
from whisper_burn_tpu.parallel.audit import audit_mesh

CFG = WhisperConfig.tiny_test().replace(n_audio_ctx=16)
COMPUTE = Compute.parity().replace(backend=KernelBackend.XLA)


@pytest.fixture(scope="module")
def params():
    return random_params(CFG, seed=0, quantized=True)


def _inputs(b=8, seed=1):
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(
        rng.standard_normal((b, CFG.n_mels, CFG.n_audio_ctx * 2)).astype(np.float32)
    )
    lang = jnp.full((b,), CFG.lang_token_start, jnp.int32)
    return mel, lang


def test_pure_dp_decode_has_zero_collectives(params):
    mesh = make_mesh(data=8, model=1)
    sharded = shard_params_tp(params, mesh)
    mel, lang = _inputs()
    counts, total = audit_mesh(CFG, COMPUTE, mesh, sharded, mel, lang)
    assert total == 0, f"data-parallel decode gained collectives: {counts}"


def test_tp_decode_communicates_only_via_psum(params):
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params_tp(params, mesh)
    mel, lang = _inputs()
    counts, total = audit_mesh(CFG, COMPUTE, mesh, sharded, mel, lang)
    assert counts["all-reduce"] > 0, "TP decode lost its row-parallel psums?"
    for op, n in counts.items():
        if op != "all-reduce":
            assert n == 0, f"TP decode gained a non-psum collective: {op} x{n}"


def test_tp_beam_decode_communicates_only_via_psum(params):
    """Beam + TP (VERDICT r4 #7): hypothesis reordering and the grouped
    cross-cache stay shard-local — beam search must add NO collective
    beyond the same row-parallel psums greedy uses."""
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params_tp(params, mesh)
    mel, lang = _inputs()
    counts, total = audit_mesh(
        CFG, COMPUTE, mesh, sharded, mel, lang, beam_width=2
    )
    assert counts["all-reduce"] > 0, "TP beam decode lost its psums?"
    for op, n in counts.items():
        if op != "all-reduce":
            assert n == 0, f"TP beam decode gained a non-psum collective: {op} x{n}"
