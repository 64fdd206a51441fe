"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Exercises the DP/TP layout the driver's dryrun_multichip validates
(SURVEY §4 implication: sharding logic testable without a pod via
xla_force_host_platform_device_count).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_burn_tpu.models import WhisperConfig, greedy_decode, random_params
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend
from whisper_burn_tpu.parallel import (
    input_shardings,
    make_mesh,
    param_shardings,
    shard_params,
)
from whisper_burn_tpu.parallel.sharding import param_pspecs

CFG = WhisperConfig.tiny_test()
COMPUTE = Compute.parity().replace(backend=KernelBackend.XLA)


@pytest.fixture(scope="module")
def params():
    return random_params(CFG, seed=0, quantized=True)


def _mel(b, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, CFG.n_mels, CFG.n_audio_ctx * 2)).astype(np.float32)


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(data=5, model=3)


def test_param_pspecs_layout(params):
    specs = param_pspecs(params)
    dec = specs["decoder"]["blocks"]
    assert dec["attn_q"]["qw"] == P(None, None, "model")  # col-parallel
    assert dec["attn_o"]["qw"] == P(None, "model", None)  # row-parallel
    assert dec["attn_q"]["b"] == P(None, "model")
    assert dec["attn_o"]["b"] == P(None)
    assert dec["fc1"]["scales"] == P(None, None, "model")
    assert dec["fc2"]["scales"] == P(None, "model", None)
    assert specs["decoder"]["tok_emb"] == P(None, None)  # replicated
    assert specs["encoder"]["conv1"]["w"] == P(None, None, None)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_sharded_decode_matches_single_device(params, data, model):
    """DP and DPxTP greedy decode produce the single-device tokens."""
    mesh = make_mesh(data=data, model=model)
    sharded = shard_params(params, mesh)
    batch = 8
    mel = _mel(batch)
    lang = np.full((batch,), CFG.lang_token_start, np.int32)

    single = greedy_decode(
        params, CFG, jnp.asarray(mel), jnp.asarray(lang), COMPUTE, max_tokens=8
    )

    mel_sh, lang_sh = input_shardings(mesh)
    def _step(p, mel, lang):
        return greedy_decode(p, CFG, mel, lang, COMPUTE, max_tokens=8)

    fn = jax.jit(
        _step, in_shardings=(param_shardings(params, mesh), mel_sh, lang_sh)
    )
    with mesh:
        multi = fn(sharded, jnp.asarray(mel), jnp.asarray(lang))

    np.testing.assert_array_equal(np.asarray(single.tokens), np.asarray(multi.tokens))
    np.testing.assert_array_equal(
        np.asarray(single.n_generated), np.asarray(multi.n_generated)
    )


def test_dryrun_multichip_entry():
    """The driver's multi-chip dry run executes on the virtual mesh."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
