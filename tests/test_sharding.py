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


class TestShardMapFastPath:
    """The Pallas fast path under the (data, model) mesh via shard_map
    (VERDICT r1 item 1): kernels see local per-shard shapes, row-parallel
    projections psum over the model axis, and the tokens match the
    single-device XLA oracle exactly."""

    CFG16 = CFG.replace(n_audio_ctx=16)  # tileable T_enc for decode kernels

    @pytest.fixture(scope="class")
    def params16(self):
        return random_params(self.CFG16, seed=0, quantized=True)

    @pytest.fixture(scope="class")
    def oracle(self, params16):
        mel = jnp.asarray(self._mel16())
        lang = jnp.full((8,), self.CFG16.lang_token_start, jnp.int32)
        return greedy_decode(
            params16, self.CFG16, mel, lang, COMPUTE, max_tokens=8
        )

    def _mel16(self, b=8, seed=1):
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (b, self.CFG16.n_mels, self.CFG16.n_audio_ctx * 2)
        ).astype(np.float32)

    def _run(self, params, compute, mesh, **kw):
        from whisper_burn_tpu.parallel import sharded_greedy_decode, shard_params_tp

        sharded = shard_params_tp(params, mesh)
        mel = jnp.asarray(self._mel16())
        lang = jnp.full((8,), self.CFG16.lang_token_start, jnp.int32)
        return sharded_greedy_decode(
            sharded, self.CFG16, mel, lang, compute, mesh, max_tokens=8, **kw
        )

    @pytest.mark.parametrize("backend", [KernelBackend.XLA, KernelBackend.PALLAS])
    def test_dp_tp_token_equality(self, params16, oracle, backend):
        """DPxTP shard_map decode == single-device tokens, on both the XLA
        and the Pallas (interpret-mode) kernel backends."""
        mesh = make_mesh(data=4, model=2)
        res = self._run(params16, Compute.parity().replace(backend=backend), mesh)
        np.testing.assert_array_equal(
            np.asarray(oracle.tokens), np.asarray(res.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(oracle.n_generated), np.asarray(res.n_generated)
        )

    def test_fused_qkv_interleaved_under_tp(self, params16, oracle):
        """Shard-interleaved fused q/k/v params (the serving layout) stay
        token-exact under TP (VERDICT r1 weak #3)."""
        from whisper_burn_tpu.models.params import fuse_attention_params

        mesh = make_mesh(data=4, model=2)
        fused = fuse_attention_params(params16, tp=2)
        res = self._run(fused, Compute.parity().replace(backend=KernelBackend.PALLAS), mesh)
        np.testing.assert_array_equal(
            np.asarray(oracle.tokens), np.asarray(res.tokens)
        )

    def test_quantized_kv_serving_config_under_tp(self, params16):
        """Compute.fastest (int8 self-KV + int4 cross-KV, Pallas) — the
        bench configuration — matches its own single-device tokens under
        the DPxTP mesh."""
        fastest = Compute.fastest(kv_bits=4).replace(backend=KernelBackend.PALLAS)
        mel = jnp.asarray(self._mel16())
        lang = jnp.full((8,), self.CFG16.lang_token_start, jnp.int32)
        single = greedy_decode(
            params16, self.CFG16, mel, lang, fastest, max_tokens=8
        )
        mesh = make_mesh(data=4, model=2)
        res = self._run(params16, fastest, mesh)
        np.testing.assert_array_equal(
            np.asarray(single.tokens), np.asarray(res.tokens)
        )

    def test_beam_under_tp(self, params16):
        """Beam search under DPxTP (beams colocated with their utterance's
        data shard) matches single-device beam tokens."""
        from whisper_burn_tpu.models.beam import beam_decode
        from whisper_burn_tpu.parallel import sharded_beam_decode, shard_params_tp

        mesh = make_mesh(data=4, model=2)
        mel = jnp.asarray(self._mel16())
        lang = jnp.full((8,), self.CFG16.lang_token_start, jnp.int32)
        single = beam_decode(
            params16, self.CFG16, mel, lang, COMPUTE, beam_width=2, max_tokens=6
        )
        sharded = shard_params_tp(params16, mesh)
        res = sharded_beam_decode(
            sharded, self.CFG16, mel, lang,
            Compute.parity().replace(backend=KernelBackend.PALLAS),
            mesh, beam_width=2, max_tokens=6,
        )
        np.testing.assert_array_equal(
            np.asarray(single.tokens), np.asarray(res.tokens)
        )

    def test_validate_tp_rejects_bad_axis(self):
        from whisper_burn_tpu.parallel import validate_tp

        mesh = make_mesh(data=2, model=4)
        with pytest.raises(ValueError):
            validate_tp(self.CFG16, mesh)  # 4 does not divide 2 heads


def test_pipeline_mesh_mode_token_equality(params):
    """WhisperPipeline(mesh=...) — the one-call transcribe() surface
    (src/transcribe.rs:34) at pod scale — matches the unsharded pipeline
    token-for-token, including non-divisible batch padding."""
    from whisper_burn_tpu.transcribe import WhisperPipeline

    cfg = CFG.replace(n_audio_ctx=16)
    p = random_params(cfg, seed=0, quantized=True)
    rng = np.random.default_rng(0)
    audios = [
        rng.standard_normal(cfg.n_audio_ctx * 2 * 160).astype(np.float32) * 0.1
        for _ in range(6)  # not divisible by data=4 -> exercises padding
    ]
    single = WhisperPipeline(
        (cfg, p), compute=COMPUTE, max_tokens=8
    ).transcribe_batch(audios, ["en"] * 6)

    mesh = make_mesh(data=4, model=2)
    sharded = WhisperPipeline(
        (cfg, p),
        compute=Compute.parity().replace(backend=KernelBackend.PALLAS),
        max_tokens=8,
        mesh=mesh,
    ).transcribe_batch(audios, ["en"] * 6)

    assert len(single) == len(sharded) == 6
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_dryrun_multichip_entry():
    """The driver's multi-chip dry run executes on the virtual mesh."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


class TestReplicationGuard:
    """parallel/guard.py: the debug-mode model-axis replication check
    (VERDICT r2 weak #2 / item 9). The healthy path reports zero mismatch;
    a deliberately-dropped row-parallel psum makes the guard raise."""

    CFG16 = WhisperConfig.tiny_test().replace(n_audio_ctx=16)

    def _inputs(self, b=8, seed=1):
        rng = np.random.default_rng(seed)
        mel = rng.standard_normal(
            (b, self.CFG16.n_mels, self.CFG16.n_audio_ctx * 2)
        ).astype(np.float32)
        lang = np.full((b,), self.CFG16.lang_token_start, np.int32)
        return jnp.asarray(mel), jnp.asarray(lang)

    def test_guard_passes_on_healthy_decode(self):
        from whisper_burn_tpu.parallel import sharded_greedy_decode, shard_params_tp

        params = random_params(self.CFG16, seed=0, quantized=True)
        mesh = make_mesh(data=4, model=2)
        mel, lang = self._inputs()
        res = sharded_greedy_decode(
            shard_params_tp(params, mesh), self.CFG16, mel, lang,
            COMPUTE, mesh, max_tokens=6, debug_replication=True,
        )
        oracle = greedy_decode(
            params, self.CFG16, mel, lang, COMPUTE, max_tokens=6
        )
        np.testing.assert_array_equal(
            np.asarray(oracle.tokens), np.asarray(res.tokens)
        )

    def test_guard_fires_on_dropped_psum(self, monkeypatch):
        """Simulate the bug the guard exists for: a future edit losing the
        cross-shard reduction in a row-parallel projection."""
        import whisper_burn_tpu.models.decoder as decoder_mod
        import whisper_burn_tpu.models.encoder as encoder_mod
        from whisper_burn_tpu.ops import apply_linear
        from whisper_burn_tpu.parallel import sharded_greedy_decode, shard_params_tp
        from whisper_burn_tpu.parallel.guard import ReplicationError
        from whisper_burn_tpu.parallel.sharded import _build

        params = random_params(self.CFG16, seed=0, quantized=True)
        mesh = make_mesh(data=4, model=2)
        mel, lang = self._inputs()

        def no_psum(p, x, compute):  # apply_reduce_linear minus the psum
            return apply_linear(p, x, compute)

        monkeypatch.setattr(decoder_mod, "apply_reduce_linear", no_psum)
        monkeypatch.setattr(encoder_mod, "apply_reduce_linear", no_psum)
        _build.cache_clear()  # don't reuse the healthy compiled program
        try:
            with pytest.raises(ReplicationError):
                sharded_greedy_decode(
                    shard_params_tp(params, mesh), self.CFG16, mel, lang,
                    COMPUTE, mesh, max_tokens=6, debug_replication=True,
                )
        finally:
            _build.cache_clear()  # drop the poisoned program
