"""Stacked (layer-indexed) Pallas kernels vs their unstacked oracles.

ADVICE r3 (medium): the stacked kernels only engage at gate-passing shapes
(k % BK == 0, n % 128 == 0, f % BF == 0), which tiny_test's 64/256 dims
never satisfy — so the decode integration previously took the fallback
path in every test. These tests exercise the kernels directly in interpret
mode at gate-passing shapes, and run the full flash-decode path with a
config whose dims satisfy every gate (k=256, n=768/256, f=1024).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.gguf.repack import repack_f32
from whisper_burn_tpu.models import WhisperConfig, greedy_decode, random_params
from whisper_burn_tpu.models.params import fuse_attention_params
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend
from whisper_burn_tpu.ops.linear import apply_linear
from whisper_burn_tpu.ops.pallas_ffn import _gelu, fused_ffn_pallas_stacked
from whisper_burn_tpu.ops.pallas_q4 import q4_matmul_pallas, q4_matmul_pallas_stacked

COMPUTE = Compute.parity().replace(backend=KernelBackend.PALLAS)


def _stacked_linear(l_layers, k, n, seed=0):
    """L independent Q4-repacked [K, N] weights stacked to [L, K, N]."""
    rng = np.random.default_rng(seed)
    qws, scs, ws = [], [], []
    for _ in range(l_layers):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        qt = repack_f32(w)
        qws.append(qt.qw)
        scs.append(qt.scales)
        ws.append(qt.dequantize())
    return (
        jnp.asarray(np.stack(qws)),
        jnp.asarray(np.stack(scs)),
        np.stack(ws),  # dequantized oracle weights [L, K, N]
    )


@pytest.mark.parametrize("k,n,l_layers", [(256, 128, 3), (512, 512, 2), (256, 768, 2)])
def test_stacked_matmul_matches_each_layer(k, n, l_layers):
    """q4_matmul_pallas_stacked(layer=l) == x @ dequant(W_l) for every l."""
    qw, sc, wd = _stacked_linear(l_layers, k, n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32) * 0.1)
    for l in range(l_layers):
        y = q4_matmul_pallas_stacked(
            x, qw, sc, jnp.asarray(l), COMPUTE, interpret=True
        )
        assert y is not None and y.shape == (4, n)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x) @ wd[l], atol=1e-2, rtol=1e-3
        )


def test_stacked_matmul_matches_unstacked_kernel():
    """Same numerics as the single-layer kernel on the sliced weights."""
    qw, sc, _ = _stacked_linear(2, 512, 256, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32) * 0.1)
    y_st = q4_matmul_pallas_stacked(x, qw, sc, jnp.asarray(1), COMPUTE, interpret=True)
    y_un = q4_matmul_pallas(x, qw[1], sc[1], COMPUTE, interpret=True)
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_un), atol=2e-5)


def test_stacked_matmul_declines_out_of_gate():
    qw, sc, _ = _stacked_linear(2, 256, 128)
    x = jnp.zeros((300, 256))  # m > BM_MAX
    assert (
        q4_matmul_pallas_stacked(x, qw, sc, jnp.asarray(0), COMPUTE, interpret=True)
        is None
    )
    qw2, sc2, _ = _stacked_linear(2, 192, 128)  # k % BK != 0
    assert (
        q4_matmul_pallas_stacked(
            jnp.zeros((4, 192)), qw2, sc2, jnp.asarray(0), COMPUTE, interpret=True
        )
        is None
    )


def _stacked_ffn(l_layers, d, f, seed=0):
    rng = np.random.default_rng(seed)
    fc1s, fc2s = [], []
    for _ in range(l_layers):
        w1 = rng.standard_normal((f, d)).astype(np.float32) * 0.05
        w2 = rng.standard_normal((d, f)).astype(np.float32) * 0.05
        q1, q2 = repack_f32(w1), repack_f32(w2)
        fc1s.append(
            {"qw": q1.qw, "scales": q1.scales,
             "b": rng.standard_normal(f).astype(np.float32) * 0.01}
        )
        fc2s.append(
            {"qw": q2.qw, "scales": q2.scales,
             "b": rng.standard_normal(d).astype(np.float32) * 0.01}
        )
    stack = lambda ds: {
        k: jnp.asarray(np.stack([p[k] for p in ds])) for k in ds[0]
    }
    return stack(fc1s), stack(fc2s)


@pytest.mark.parametrize("kind", ["tanh", "erf"])
def test_stacked_ffn_matches_unfused_each_layer(kind):
    """fused_ffn_pallas_stacked(layer=l) == fc2_l(gelu(fc1_l(x))) (no fc2
    bias — the wrapper contract leaves it to the caller)."""
    d, f, l_layers = 128, 512, 2
    fc1, fc2 = _stacked_ffn(l_layers, d, f)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, d)).astype(np.float32) * 0.5)
    for l in range(l_layers):
        y = fused_ffn_pallas_stacked(
            x, fc1, fc2, jnp.asarray(l), kind, COMPUTE, interpret=True
        )
        assert y is not None and y.shape == x.shape
        p1 = {k: v[l] for k, v in fc1.items()}
        p2 = {"qw": fc2["qw"][l], "scales": fc2["scales"][l]}  # bias-free
        ref = apply_linear(p2, _gelu(apply_linear(p1, x, COMPUTE), kind), COMPUTE)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), atol=5e-5, rtol=1e-4
        )


def _gate_cfg():
    """A config whose decoder dims satisfy every stacked-kernel gate:
    k=256 (% BK), qkv n=768 / attn_o n=256 (% 128), ffn f=1024 (% BF=512
    fails!) -> use n_text_state=256 with ffn_mult 4 => f=1024; BF=512
    divides 1024."""
    return WhisperConfig.tiny_test().replace(
        n_audio_ctx=16,
        n_audio_state=256,  # random_params sizes all blocks from this
        n_text_state=256,
        n_audio_head=4,
        n_text_head=4,
        n_text_layer=2,
    )


def test_flash_decode_stacked_path_matches_xla():
    """End-to-end greedy decode through the stacked kernels (gates pass:
    st_ok/st_ffn true) == the XLA path, token for token."""
    from whisper_burn_tpu.models.decoder import _st_ffn_ok, _st_lin_ok

    cfg = _gate_cfg()
    params = fuse_attention_params(random_params(cfg, seed=13, quantized=True))
    blocks = params["decoder"]["blocks"]
    # the point of this test: these gates must actually pass
    assert _st_lin_ok(blocks["attn_qkv"], 2)
    assert _st_lin_ok(blocks["attn_o"], 2)
    assert _st_ffn_ok(blocks["fc1"], blocks["fc2"], 2)

    rng = np.random.default_rng(14)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(np.float32)
    )
    lang = jnp.full((2,), cfg.lang_token_start, jnp.int32)
    xla = greedy_decode(
        params, cfg, mel, lang,
        Compute.parity().replace(backend=KernelBackend.XLA), max_tokens=8,
    )
    flash = greedy_decode(params, cfg, mel, lang, COMPUTE, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(xla.tokens), np.asarray(flash.tokens))
