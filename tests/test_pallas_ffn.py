"""Fused FFN kernel vs the two-matmul reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.gguf.repack import repack_f32
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.linear import apply_linear
from whisper_burn_tpu.ops.pallas_ffn import _gelu, fused_ffn_pallas

COMPUTE = Compute.parity()


def _params(d, f, seed=0):
    rng = np.random.default_rng(seed)
    w1 = rng.standard_normal((f, d)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((d, f)).astype(np.float32) * 0.05
    q1, q2 = repack_f32(w1), repack_f32(w2)
    fc1 = {"qw": jnp.asarray(q1.qw), "scales": jnp.asarray(q1.scales),
           "b": jnp.asarray(rng.standard_normal(f).astype(np.float32) * 0.01)}
    fc2 = {"qw": jnp.asarray(q2.qw), "scales": jnp.asarray(q2.scales),
           "b": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.01)}
    return fc1, fc2


@pytest.mark.parametrize("m,d,f,kind", [(4, 256, 1024, "tanh"), (16, 128, 512, "erf"), (100, 256, 512, "tanh")])
def test_fused_matches_unfused(m, d, f, kind):
    fc1, fc2 = _params(d, f)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, m, d)).astype(np.float32) * 0.5)
    y = fused_ffn_pallas(x, fc1, fc2, kind, COMPUTE, interpret=True)
    assert y is not None and y.shape == x.shape
    ref = apply_linear(fc2, _gelu(apply_linear(fc1, x, COMPUTE), kind), COMPUTE)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_declines_untileable_or_dense():
    fc1, fc2 = _params(128, 384)  # 384 not divisible by BF=512
    x = jnp.zeros((4, 128))
    assert fused_ffn_pallas(x, fc1, fc2, "tanh", COMPUTE, interpret=True) is None
    assert fused_ffn_pallas(x, {"w": jnp.zeros((128, 512))}, fc2, "tanh", COMPUTE, interpret=True) is None


def test_erf_gelu_polynomial_accuracy():
    """The in-kernel erf (A&S 7.1.26 — Mosaic cannot lower erf/erfc) stays
    within f32-polynomial error of the exact gelu; bf16 serving numerics
    are unchanged by construction."""
    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.ops.pallas_ffn import _erf, _gelu

    x = jnp.linspace(-6.0, 6.0, 50001)
    assert float(jnp.abs(_erf(x) - jax.lax.erf(x)).max()) < 5e-6
    g = _gelu(x, "erf")
    ref = jax.nn.gelu(x, approximate=False)
    assert float(jnp.abs(g - ref).max()) < 2e-5


def test_ffn_bf_env_override_ignores_stray_values(monkeypatch):
    """WB_FFN_BF must never crash or mis-tile production: unparsable and
    non-fitting values fall back to the automatic tile choice."""
    from whisper_burn_tpu.ops.pallas_ffn import ffn_bf

    monkeypatch.delenv("WB_FFN_BF", raising=False)
    auto = ffn_bf(1280, 5120)
    assert auto is not None
    for bad in ("abc", "", "0", "-512", "999"):  # 999 does not divide 5120
        monkeypatch.setenv("WB_FFN_BF", bad)
        assert ffn_bf(1280, 5120) == auto
    monkeypatch.setenv("WB_FFN_BF", "512")
    assert ffn_bf(1280, 5120) == 512  # valid fitting divisor accepted
