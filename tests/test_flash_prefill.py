"""Flash prefill attention wrapper vs the einsum oracle (interpret mode).

Mirrors the reference's kernel-vs-oracle strategy (src/gguf/tests.rs, SURVEY
§4) for the encoder's blockwise attention path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_burn_tpu.models.attention import attention
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.flash_prefill import prefill_attention

COMPUTE = Compute.parity()


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.3)


@pytest.mark.parametrize("t", [128, 160])  # 160 exercises the pad+mask path
def test_flash_prefill_matches_einsum(t):
    b, d, h = 2, 128, 2
    q, k, v = _rand((b, t, d), 0), _rand((b, t, d), 1), _rand((b, t, d), 2)
    ref = np.asarray(attention(q, k, v, h, mask=None, compute=COMPUTE))
    out = prefill_attention(q, k, v, h, COMPUTE, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)


def test_flash_prefill_declines_unsupported():
    b, t, d, h = 2, 64, 128, 2  # t too small
    q = _rand((b, t, d), 0)
    assert prefill_attention(q, q, q, h, COMPUTE, interpret=True) is None
    q = _rand((b, 128, 96), 0)  # dh = 48, not lane-aligned
    assert prefill_attention(q, q, q, 2, COMPUTE, interpret=True) is None


def test_flash_prefill_bf16():
    b, t, d, h = 1, 128, 128, 2
    compute = Compute.fast()
    q = _rand((b, t, d), 3).astype(jnp.bfloat16)
    k = _rand((b, t, d), 4).astype(jnp.bfloat16)
    v = _rand((b, t, d), 5).astype(jnp.bfloat16)
    ref = np.asarray(
        attention(q, k, v, h, mask=None, compute=compute), np.float32
    )
    out = prefill_attention(q, k, v, h, compute, interpret=True)
    assert out is not None
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=5e-2)


# ---- single-pass whole-sequence encoder kernel ----

from whisper_burn_tpu.ops.pallas_encoder_attention import encoder_attention


@pytest.mark.parametrize("b,t,d,h", [(2, 128, 128, 2), (1, 300, 256, 4), (2, 1500, 128, 2)])
def test_encoder_attention_matches_einsum(b, t, d, h):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.5)
    out = encoder_attention(q, k, v, h, interpret=True)
    assert out is not None
    ref = attention(q, k, v, h, mask=None, compute=Compute.parity())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_encoder_attention_declines_long_t():
    b, t, d, h = 1, 4096, 128, 2
    q = jnp.zeros((b, t, d))
    assert encoder_attention(q, q, q, h, interpret=True) is None


def test_encoder_head_group_selection_valid_across_family():
    """_pick_dgrp must return a lane-aligned (or whole-D) group under the
    STRICT VMEM budget for every (model dims x dtype) combination — two
    real configs violated this before r5: Medium bf16 tied the budget
    exactly (scoped-vmem OOM at compile) and Large f32 picked a 320-lane
    group (Mosaic block-rule reject)."""
    from whisper_burn_tpu.ops.pallas_encoder_attention import _pick_dgrp

    budget = 24 * 1024 * 1024
    for d, h in ((1280, 20), (1024, 16), (64, 1), (128, 2)):
        for itemsize in (2, 4):
            dgrp = _pick_dgrp(1536 if d >= 512 else 128, d, h, itemsize)
            assert dgrp is not None, (d, h, itemsize)
            t = 1536 if d >= 512 else 128
            assert dgrp % 128 == 0 or dgrp == d, (d, h, itemsize, dgrp)
            assert 8 * t * dgrp * itemsize < budget, (d, h, itemsize, dgrp)
    # the measured Large-V3 bf16 choice is pinned: 10 heads = 640 lanes
    assert _pick_dgrp(1536, 1280, 20, 2) == 640
    # Medium bf16 drops to the 8-head group (the exact-tie fix)
    assert _pick_dgrp(1536, 1024, 16, 2) == 512
