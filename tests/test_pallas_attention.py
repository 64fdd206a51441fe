"""Flash-decode attention kernel vs the einsum reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_burn_tpu.models.attention import attention, length_mask
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.pallas_attention import (
    decode_attention_unnormalized,
    flash_merge_extra_key,
    normalize,
)

COMPUTE = Compute.parity()


def _setup(b, t, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, d)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.5)
    return q, k, v


@pytest.mark.parametrize("b,t,d,h", [(2, 64, 128, 2), (3, 1536, 256, 4), (2, 256, 640, 10)])
def test_full_length_matches_einsum(b, t, d, h):
    q, k, v = _setup(b, t, d)
    res = decode_attention_unnormalized(q, k, v, jnp.asarray(t), h, interpret=True)
    assert res is not None
    acc, m, l = res
    out = normalize(acc, l, h)
    ref = attention(q, k, v, h, mask=None, compute=COMPUTE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("valid", [1, 5, 63, 64, 100])
def test_masked_length_matches_einsum(valid):
    b, t, d, h = 2, 128, 128, 2
    q, k, v = _setup(b, t, d, seed=1)
    res = decode_attention_unnormalized(q, k, v, jnp.asarray(valid), h, interpret=True)
    acc, m, l = res
    out = normalize(acc, l, h)
    ref = attention(q, k, v, h, mask=length_mask(jnp.asarray(valid), t), compute=COMPUTE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_extra_key_merge_equals_full_cache():
    """Deferred-cache semantics: kernel over keys [0,pos) + merged current
    token == einsum over keys [0,pos]."""
    b, t, d, h = 2, 128, 128, 2
    pos = 40
    q, k, v = _setup(b, t, d, seed=2)
    k_new = k[:, pos : pos + 1]
    v_new = v[:, pos : pos + 1]

    acc, m, l = decode_attention_unnormalized(q, k, v, jnp.asarray(pos), h, interpret=True)
    out = flash_merge_extra_key(acc, m, l, q, k_new, v_new, h)

    ref = attention(q, k, v, h, mask=length_mask(jnp.asarray(pos + 1), t), compute=COMPUTE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_extra_key_merge_first_position():
    """pos=0: nothing valid in the cache, output == attention to self only."""
    b, t, d, h = 1, 64, 128, 2
    q, k, v = _setup(b, t, d, seed=3)
    acc, m, l = decode_attention_unnormalized(q, k, v, jnp.asarray(0), h, interpret=True)
    out = flash_merge_extra_key(acc, m, l, q, k[:, :1], v[:, :1], h)
    # softmax over a single key = that key's value
    np.testing.assert_allclose(np.asarray(out), np.asarray(v[:, :1]), atol=2e-5, rtol=1e-4)


def test_bf16_inputs():
    b, t, d, h = 2, 512, 256, 4
    q, k, v = _setup(b, t, d, seed=4)
    comp = Compute.fast()
    res = decode_attention_unnormalized(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        jnp.asarray(t), h, interpret=True,
    )
    acc, m, l = res
    out = normalize(acc, l, h)
    ref = attention(q, k, v, h, mask=None, compute=COMPUTE)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-2


def test_unsupported_shapes_decline():
    q, k, v = _setup(2, 37, 128, seed=5)  # 37 has no tile
    assert decode_attention_unnormalized(q, k, v, jnp.asarray(37), 2, interpret=True) is None


# ---- kT kernel (transposed keys, heads on sublanes) ----

from whisper_burn_tpu.ops.pallas_attention import decode_attention_kT


def _kt(k):
    return jnp.swapaxes(k, -1, -2)[None]  # [B,T,D] -> [1(L),B,D,T]


@pytest.mark.parametrize("b,t,d,h", [(2, 64, 128, 2), (3, 1536, 256, 4), (2, 256, 640, 10)])
def test_kt_full_length_matches_einsum(b, t, d, h):
    q, k, v = _setup(b, t, d)
    res = decode_attention_kT(
        q, _kt(k), v[None], jnp.asarray(0), jnp.asarray(t), h, interpret=True
    )
    assert res is not None
    acc, m, l = res
    out = normalize(acc, l, h)
    ref = attention(q, k, v, h, mask=None, compute=COMPUTE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("valid", [1, 5, 63, 64, 100])
def test_kt_masked_length_matches_einsum(valid):
    b, t, d, h = 2, 128, 128, 2
    q, k, v = _setup(b, t, d, seed=1)
    res = decode_attention_kT(
        q, _kt(k), v[None], jnp.asarray(0), jnp.asarray(valid), h, interpret=True
    )
    acc, m, l = res
    out = normalize(acc, l, h)
    ref = attention(q, k, v, h, mask=length_mask(jnp.asarray(valid), t), compute=COMPUTE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_kt_layer_indexing():
    """The scalar-prefetched layer index selects the right cache slice."""
    b, t, d, h, L = 2, 64, 128, 2, 3
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, 1, d)).astype(np.float32))
    k4 = jnp.asarray(rng.standard_normal((L, b, t, d)).astype(np.float32))
    v4 = jnp.asarray(rng.standard_normal((L, b, t, d)).astype(np.float32))
    kT4 = jnp.swapaxes(k4, -1, -2)
    for layer in range(L):
        acc, m, l = decode_attention_kT(
            q, kT4, v4, jnp.asarray(layer), jnp.asarray(t), h, interpret=True
        )
        out = normalize(acc, l, h)
        ref = attention(q, k4[layer], v4[layer], h, mask=None, compute=COMPUTE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_kt_batch_groups_shared_cache():
    """G consecutive query streams share one cache entry (beam search)."""
    b, g, t, d, h = 2, 3, 64, 128, 2
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((b * g, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    acc, m, l = decode_attention_kT(
        q, _kt(k), v[None], jnp.asarray(0), jnp.asarray(t), h,
        batch_groups=g, interpret=True,
    )
    out = normalize(acc, l, h)
    k_rep = jnp.repeat(k, g, axis=0)
    v_rep = jnp.repeat(v, g, axis=0)
    ref = attention(q, k_rep, v_rep, h, mask=None, compute=COMPUTE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_kt_int8_cache_bf16_query():
    """int8 cache contents dequantize inside the kernel (scales fold outside)."""
    b, t, d, h = 2, 128, 256, 4
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((b, 1, d)).astype(np.float32)).astype(jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 128, (b, t, d)).astype(np.int8))
    v8 = jnp.asarray(rng.integers(-127, 128, (b, t, d)).astype(np.int8))
    acc, m, l = decode_attention_kT(
        q, _kt(k8), v8[None], jnp.asarray(0), jnp.asarray(t), h, interpret=True
    )
    out = normalize(acc, l, h)
    ref = attention(
        q.astype(jnp.float32),
        k8.astype(jnp.float32),
        v8.astype(jnp.float32),
        h, mask=None, compute=COMPUTE,
    )
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max() < 2e-2


def test_kt_unsupported_shapes_decline():
    q, k, v = _setup(2, 36, 128, seed=5)  # t % 8 != 0
    assert (
        decode_attention_kT(q, _kt(k), v[None], jnp.asarray(0), jnp.asarray(37), 2, interpret=True)
        is None
    )


# ---- int4-packed kT kernel ----

from whisper_burn_tpu.models.decoder import pack_int4, unpack_int4


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(-8, 8, (2, 64, 32)).astype(np.int8))
    p = pack_int4(x, axis=1)
    assert p.shape == (2, 32, 32) and p.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_int4(p, 1, jnp.int8)), np.asarray(x))


@pytest.mark.parametrize("valid", [64, 100, 128])
def test_kt_int4_packed_matches_unpacked(valid):
    """Packed uint8 K/V through the kernel == unpacked int4 values einsum."""
    b, t, d, h = 2, 128, 256, 4
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((b, 1, d)).astype(np.float32)).astype(jnp.bfloat16)
    k4 = jnp.asarray(rng.integers(-8, 8, (b, t, d)).astype(np.int8))
    v4 = jnp.asarray(rng.integers(-8, 8, (b, t, d)).astype(np.int8))
    kp = pack_int4(k4, axis=2)  # keys pack along D: [B, T, D/2]
    vp = pack_int4(v4, axis=1)  # values pack along T: [B, T/2, D]
    kTp = jnp.swapaxes(kp, -1, -2)[None]  # [1, B, D/2, T]
    res = decode_attention_kT(
        q, kTp, vp[None], jnp.asarray(0), jnp.asarray(valid), h, interpret=True
    )
    assert res is not None
    acc, m, l = res
    out = normalize(acc, l, h)
    ref = attention(
        q.astype(jnp.float32),
        k4.astype(jnp.float32),
        v4.astype(jnp.float32),
        h, mask=length_mask(jnp.asarray(valid), t), compute=COMPUTE,
    )
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max() < 2e-2


@pytest.mark.parametrize("valid", [5, 64, 128])
def test_scaled_int8_cache_matches_dequantized(valid):
    """Per-token int8 K/V with [L,B,T,1] scales == einsum on the dequantized
    cache (the self-KV quantization path, decoder._quantize_tokens)."""
    import jax

    from whisper_burn_tpu.models.decoder import _quantize_tokens
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    b, t, d, h = 2, 128, 128, 2
    q, k, v = _setup(b, t, d, seed=7)
    kq, ksc = _quantize_tokens(k)  # [B, T, D] int8, [B, T, 1] f32
    vq, vsc = _quantize_tokens(v)
    kvsc = jnp.concatenate([ksc, vsc], axis=-1)  # [B, T, 2]

    res = decode_attention_layer(
        q,
        kq[None],
        vq[None],
        jnp.asarray(0),
        jnp.asarray(valid),
        h,
        kv_scale4=kvsc[None],
        interpret=True,
    )
    assert res is not None
    acc, m, l = res
    out = normalize(acc, l, h)

    k_deq = kq.astype(jnp.float32) * ksc
    v_deq = vq.astype(jnp.float32) * vsc
    ref = attention(
        q, k_deq, v_deq, h, mask=length_mask(jnp.asarray(valid), t), compute=COMPUTE
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_scaled_kernel_extra_key_merge():
    """Flash state (m, l) from the scaled kernel merges correctly with an
    exact (unquantized) current-token key — the decode-step composition."""
    from whisper_burn_tpu.models.decoder import _quantize_tokens
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    b, t, d, h = 2, 64, 128, 2
    pos = 17
    q, k, v = _setup(b, t, d, seed=8)
    kq, ksc = _quantize_tokens(k)
    vq, vsc = _quantize_tokens(v)

    kvsc = jnp.concatenate([ksc, vsc], axis=-1)
    acc, m, l = decode_attention_layer(
        q, kq[None], vq[None], jnp.asarray(0), jnp.asarray(pos), h,
        kv_scale4=kvsc[None], interpret=True,
    )
    out = flash_merge_extra_key(acc, m, l, q, k[:, pos : pos + 1], v[:, pos : pos + 1], h)

    # reference: dequantized cache for [0,pos), exact key at pos
    k_deq = (kq.astype(jnp.float32) * ksc).at[:, pos].set(k[:, pos])
    v_deq = (vq.astype(jnp.float32) * vsc).at[:, pos].set(v[:, pos])
    ref = attention(
        q, k_deq, v_deq, h, mask=length_mask(jnp.asarray(pos + 1), t), compute=COMPUTE
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("valid", [5, 64, 128])
def test_int4_group_scaled_matches_dequantized(valid):
    """Per-token per-channel-GROUP int4 scales (decoder._quantize_tokens4,
    VERDICT r3 #2) through the single-pass kernel == einsum on the
    dequantized cache. d=512 -> 4 groups of 128 lanes (2 per nibble half),
    exercising the in-kernel one-hot scale expansion."""
    from whisper_burn_tpu.models.decoder import (
        _quantize_tokens4,
        self_kv_groups,
        unpack_int4,
    )
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_layer

    b, t, d, h = 2, 128, 512, 8
    assert self_kv_groups(d) == 4
    q, k, v = _setup(b, t, d, seed=9)
    kq, ksc = _quantize_tokens4(k)  # [B, T, D/2] uint8, [B, T, 4] f32
    vq, vsc = _quantize_tokens4(v)
    assert ksc.shape == (b, t, 4)
    kvsc = jnp.concatenate([ksc, vsc], axis=-1)  # [B, T, 8]

    res = decode_attention_layer(
        q, kq[None], vq[None], jnp.asarray(0), jnp.asarray(valid), h,
        kv_scale4=kvsc[None], interpret=True,
    )
    assert res is not None
    acc, m, l = res
    out = normalize(acc, l, h)

    gsz = d // 4
    k_deq = unpack_int4(kq, -1, jnp.float32) * jnp.repeat(ksc, gsz, axis=-1)
    v_deq = unpack_int4(vq, -1, jnp.float32) * jnp.repeat(vsc, gsz, axis=-1)
    ref = attention(
        q, k_deq, v_deq, h, mask=length_mask(jnp.asarray(valid), t), compute=COMPUTE
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_int4_group_scaled_merged_epilogue():
    """decode_attention_merged with group scales: extra-key merge +
    normalization in-kernel equals the explicit composition."""
    from whisper_burn_tpu.models.decoder import _quantize_tokens4, unpack_int4
    from whisper_burn_tpu.ops.pallas_attention import decode_attention_merged

    b, t, d, h = 2, 64, 512, 8
    pos = 23
    q, k, v = _setup(b, t, d, seed=10)
    kq, ksc = _quantize_tokens4(k)
    vq, vsc = _quantize_tokens4(v)
    kvsc = jnp.concatenate([ksc, vsc], axis=-1)

    out = decode_attention_merged(
        q, kq[None], vq[None], jnp.asarray(0), jnp.asarray(pos), h,
        k[:, pos : pos + 1], v[:, pos : pos + 1],
        kv_scale4=kvsc[None], interpret=True,
    )
    assert out is not None

    gsz = d // 4
    k_deq = (unpack_int4(kq, -1, jnp.float32) * jnp.repeat(ksc, gsz, axis=-1)).at[
        :, pos
    ].set(k[:, pos])
    v_deq = (unpack_int4(vq, -1, jnp.float32) * jnp.repeat(vsc, gsz, axis=-1)).at[
        :, pos
    ].set(v[:, pos])
    ref = attention(
        q, k_deq, v_deq, h, mask=length_mask(jnp.asarray(pos + 1), t), compute=COMPUTE
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_write_cache_slot_matches_dus():
    """ops/pallas_cache.write_cache_slot == dynamic_update_slice at every
    position, int8 and uint8, aliasing preserves untouched slots."""
    import jax

    from whisper_burn_tpu.ops.pallas_cache import write_cache_slot

    rng = np.random.default_rng(21)
    for dtype in (np.int8, np.uint8, np.float32):
        cache = jnp.asarray(rng.integers(0, 100, (3, 4, 16, 128)).astype(dtype))
        new = jnp.asarray(rng.integers(0, 100, (3, 4, 1, 128)).astype(dtype))
        for pos in (0, 7, 8, 15):
            out = write_cache_slot(cache, new, jnp.asarray(pos), interpret=True)
            assert out is not None
            ref = jax.lax.dynamic_update_slice(cache, new, (0, 0, pos, 0))
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # unsupported: T not a tile multiple
    assert (
        write_cache_slot(
            jnp.zeros((2, 2, 12, 128), jnp.int8),
            jnp.zeros((2, 2, 1, 128), jnp.int8),
            jnp.asarray(0),
            interpret=True,
        )
        is None
    )


def test_env_g_override_is_validated_and_never_crashes(monkeypatch):
    """The experiment-only block-size env hook must ignore anything that
    could break a production decode: unparsable text, non-divisors,
    non-positive values, and values the caller's VMEM predicate rejects."""
    from whisper_burn_tpu.ops.pallas_attention import _env_g

    monkeypatch.delenv("WB_TEST_G", raising=False)
    assert _env_g("WB_TEST_G", 8, 64) == 8  # unset -> default

    for bad in ("abc", "", "4.5", "0", "-2", "7"):  # 7 does not divide 64
        monkeypatch.setenv("WB_TEST_G", bad)
        assert _env_g("WB_TEST_G", 8, 64) == 8

    monkeypatch.setenv("WB_TEST_G", "16")
    assert _env_g("WB_TEST_G", 8, 64) == 16  # valid divisor accepted
    assert _env_g("WB_TEST_G", 8, 64, ok=lambda c: c <= 8) == 8  # budget veto
