"""Ablation timing of the decode step: locate per-step overhead vs SoL.

Times ``iters`` chained decode steps as one in-graph ``fori_loop``
dispatch (full step, then component ablations: no self-attn kernel / no
cross-attn kernel / no FFN+matmuls) to attribute the gap between the
measured step time and the HBM speed-of-light bound.

Sync model (one rule across every harness, ADVICE r2): chain iterations
through a data dependency, fetch one host value at the end, and subtract
the dispatch+fetch roundtrip MEASURED AT RUNTIME (scripts/roofline.py's
probe) — never a hardcoded constant. Elapsed times at or below the
roundtrip raise instead of going negative.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
KV = os.environ.get("BENCH_KV", "int4")


ROUNDTRIP = None  # measured in main() via roofline.measure_roundtrip


def timeit_loop(step_fn, params, token, pos, cache, iters=32):
    """Time ``iters`` chained decode steps as ONE in-graph fori_loop
    dispatch (the same harness bench.py's breakdown uses).

    The in-graph loop matters on this backend: buffer donation is not
    honored across a Python-level chained loop, which piles up one
    un-donated multi-GB cache copy per in-flight step and deadlocks the
    allocator — the fori_loop keeps exactly one copy regardless of iters."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(p, tok, cache):
        def body(k, carry):
            tok, cache = carry
            logits, cache = step_fn(p, tok, pos + k, cache)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        tok, cache = jax.lax.fori_loop(0, iters, body, (tok, cache))
        return tok

    np.asarray(loop(params, token, cache)[0])  # compile + warmup, synced
    t0 = time.perf_counter()
    np.asarray(loop(params, token, cache)[0])  # host fetch = true sync
    elapsed = time.perf_counter() - t0 - ROUNDTRIP
    if elapsed <= 0:
        raise RuntimeError(
            f"elapsed {elapsed + ROUNDTRIP:.6f}s <= measured roundtrip "
            f"{ROUNDTRIP:.6f}s — increase iters"
        )
    return elapsed / iters


def main():
    global ROUNDTRIP

    import jax
    import jax.numpy as jnp

    from roofline import measure_roundtrip

    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.decoder import decode_step, init_cache
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.models.whisper import PROMPT_LEN
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import enable_compilation_cache, prepare_params

    enable_compilation_cache()
    ROUNDTRIP = measure_roundtrip()
    print(f"measured sync roundtrip: {ROUNDTRIP*1e3:.2f} ms", flush=True)
    cfg = WhisperConfig.large_v3()
    compute = {
        "bf16": Compute.fast(),
        "int8": Compute.fastest(),
        "int4": Compute.fastest(kv_bits=4),
    }[KV]
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)

    ctx = 256
    cache = init_cache(cfg, BATCH, compute, ctx=ctx)
    # fill cross cache with fabricated content (shape is all that matters)
    rng = np.random.default_rng(0)

    def randlike(x):
        if x is None:
            return None
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(rng.standard_normal(x.shape).astype(x.dtype))
        return jnp.asarray(
            rng.integers(0, 255, x.shape, dtype=np.uint8).view(np.int8).astype(x.dtype)
            if x.dtype == jnp.int8
            else rng.integers(0, 255, x.shape, dtype=np.uint8)
        )

    cache = cache._replace(
        cross_k=randlike(cache.cross_k),
        cross_v=randlike(cache.cross_v),
        self_k=randlike(cache.self_k),
        self_v=randlike(cache.self_v),
    )

    token = jnp.full((BATCH,), 1000, jnp.int32)
    pos = jnp.asarray(PROMPT_LEN + 112, jnp.int32)  # mid-decode position

    t_full = timeit_loop(
        lambda p, tok, pos, cache: decode_step(p, cfg, tok, pos, cache, compute),
        params, token, pos, cache,
    )
    print(f"full step    : {t_full*1e3:8.3f} ms", flush=True)

    # ablations: patch out pieces by calling internals directly
    from whisper_burn_tpu.models import decoder as D

    real_flash = D._decode_step_flash

    def make_ablated(no_self=False, no_cross=False, no_ffn=False):
        from whisper_burn_tpu.models.attention import attention  # noqa
        from whisper_burn_tpu.models.layers import gelu, layer_norm
        from whisper_burn_tpu.ops import apply_ffn, apply_linear, qkv_proj
        from whisper_burn_tpu.ops.pallas_attention import (
            decode_attention_kT,
            decode_attention_layer,
            flash_merge_extra_key,
            normalize,
        )

        def ablated(params, cfg, x, pos, cache, compute, batch_groups=1):
            dec = params["decoder"]
            h = cfg.n_text_head
            t_enc = jnp.asarray(cfg.n_audio_ctx, jnp.int32)
            layer_idx = jnp.arange(cfg.n_text_layer)
            quantized_cross = cache.cross_k_scale is not None
            transposed = D.cross_kt_layout(cfg, compute)

            def block(x, xs):
                bp, l = xs
                hdn = layer_norm(x, bp["attn_ln"]["g"], bp["attn_ln"]["b"])
                q, k_new, v_new = qkv_proj(bp, hdn, compute)
                if not no_self:
                    acc, m, lsum = decode_attention_layer(
                        q, cache.self_k, cache.self_v, l, pos, h
                    )
                    a = flash_merge_extra_key(
                        acc, m, lsum, q, k_new, v_new, h
                    ).astype(compute.dtype)
                    x = x + apply_linear(bp["attn_o"], a, compute)

                hdn = layer_norm(x, bp["xattn_ln"]["g"], bp["xattn_ln"]["b"])
                qx = apply_linear(bp["xattn_q"], hdn, compute)
                if not no_cross:
                    if quantized_cross:
                        ks_l = jax.lax.dynamic_index_in_dim(
                            cache.cross_k_scale, l, 0, keepdims=False
                        )
                        vs_l = jax.lax.dynamic_index_in_dim(
                            cache.cross_v_scale, l, 0, keepdims=False
                        )
                        qx = qx * ks_l.astype(qx.dtype)[None, None, :]
                    cross_attn = (
                        decode_attention_kT if transposed else decode_attention_layer
                    )
                    acc, m, lsum = cross_attn(
                        qx, cache.cross_k, cache.cross_v, l, t_enc, h,
                        batch_groups=batch_groups,
                    )
                    if quantized_cross:
                        acc = acc * vs_l.astype(acc.dtype)[None, None, :]
                    a = normalize(acc, lsum, h).astype(compute.dtype)
                    x = x + apply_linear(bp["xattn_o"], a, compute)

                if not no_ffn:
                    hdn = layer_norm(x, bp["mlp_ln"]["g"], bp["mlp_ln"]["b"])
                    x = x + apply_ffn(bp, hdn, cfg.gelu, compute)
                return x, (k_new, v_new)

            x, (ks, vs) = jax.lax.scan(block, x, (dec["blocks"], layer_idx))
            sk = jax.lax.dynamic_update_slice(
                cache.self_k, ks.astype(cache.self_k.dtype), (0, 0, pos, 0)
            )
            sv = jax.lax.dynamic_update_slice(
                cache.self_v, vs.astype(cache.self_v.dtype), (0, 0, pos, 0)
            )
            logits = D._logits(dec, x[:, 0], cfg, compute)
            return logits, cache._replace(self_k=sk, self_v=sv)

        return ablated

    for name, kw in [
        ("no self-attn ", dict(no_self=True)),
        ("no cross-attn", dict(no_cross=True)),
        ("no ffn       ", dict(no_ffn=True)),
        ("attn only    ", dict(no_ffn=True, no_self=False, no_cross=False)),
        ("nothing      ", dict(no_self=True, no_cross=True, no_ffn=True)),
    ]:
        D._decode_step_flash = make_ablated(**kw)
        try:
            t = timeit_loop(
                lambda p, tok, pos, cache: decode_step(p, cfg, tok, pos, cache, compute),
                params, token, pos, cache,
            )
            print(
                f"{name}: {t*1e3:8.3f} ms  (delta {(t_full-t)*1e3:+7.3f})",
                flush=True,
            )
        finally:
            D._decode_step_flash = real_flash


if __name__ == "__main__":
    main()
