"""Flash-decode attention kernel: single-query attention over a KV cache.

Decode-step attention (q_len=1) is pure HBM bandwidth: the cost is reading
K and V once. The XLA einsum path reshapes [B, T, D] -> [B, H, T, dh=64]
— a physical transpose whose 64-wide minor dim pads to 128 lanes, so the
cache is effectively read ~4x per step. This kernel reads the cache in its
native layered layout ``[L, B, T, D]`` (D on lanes) exactly once: the
layer index is a **scalar-prefetch** argument consumed by the BlockSpec
index_map, so the per-layer slice is DMA'd straight from the full cache in
HBM — no host-side slicing, no copies, and the cache never moves through
the scan carry.

Head handling is fully vectorized via two constant "head maps" instead of
per-head loops or transposes:

* ``qmat[b, d, g] = q[b, d] * (g == head(d))`` -> scores for ALL heads are
  one MXU matmul ``s = K_tile @ qmat[b]`` giving ``[kt, Hp]``;
* ``emat[g, d] = (g == head(d))`` -> per-head softmax weights broadcast
  back to the D axis with one matmul; the weighted value sum is then an
  elementwise multiply + key-axis reduction (VPU).

Flash running max/sum (f32) accumulates across key tiles; key positions
``>= valid_len`` are masked. Outputs are **unnormalized**:
``(acc [B,1,D], m [B,1,H], l [B,1,H])`` so the caller can flash-merge one
extra key — the current token, whose K/V is *not yet* in the cache because
decoder.py defers the cache write to one dynamic_update_slice per step —
and then divide by ``l``.

Used for decoder self-attention (valid_len = pos, + merged current token)
and cross-attention (valid_len = T_enc, no extra key).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _env_g(name: str, default: int, b: int, ok=None) -> int:
    """Experiment hook: override a kernel's batch-group block size via env
    (scripts/exp_insitu.py sweeps these in situ). The override must divide
    the batch AND pass the caller's VMEM-budget predicate ``ok`` — a stale
    exported value must never push a production kernel past its budget
    (r5 review); never set in production configs."""
    import os

    try:
        v = int(os.environ.get(name, ""))
    except ValueError:
        return default  # unparsable stray value: ignore, never crash decode
    if v > 0 and b % v == 0 and (ok is None or ok(v)):
        return v
    return default


H_PAD = 128  # lane width for the per-head m/l state


def _kernel(
    scalar_ref, q_ref, k_ref, v_ref, *rest,
    scale, kt, scaled, g, single_pass, hs, dh, packed=False, fused_out=False,
    merge_extra=False, ngk=0, ngv=0, v_packed=False, voff=1, store=False,
):
    """``scaled=True``: K/V blocks are int8 with per-token absmax scales in
    an extra ``[kt, 2]`` f32 operand (K scale in lane 0, V scale in lane 1)
    — the K scale multiplies the scores row-wise (before softmax), the V
    scale weights each key's softmax mass in the value sum (the normalizer
    ``l`` stays unscaled).

    ``g``: number of query streams handled per grid step. Each grid step
    along the batch axis covers ``g`` consecutive streams with ONE DMA per
    operand — amortizing the per-grid-step fixed cost (DMA descriptors,
    control) that dominates at decode shapes.

    HEAD MASKS ARE BUILT IN-KERNEL from iota (r4): the previous interface
    took a host-built ``qmat = q * head_mask [B, D, H_PAD]`` — 21 MB/layer
    at B=64, materialized in HBM and re-staged per pallas_call, roughly
    DOUBLING the self-attention HBM traffic (XPlane trace, r4). Now the
    query arrives as the raw ``[g, 1, D]`` row; scores fold it into K with
    one VPU broadcast multiply (``s = (k * q) @ onehot``, the same
    multiply-add set — the head mask entries are exact 0/1), and the
    constant one-hot head maps are iota compares materialized in VMEM.

    ``single_pass=True`` (the whole T fits one key tile — the serving
    config's right-sized ctx=256 cache always does): skips the flash
    running-state init/merge, and contracts values kT-style — transpose p
    to ``[hs, kt]`` head rows and ONE ``[hs, kt] @ [kt, D]`` MXU dot
    collapsed with a head mask.

    ``fused_out=True`` (requires single_pass): ``acc`` holds the FINAL
    normalized attention output — and with ``merge_extra=True`` two more
    operands (the current token's raw K/V, not yet in the cache) are
    flash-merged in-kernel — replacing the per-layer XLA epilogue.

    ``ngk/ngv > 0`` (packed int4 + per-channel-GROUP scales): that side's
    scales are per-token-per-group — K groups occupy scale lanes [0, ngk)
    and V groups [voff, voff+ngv) (voff = ngk, or 1 when K is int8 with a
    scalar scale — the mixed 8K/4V mode). Each nibble half gets ng/2
    groups; scales expand to channels with one tiny one-hot MXU dot per
    half and fold into the unpacked nibbles (exact dequant).
    ``v_packed`` marks an int4 V cache (K may be int8 at the same time)."""
    if store:
        # write-back variant (requires merge_extra + scaled + single_pass):
        # the current token's PRE-QUANTIZED K/V rows land in the cache
        # in-place (aliased outputs), replacing the separate RMW slot
        # writer — the 8-row tile is already in VMEM, so the RMW read that
        # dominated the writer's traffic disappears entirely
        kn_ref, vn_ref, kq_ref, vq_ref, sc_ref = rest[:5]
        acc_ref, m_ref, l_ref, ko_ref, vo_ref = rest[5:]
    elif merge_extra:
        if scaled:
            kn_ref, vn_ref, sc_ref, acc_ref, m_ref, l_ref = rest
        else:
            kn_ref, vn_ref, acc_ref, m_ref, l_ref = rest
    elif scaled:
        sc_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    t_step = pl.program_id(1)

    if store:
        # replace row pos%8 of the 8-row tile containing pos (the masked
        # select over the block mirrors ops/pallas_cache._kernel; a dynamic
        # single-sublane store is not expressible for Mosaic)
        base = scalar_ref[2] * 8
        row = scalar_ref[3]
        kblk = k_ref[0, :, pl.ds(base, 8), :]  # [g, 8, ds] (VMEM-resident)
        vblk = v_ref[0, :, pl.ds(base, 8), :]
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == row
        ko_ref[0] = jnp.where(
            rowsel, jnp.broadcast_to(kq_ref[:, 0:1, :], kblk.shape), kblk
        )
        vo_ref[0] = jnp.where(
            rowsel, jnp.broadcast_to(vq_ref[:, 0:1, :], vblk.shape), vblk
        )

    if not single_pass:
        @pl.when(t_step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
            l_ref[...] = jnp.zeros_like(l_ref)

    valid = scalar_ref[1]
    d = q_ref.shape[-1]
    cdt = q_ref.dtype

    def head_onehot(rows, cols, rows_are_heads, dtype):
        # [rows, cols] one-hot head map: entry 1 where the channel belongs
        # to the head (channel axis // dh == head axis). The compare goes
        # through f32 before any narrow cast: Mosaic cannot relayout i1
        # vectors from (8,128) to the bf16 (16,128) tiling directly.
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        m = ((c // dh == r) if rows_are_heads else (r // dh == c))
        return m.astype(jnp.float32).astype(dtype)

    oh_dH = head_onehot(d, H_PAD, False, cdt)  # [d, Hp]: channel -> head col
    oh_Hd = head_onehot(H_PAD, d, True, cdt)  # [Hp, d]: head row -> channels
    oh_hs = head_onehot(hs, d, True, jnp.float32)  # [hs, d]

    j = jax.lax.broadcasted_iota(jnp.int32, (kt, 1), 0) + t_step * kt
    in_range = j < valid  # [kt, 1]

    for i in range(g):
        q_row = q_ref[i]  # [1, d] compute dtype
        if packed and ngk:
            # int4 + per-channel-group scales: expand the [kt, ng/2] group
            # scales of each nibble half to channels with a one-hot dot,
            # fold them (and q) into the unpacked nibbles — exact dequant.
            kp = k_ref[0, i].astype(jnp.int32)  # [kt, D/2]
            d2 = kp.shape[1]
            ngh = ngk // 2
            gidx = jax.lax.broadcasted_iota(jnp.int32, (ngh, d2), 1) // (d2 // ngh)
            gmat = (
                gidx == jax.lax.broadcasted_iota(jnp.int32, (ngh, d2), 0)
            ).astype(jnp.float32)  # [ngh, d2] one-hot group->lanes
            sck = sc_ref[0, i, :, 0:ngk]  # [kt, ngk] K group scales
            sk_lo = jnp.dot(sck[:, :ngh], gmat, preferred_element_type=jnp.float32)
            sk_hi = jnp.dot(sck[:, ngh:ngk], gmat, preferred_element_type=jnp.float32)
            k_lo = (((kp & 15).astype(jnp.float32) - 8.0) * sk_lo).astype(cdt)
            k_hi = (((kp >> 4).astype(jnp.float32) - 8.0) * sk_hi).astype(cdt)
            # concat the halves to natural channel order and use the FULL
            # q row: broadcasting a lane-offset q slice (q_row[:, d2:]) is
            # an invalid Mosaic relayout at real dims (D=1280)
            k_cat = jnp.concatenate([k_lo, k_hi], axis=1)  # [kt, D]
            s = jnp.dot(k_cat * q_row, oh_dH, preferred_element_type=jnp.float32)
            s = s * scale
        elif packed:
            # int4 nibble pairs (channels j / j+D/2 share a byte) with the
            # bias trick: dot the q-folded biased nibbles [0..15] and fold
            # the -8 out as a rank-1 correction.
            kp = k_ref[0, i].astype(jnp.int32)  # [kt, D/2]
            k_lo = (kp & 15).astype(cdt)
            k_hi = (kp >> 4).astype(cdt)
            qsum = jnp.dot(q_row, oh_dH, preferred_element_type=jnp.float32)  # [1, Hp]
            # full-q concat form — see the group-scales branch note
            k_cat = jnp.concatenate([k_lo, k_hi], axis=1)  # [kt, D] biased
            s = jnp.dot(k_cat * q_row, oh_dH, preferred_element_type=jnp.float32)
            s = (s - 8.0 * qsum) * scale
        else:
            # int8 caches convert to the compute dtype in VMEM (per-channel
            # scales are folded into q / the output by the caller); the
            # scores for all heads are ONE MXU op over the q-folded keys.
            k = k_ref[0, i].astype(cdt)  # [kt, D]
            s = jnp.dot(k * q_row, oh_dH, preferred_element_type=jnp.float32) * scale
        if scaled and not ngk:
            s = s * sc_ref[0, i, :, 0:1]  # [kt, 1] per-token K dequant scale
        s = jnp.where(in_range, s, NEG_BIG)

        if single_pass:
            m_new = jnp.max(s, axis=0, keepdims=True)
            p = jnp.where(in_range, jnp.exp(s - m_new), 0.0)  # [kt, Hp] f32
            lsum = jnp.sum(p, axis=0, keepdims=True)
            l_ref[i] = lsum
            m_ref[i] = m_new
            if scaled and not ngv:
                p = p * sc_ref[0, i, :, voff : voff + 1]
            pT = p.astype(cdt).T[:hs]  # [hs, kt] head rows
            if v_packed and ngv:
                # group-scaled values: fold the expanded per-group V scales
                # into the unpacked nibbles (exact; no rank-1 correction)
                vp = v_ref[0, i].astype(jnp.int32)  # [kt, D/2]
                d2v = vp.shape[1]
                nghv = ngv // 2
                vg = jax.lax.broadcasted_iota(jnp.int32, (nghv, d2v), 1) // (d2v // nghv)
                vgmat = (
                    vg == jax.lax.broadcasted_iota(jnp.int32, (nghv, d2v), 0)
                ).astype(jnp.float32)
                scv = sc_ref[0, i, :, voff : voff + ngv]  # [kt, ngv] V group scales
                sv_lo = jnp.dot(scv[:, :nghv], vgmat, preferred_element_type=jnp.float32)
                sv_hi = jnp.dot(scv[:, nghv:ngv], vgmat, preferred_element_type=jnp.float32)
                v_lo = (((vp & 15).astype(jnp.float32) - 8.0) * sv_lo).astype(cdt)
                v_hi = (((vp >> 4).astype(jnp.float32) - 8.0) * sv_hi).astype(cdt)
                pv_lo = jnp.dot(pT, v_lo, preferred_element_type=jnp.float32)
                pv_hi = jnp.dot(pT, v_hi, preferred_element_type=jnp.float32)
                # concat to [hs, D] and reduce against the FULL oh_hs —
                # lane-offset slices of the one-hot constant hit the same
                # Mosaic relayout limit as the K halves above
                pv_full = jnp.concatenate([pv_lo, pv_hi], axis=1)
                acc_val = jnp.sum(pv_full * oh_hs, axis=0, keepdims=True)
            elif v_packed:
                vp = v_ref[0, i].astype(jnp.int32)  # [kt, D/2]
                d2 = vp.shape[1]
                v_lo = (vp & 15).astype(cdt)
                v_hi = (vp >> 4).astype(cdt)
                rs = jnp.sum(pT.astype(jnp.float32), axis=1, keepdims=True)
                pv_lo = jnp.dot(pT, v_lo, preferred_element_type=jnp.float32) - 8.0 * rs
                pv_hi = jnp.dot(pT, v_hi, preferred_element_type=jnp.float32) - 8.0 * rs
                pv_full = jnp.concatenate([pv_lo, pv_hi], axis=1)  # [hs, D]
                acc_val = jnp.sum(pv_full * oh_hs, axis=0, keepdims=True)
            else:
                v = v_ref[0, i].astype(cdt)
                pv = jnp.dot(pT, v, preferred_element_type=jnp.float32)  # [hs, D]
                # collapse head rows: acc[d] = pv[head(d), d]
                acc_val = jnp.sum(pv * oh_hs, axis=0, keepdims=True)

            if not fused_out:
                acc_ref[i] = acc_val
                continue
            # fused epilogue: oh_Hd rows are one-hot over each head's dh
            # lanes, so the f32 [1,Hp]@[Hp,D] dots below are EXACT
            # per-head broadcasts (identical math to the XLA
            # flash_merge_extra_key / normalize they replace)
            oh32 = oh_Hd.astype(jnp.float32)
            if merge_extra:
                kn = kn_ref[i].astype(cdt)  # [1, D] current token K
                vn = vn_ref[i].astype(jnp.float32)
                s_e = jnp.dot(kn * q_row, oh_dH, preferred_element_type=jnp.float32) * scale
                m2 = jnp.maximum(m_new, s_e)
                alpha = jnp.exp(m_new - m2)  # [1, Hp]
                beta = jnp.exp(s_e - m2)
                l2 = lsum * alpha + beta
                alpha_f = jnp.dot(alpha, oh32, preferred_element_type=jnp.float32)
                beta_f = jnp.dot(beta, oh32, preferred_element_type=jnp.float32)
                l2_f = jnp.dot(l2, oh32, preferred_element_type=jnp.float32)
                acc_ref[i] = (acc_val * alpha_f + beta_f * vn) / l2_f
            else:
                l_f = jnp.dot(lsum, oh32, preferred_element_type=jnp.float32)
                acc_ref[i] = acc_val / l_f
            continue
        v = v_ref[0, i].astype(cdt)

        m_prev = m_ref[i]  # [1, Hp]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.where(in_range, jnp.exp(s - m_new), 0.0)  # [kt, Hp] f32
        alpha = jnp.exp(m_prev - m_new)  # [1, Hp]

        l_ref[i] = l_ref[i] * alpha + jnp.sum(p, axis=0, keepdims=True)
        m_ref[i] = m_new

        # broadcast per-head weights across each head's dh lanes, then
        # reduce over the key axis: acc_d += sum_t p[t, head(d)] * v[t, d]
        if scaled:
            p = p * sc_ref[0, i, :, 1:2]  # fold per-token V scale into p
        p_full = jnp.dot(p.astype(v.dtype), oh_Hd, preferred_element_type=jnp.float32)  # [kt, D]
        pv = jnp.sum(p_full * v.astype(jnp.float32), axis=0, keepdims=True)  # [1, D]
        alpha_full = jnp.dot(alpha.astype(v.dtype), oh_Hd, preferred_element_type=jnp.float32)
        acc_ref[i] = acc_ref[i] * alpha_full + pv


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_heads", "kt", "g", "batch_groups", "interpret", "fused_out",
        "merge_extra", "store",
    ),
)
def _decode_attn_call(
    q, k4, v4, scalars, *extras,
    n_heads, kt, g, batch_groups, interpret, fused_out=False, merge_extra=False,
    store=False,
):
    l_dim, _, t, ds = k4.shape
    packed = k4.dtype == jnp.uint8  # int4 K, pairs packed along channels
    v_packed = v4.dtype == jnp.uint8  # int4 V (K may stay int8: mixed mode)
    d = ds * 2 if packed else ds
    ds_v = v4.shape[-1]
    b = q.shape[0]  # stream count; k4 batch = b // batch_groups
    dh = d // n_heads
    scale = 1.0 / np.sqrt(dh)
    # extras = (k_new, v_new)? + (kv_scale4)?
    scaled = len(extras) > (2 if merge_extra else 0)
    # scale-operand lane width: 2 (per-token K+V scalars), 2*ng (full-int4
    # group scales), or 1+ng (mixed: int8-K scalar + int4-V groups)
    sw = extras[-1].shape[-1] if scaled else 2
    if packed and v_packed and sw > 2:
        ngk = ngv = sw // 2
        voff = ngk
    elif v_packed and not packed and sw > 2:
        ngk, ngv, voff = 0, sw - 1, 1
    else:
        ngk, ngv, voff = 0, 0, 1

    q3 = q.reshape(b, 1, d)  # head maps are built in-kernel from iota (r4)

    kv_spec = pl.BlockSpec(
        (1, g, kt, ds),
        lambda b, s, sc: (sc[0], b // batch_groups, s, 0),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (1, g, kt, ds_v),
        lambda b, s, sc: (sc[0], b // batch_groups, s, 0),
        memory_space=pltpu.VMEM,
    )
    sc_spec = pl.BlockSpec(
        (1, g, kt, sw),
        lambda b, s, sc: (sc[0], b // batch_groups, s, 0),
        memory_space=pltpu.VMEM,
    )
    grid = (b // g, t // kt)
    single_pass = t == kt  # whole T in one tile: exact one-shot softmax
    hs = max(16, -(-n_heads // 16) * 16)  # head-row count, sublane-aligned
    qlike_spec = pl.BlockSpec(
        (g, 1, d), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM
    )
    n_extra = (2 if merge_extra else 0) + (2 if store else 0)
    # store: the 8-row cache tile containing the write position, selected
    # by scalars[2] = pos // 8 (batch_groups is 1 on the self path)
    tile_spec_k = pl.BlockSpec(
        (1, g, 8, ds), lambda b, s, sc: (sc[0], b, sc[2], 0),
        memory_space=pltpu.VMEM,
    )
    tile_spec_v = pl.BlockSpec(
        (1, g, 8, ds_v), lambda b, s, sc: (sc[0], b, sc[2], 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scalars = [layer, valid_len(, pos//8, pos%8)]
        grid=grid,
        in_specs=[
            qlike_spec,
            kv_spec,
            v_spec,
            *([qlike_spec] * n_extra),
            *([sc_spec] if scaled else []),
        ],
        out_specs=(
            qlike_spec,
            pl.BlockSpec((g, 1, H_PAD), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, H_PAD), lambda b, s, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            *([tile_spec_k, tile_spec_v] if store else []),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, H_PAD), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, H_PAD), jnp.float32),
    )
    if store:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(k4.shape, k4.dtype),
            jax.ShapeDtypeStruct(v4.shape, v4.dtype),
        )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, kt=kt, scaled=scaled, g=g,
            single_pass=single_pass, hs=hs, dh=dh, packed=packed,
            fused_out=fused_out, merge_extra=merge_extra,
            ngk=ngk, ngv=ngv, v_packed=v_packed, voff=voff, store=store,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # operand indices include the scalar-prefetch arg: k4 = 2, v4 = 3
        input_output_aliases={2: 3, 3: 4} if store else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, q3, k4, v4, *extras)
    acc, m, l = outs[:3] if store else outs
    if store:
        return (acc, m[..., :n_heads], l[..., :n_heads]) + tuple(outs[3:])
    return acc, m[..., :n_heads], l[..., :n_heads]


def decode_attention_layer(
    q: jnp.ndarray,  # [B*G, 1, D] query streams
    k4: jnp.ndarray,  # [L, B, T, D] full layered cache
    v4: jnp.ndarray,  # [L, B, T, D]
    layer: jnp.ndarray,  # scalar int32 layer index
    valid_len: jnp.ndarray,  # scalar int32: keys [0, valid_len) participate
    n_heads: int,
    *,
    batch_groups: int = 1,
    kv_scale4: jnp.ndarray | None = None,  # [L, B, T, 2] f32 per-token scales
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None:
    """Attention of one query over layer ``layer`` of a layered KV cache.

    ``batch_groups=G > 1`` shares each cache entry among G consecutive
    query streams (beam search: W beams read their utterance's cross cache
    without duplicating it). ``kv_scale4`` dequantizes an int8 cache with
    per-token absmax scales (K scale in lane 0, V scale in lane 1); a
    uint8 cache holds int4 nibble pairs packed along channels
    (decoder._quantize_tokens4) and is unpacked in-kernel with the bias
    trick — served only when T fits one tile (the single-pass branch).
    Returns ``(acc [B*G,1,D] f32, m, l)`` unnormalized, or None if the
    shape is unsupported (caller falls back to XLA).
    """
    _, kb, t, ds = k4.shape
    packed = k4.dtype == jnp.uint8
    v_packed = v4.dtype == jnp.uint8
    d = ds * 2 if packed else ds
    ds_v = d // 2 if v_packed else d
    if v4.shape != (k4.shape[0], kb, t, ds_v):
        return None
    if d % n_heads != 0 or q.shape != (kb * batch_groups, 1, d) or n_heads > H_PAD:
        return None
    kt = _largest_tile(t)
    if kt is None or ((packed or v_packed) and kt != t):
        return None
    if (packed or v_packed) and kv_scale4 is not None and not _packed_scales_ok(
        kv_scale4, ds, ds_v, packed, v_packed
    ):
        return None
    if v_packed and not packed and kv_scale4 is None:
        return None  # mixed mode always carries scales
    b = q.shape[0]
    g = 1
    if batch_groups == 1:
        budget = 8 * 1024 * 1024  # per-operand VMEM block budget
        for cand in (8, 4, 2):
            if b % cand == 0 and cand * kt * ds * k4.dtype.itemsize <= budget:
                g = cand
                break
        g = _env_g(
            "WB_SELF_G", g, b,
            ok=lambda c: c * kt * ds * k4.dtype.itemsize <= budget,
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scalars = jnp.stack(
        [jnp.asarray(layer, jnp.int32), jnp.asarray(valid_len, jnp.int32)]
    )
    scales = () if kv_scale4 is None else (kv_scale4,)
    return _decode_attn_call(
        q, k4, v4, scalars, *scales,
        n_heads=n_heads, kt=kt, g=g, batch_groups=batch_groups, interpret=interpret,
    )


def decode_attention_unnormalized(
    q: jnp.ndarray,  # [B, 1, D]
    k: jnp.ndarray,  # [B, T, D]
    v: jnp.ndarray,  # [B, T, D]
    valid_len: jnp.ndarray,
    n_heads: int,
    *,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None:
    """Single-layer convenience wrapper over :func:`decode_attention_layer`."""
    return decode_attention_layer(
        q, k[None], v[None], jnp.asarray(0), valid_len, n_heads, interpret=interpret
    )


def merged_store_ok(k4, v4, kv_scale4, b: int) -> bool:
    """Static gate for the in-kernel cache write-back variant of
    :func:`decode_attention_merged` — mirrors its own decline conditions
    so the decoder can restructure its scan carry before calling (the
    _st_lin_ok pattern, ADVICE r3)."""
    if k4.ndim != 4 or k4.dtype != jnp.int8 or v4.dtype != jnp.int8:
        return False
    _, kb, t, ds = k4.shape
    if kv_scale4 is None or kv_scale4.shape[-1] != 2:
        return False
    if _largest_tile(t) != t or t % 8 != 0:
        return False
    return b == kb and b % 2 == 0


def decode_attention_merged(
    q: jnp.ndarray,  # [B, 1, D]
    k4: jnp.ndarray,  # [L, B, T, D(/2)] layered self cache
    v4: jnp.ndarray,
    layer: jnp.ndarray,
    valid_len: jnp.ndarray,
    n_heads: int,
    k_new: jnp.ndarray,  # [B, 1, D] current token's raw K (not yet cached)
    v_new: jnp.ndarray,
    *,
    kv_scale4: jnp.ndarray | None = None,
    interpret: bool | None = None,
    kq: jnp.ndarray | None = None,  # pre-quantized int8 rows to store
    vq: jnp.ndarray | None = None,
):
    """Self-attention decode step with the whole epilogue in-kernel.

    Returns the FINAL normalized attention output ``[B, 1, D]`` f32 — the
    current token's K/V flash-merged and the softmax normalization applied
    inside the single-pass kernel — replacing the per-layer XLA
    ``flash_merge_extra_key`` chain (~25 small ops/layer/step). None when
    the shape isn't single-tile (caller uses the two-stage path).

    ``kq``/``vq`` (both or neither; gate with :func:`merged_store_ok`):
    the current token's PRE-QUANTIZED int8 K/V rows are written into the
    cache **in place** at position ``valid_len`` (aliased outputs), and
    the return becomes ``(out, new_k4, new_v4)``. The kernel already
    holds the target 8-row tile in VMEM for the attention read, so this
    removes the separate RMW slot-writer launches and their read traffic
    (~99 us/array/step at B=64; ops/pallas_cache.py stays as the
    non-merged path's writer).
    """
    _, kb, t, ds = k4.shape
    packed = k4.dtype == jnp.uint8
    v_packed = v4.dtype == jnp.uint8
    d = ds * 2 if packed else ds
    ds_v = d // 2 if v_packed else d
    if v4.shape != (k4.shape[0], kb, t, ds_v):
        return None
    if d % n_heads != 0 or q.shape != (kb, 1, d) or n_heads > H_PAD:
        return None
    kt = _largest_tile(t)
    if kt != t:
        return None  # epilogue fusion needs the one-shot softmax
    if (packed or v_packed) and kv_scale4 is not None and not _packed_scales_ok(
        kv_scale4, ds, ds_v, packed, v_packed
    ):
        return None
    if v_packed and not packed and kv_scale4 is None:
        return None  # mixed mode always carries scales
    b = q.shape[0]
    g = 1
    budget = 8 * 1024 * 1024
    for cand in (8, 4, 2):
        if b % cand == 0 and cand * kt * ds * k4.dtype.itemsize <= budget:
            g = cand
            break
    g = _env_g(
        "WB_SELF_G", g, b,
        ok=lambda c: c * kt * ds * k4.dtype.itemsize <= budget,
    )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    store = kq is not None
    if store and not merged_store_ok(k4, v4, kv_scale4, b):
        return None  # caller gates on merged_store_ok; be safe anyway
    pos = jnp.asarray(valid_len, jnp.int32)
    scalars = jnp.stack(
        [jnp.asarray(layer, jnp.int32), pos]
        + ([pos // 8, pos % 8] if store else [])
    )
    extras = (
        (k_new, v_new)
        + ((kq, vq) if store else ())
        + (() if kv_scale4 is None else (kv_scale4,))
    )
    res = _decode_attn_call(
        q, k4, v4, scalars, *extras,
        n_heads=n_heads, kt=kt, g=g, batch_groups=1, interpret=interpret,
        fused_out=True, merge_extra=True, store=store,
    )
    if store:
        return res[0], res[3], res[4]
    return res[0]


def _largest_tile(t: int) -> int | None:
    # tiles must be sublane-aligned (divisible by 8) per Mosaic block rules
    for kt in (512, 384, 256, 128, 64, 32, 16, 8):
        if t % kt == 0:
            return kt
    return None


def _packed_scales_ok(kv_scale4, ds_k: int, ds_v: int, k_packed: bool, v_packed: bool) -> bool:
    """Group-scale operand sanity: lane width must match the cache dtypes —
    2 (per-token scalars), 2*ng (full-int4 group scales, ng/2 dividing the
    stored half-width), or 1+ng (mixed int8-K scalar + int4-V groups)."""
    sw = kv_scale4.shape[-1]
    if k_packed and v_packed:
        if sw == 2:
            return True  # legacy per-token scalar int4
        ng = sw // 2
        return sw % 2 == 0 and ng % 2 == 0 and ds_k % (ng // 2) == 0
    if v_packed:  # mixed: int8 K (scalar lane 0) + int4-V groups
        ng = sw - 1
        return sw >= 3 and ng % 2 == 0 and ds_v % (ng // 2) == 0
    return sw == 2


HS = 32  # head-rows padding (sublane grain) for the kT kernel
_KT_VMEM_LIMIT = 4 * 1024 * 1024  # per-operand block budget, bytes


def _kt_kernel(scalar_ref, q_ref, kT_ref, v_ref, acc_ref, m_ref, l_ref, *, scale, packed, g, t, dh, normalized=False):
    """Single-pass decode attention with transposed keys.

    The v1 kernel (:func:`_kernel`) pads H=20 heads to 128 lanes, so both
    MXU ops are ``[kt,D]@[D,128]`` — ~6.4x redundant FLOPs that make
    cross-attention MXU-bound (measured 479us/layer vs a 307us DMA SoL at
    B=64, T=1536, int8). Putting heads on *sublanes* instead makes them
    ``[32,D]@[D,T]`` and ``[32,T]@[T,D]`` — 4x fewer MXU cycles (745ns vs
    3x971ns measured at bench shapes), leaving the kernel DMA-bound.

    One grid step processes ``g`` query streams, each against its whole
    key range (no flash tiling — [D,1536] int4 is 1 MB of VMEM), so the
    softmax is exact in one pass; m/l are still returned for interface
    parity with v1 (the self-attention extra-key merge needs them).

    ``packed=True``: int4 pairs in uint8 (decoder.pack_int4). Keys pack
    along **D** (stored [D/2, T]), values along **T** (stored [T/2, D]) —
    chosen so NO unpacked tensor is ever materialized: the scores dot
    splits the query ``dot(q_lo, k_lo) + dot(q_hi, k_hi)`` (q halves are
    sublane slices), the value dot splits the probabilities ``dot(p_lo,
    v_lo) + dot(p_hi, v_hi)`` (p halves are lane slices). The nibble
    extract is 2 VPU ops per stored byte; the expensive lane/sublane
    concatenate of the original layout is gone.

    The query arrives RAW ``[g, 1, D]`` and the head layout ``qh[h, d] =
    q[d] * (d // dh == h)`` is built in-kernel (broadcast + iota compare,
    r4) — the host-built qh/hmask operands cost a [B, 32, D] bf16
    materialization + staging copy per layer per step.
    """
    valid = scalar_ref[1]
    d = q_ref.shape[-1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (HS, d), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (HS, d), 1)
    # f32 mask (i1 -> bf16 relayout is unsupported in Mosaic)
    hmask_f = (cc // dh == rr).astype(jnp.float32)
    for i in range(g):
        q_row = q_ref[i]  # [1, d] compute dtype
        qh = (
            jnp.broadcast_to(q_row.astype(jnp.float32), (HS, d)) * hmask_f
        ).astype(q_row.dtype)
        if packed:
            # BIAS TRICK: dot the *biased* nibbles [0..15] straight off the
            # unpack and fold the -8 out as one rank-1 correction,
            # ``dot(q, nib-8) == dot(q, nib) - 8*rowsum(q)`` — removes the
            # big-tensor subtract from the unpack (the VPU work that held
            # this kernel at 56% of roofline; with it: 84.6%, matching the
            # int8 variant's efficiency at half the bytes).
            kp = kT_ref[0, i].astype(jnp.int32)  # [D/2, T] biased nibble pairs
            d2 = kp.shape[0]
            k_lo = (kp & 15).astype(qh.dtype)
            k_hi = (kp >> 4).astype(qh.dtype)
            s = jnp.dot(qh[:, :d2], k_lo, preferred_element_type=jnp.float32)
            s = s + jnp.dot(qh[:, d2:], k_hi, preferred_element_type=jnp.float32)
            qsum = jnp.sum(qh.astype(jnp.float32), axis=1, keepdims=True)
            s = (s - 8.0 * qsum) * scale
        else:
            k = kT_ref[0, i].astype(qh.dtype)  # [D, T] (int8 converts on the way in)
            s = jnp.dot(qh, k, preferred_element_type=jnp.float32) * scale
        in_range = jax.lax.broadcasted_iota(jnp.int32, (HS, t), 1) < valid
        s = jnp.where(in_range, s, NEG_BIG)

        m = jnp.max(s, axis=1, keepdims=True)  # [HS, 1]
        p = jnp.where(in_range, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)

        pc = p.astype(qh.dtype)
        if packed:
            # same bias trick on the value side: sum_t p[t]*(nib-8) ==
            # dot(p, nib) - 8*l  (l = sum_t p[t], already computed)
            vp = v_ref[0, i].astype(jnp.int32)  # [T/2, D] biased nibble pairs
            t2 = vp.shape[0]
            v_lo = (vp & 15).astype(qh.dtype)
            v_hi = (vp >> 4).astype(qh.dtype)
            pv = jnp.dot(pc[:, :t2], v_lo, preferred_element_type=jnp.float32)
            pv = pv + jnp.dot(pc[:, t2:], v_hi, preferred_element_type=jnp.float32)
            pv = pv - 8.0 * l
        else:
            v = v_ref[0, i].astype(qh.dtype)  # [T, D]
            pv = jnp.dot(pc, v, preferred_element_type=jnp.float32)  # [HS, D]
        if normalized:
            # softmax normalization in-kernel: one VPU divide per head row
            # (replaces the XLA `normalize` repeat+divide epilogue)
            pv = pv / l
        # collapse head rows: out[d] = pv[head(d), d]
        acc_ref[i] = jnp.sum(pv * hmask_f, axis=0, keepdims=True)  # [1, D]
        m_ref[i] = m
        l_ref[i] = l


@functools.partial(
    jax.jit, static_argnames=("n_heads", "g", "batch_groups", "interpret", "normalized")
)
def _kt_attn_call(q, kT4, v4, scalars, *, n_heads, g, batch_groups, interpret, normalized=False):
    l_dim, _, ds, t = kT4.shape  # ds = stored channel count (D/2 when packed)
    packed = kT4.dtype == jnp.uint8
    d = ds * 2 if packed else ds
    b = q.shape[0]
    dh = d // n_heads
    scale = 1.0 / np.sqrt(dh)

    q3 = q.reshape(b, 1, d)  # head layout built in-kernel (r4)

    ts = t // 2 if packed else t  # stored key positions in the V array
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scalars = [layer, valid_len]
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, 1, d), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, g, ds, t),
                lambda b, sc: (sc[0], b // batch_groups, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g, ts, d),
                lambda b, sc: (sc[0], b // batch_groups, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((g, 1, d), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, HS, 1), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, HS, 1), lambda b, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    acc, m, l = pl.pallas_call(
        functools.partial(
            _kt_kernel, scale=scale, packed=packed, g=g, t=t, dh=dh,
            normalized=normalized,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, HS, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, HS, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # g-stream blocks exceed the default 16 MB scoped-vmem budget
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, q3, kT4, v4)
    # [B, HS, 1] -> [B, 1, H] for interface parity with the v1 kernel
    return acc, m[:, :n_heads, 0][:, None, :], l[:, :n_heads, 0][:, None, :]


def kt_kernel_supported(t: int, d: int, n_heads: int, itemsize: int = 1) -> bool:
    """Static shape check for :func:`decode_attention_kT` (one whole-T tile)."""
    if n_heads > HS or d % n_heads != 0:
        return False
    if t * d * itemsize > _KT_VMEM_LIMIT:
        return False
    align = 128 if jax.default_backend() not in ("cpu",) else 8
    return t % align == 0 and t >= align


def decode_attention_kT(
    q: jnp.ndarray,  # [B*G, 1, D] query streams
    kT4: jnp.ndarray,  # [L, B, D, T] TRANSPOSED layered key cache
    v4: jnp.ndarray,  # [L, B, T, D] value cache (natural layout)
    layer: jnp.ndarray,  # scalar int32 layer index
    valid_len: jnp.ndarray,  # scalar int32: keys [0, valid_len) participate
    n_heads: int,
    *,
    batch_groups: int = 1,
    interpret: bool | None = None,
    normalized: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None:
    """Transposed-key decode attention (see :func:`_kt_kernel`).

    ``normalized=True``: ``acc`` is the final softmax-normalized output
    (the in-kernel divide replaces the XLA ``normalize`` epilogue; ``m``/
    ``l`` are still returned for interface parity but already applied).

    Same contract as :func:`decode_attention_layer` — returns unnormalized
    ``(acc [B*G,1,D] f32, m [B*G,1,H], l [B*G,1,H])`` or None when the
    shape is unsupported — but reads keys in ``[D, T]`` layout, which only
    the *cross* cache uses (it is written once per utterance; a per-step
    transposed self-cache write would be a lane-dimension scatter).

    uint8 caches are int4 pairs (decoder.pack_int4): keys packed along D
    (stored [L, B, D/2, T]), values along T (stored [L, B, T/2, D]); the
    kernel consumes both halves with split dots — nothing is concatenated.
    """
    l_dim, kb, ds, t = kT4.shape
    packed = kT4.dtype == jnp.uint8
    d = ds * 2 if packed else ds
    ts = t // 2 if packed else t
    if v4.shape != (l_dim, kb, ts, d) or q.shape != (kb * batch_groups, 1, d):
        return None
    itemsize = 0.5 if packed else kT4.dtype.itemsize
    if not kt_kernel_supported(t, d, n_heads, itemsize):
        return None
    b = q.shape[0]
    g = 1
    if batch_groups == 1:
        budget = 16 * 1024 * 1024  # combined K+V block budget per grid step
        for cand in (4, 2):
            if b % cand == 0 and cand * 2 * ds * t * kT4.dtype.itemsize <= budget:
                g = cand
                break
        g = _env_g(
            "WB_CROSS_G", g, b,
            ok=lambda c: c * 2 * ds * t * kT4.dtype.itemsize <= budget,
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scalars = jnp.stack(
        [jnp.asarray(layer, jnp.int32), jnp.asarray(valid_len, jnp.int32)]
    )
    return _kt_attn_call(
        q, kT4, v4, scalars,
        n_heads=n_heads, g=g, batch_groups=batch_groups, interpret=interpret,
        normalized=normalized,
    )


def flash_merge_extra_key(
    acc: jnp.ndarray,  # [B, 1, D] f32 unnormalized
    m: jnp.ndarray,  # [B, 1, H]
    l: jnp.ndarray,  # [B, 1, H]
    q: jnp.ndarray,  # [B, 1, D]
    k_new: jnp.ndarray,  # [B, 1, D] the current token's key
    v_new: jnp.ndarray,  # [B, 1, D]
    n_heads: int,
) -> jnp.ndarray:
    """Merge one extra key/value into the flash state and normalize.

    This lets the decoder attend to the token being decoded *before* its
    K/V lands in the cache, so the cache write becomes a single deferred
    ``dynamic_update_slice`` (no per-layer full-cache rewrites).
    Returns the normalized attention output ``[B, 1, D]`` f32.
    """
    b, _, d = q.shape
    dh = d // n_heads
    scale = 1.0 / (dh**0.5)

    qf = q.astype(jnp.float32).reshape(b, n_heads, dh)
    kf = k_new.astype(jnp.float32).reshape(b, n_heads, dh)
    s_e = jnp.sum(qf * kf, axis=-1)[:, None, :] * scale  # [B, 1, H]

    m2 = jnp.maximum(m, s_e)
    alpha = jnp.exp(m - m2)  # rescale old state
    beta = jnp.exp(s_e - m2)  # new key weight
    l2 = l * alpha + beta

    alpha_full = jnp.repeat(alpha, dh, axis=-1)  # [B, 1, D]
    beta_full = jnp.repeat(beta, dh, axis=-1)
    l2_full = jnp.repeat(l2, dh, axis=-1)
    out = (acc * alpha_full + beta_full * v_new.astype(jnp.float32)) / l2_full
    return out


def normalize(acc: jnp.ndarray, l: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """acc / l with per-head broadcast (cross-attention: no extra key)."""
    d = acc.shape[-1]
    return acc / jnp.repeat(l, d // n_heads, axis=-1)
