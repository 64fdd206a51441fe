"""Real-dims offline token parity vs HF ``generate()`` (VERDICT r4 #1).

Runs the eval.hf_oracle protocol at real Large-V3 width — D=1280, 20
heads (dh=64), 128 mels, vocab 51866, n_audio_ctx=1500. Default depth is
4+4 layers (HF_PARITY.md: every width/kernel-tile shape is production,
CPU-oracle cost kept small); ``--layers 32 --out HF_PARITY_FULL`` runs
the FULL 32+32-layer Large-V3 architecture (HF_PARITY_FULL.md — the f32
parity row must stay token-exact; precision rows are read through the
``vs our bf16`` column because a 64-layer random-weight greedy surface
is trajectory-chaotic under bf16 rounding).

Pipeline under test = the production intake path: HF state dict ->
``convert_state_dict`` -> Q4_0 GGUF -> ``load_whisper_from_gguf`` ->
``prepare_params`` -> ``greedy_decode``. The same GGUF is dequantized back
into the HF model (``writeback_gguf_to_hf``), making HF ``generate()`` an
independent implementation of the reference greedy protocol
(/root/reference/src/model/whisper.rs:104-127) over identical effective
weights:

* parity compute (f32/XLA) must match HF **token-for-token**;
* each serving mode records its agreement vs the same HF trajectories —
  the real-dims, peaked-logit replacement for the iid random sweep
  (ACCURACY.md's q4_* rows);
* the mel frontend is pinned against ``WhisperFeatureExtractor`` at
  128 mels on the reference fixture audio (/root/reference/test.wav).

Artifacts: HF_PARITY.json (machine-readable) + HF_PARITY.md (table).

Usage:  python scripts/hf_realdims_parity.py [--layers 4] [--max-new 64]
        [--batch 4] [--out HF_PARITY]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

TEST_WAV = "/root/reference/test.wav"
CHUNK = 480_000  # 30 s at 16 kHz


def eval_audio_batch(b: int) -> np.ndarray:
    """Row 0 = the reference parity fixture; rows 1+ = deterministic
    synthetic program material (noise / tone mix / chirp)."""
    from whisper_burn_tpu.audio.io import load_wav

    rng = np.random.default_rng(0)
    rows = []
    wav = load_wav(TEST_WAV).samples.astype(np.float32)[:CHUNK]
    rows.append(np.pad(wav, (0, CHUNK - len(wav))))
    t = np.arange(CHUNK, dtype=np.float32) / 16000.0
    gens = [
        lambda: (rng.standard_normal(CHUNK) * 0.05).astype(np.float32),
        lambda: (0.1 * np.sin(2 * np.pi * 220 * t)
                 + 0.05 * np.sin(2 * np.pi * 523 * t)).astype(np.float32),
        lambda: (0.1 * np.sin(2 * np.pi * (100 + 40 * t) * t)).astype(np.float32),
    ]
    for i in range(1, b):
        rows.append(gens[(i - 1) % len(gens)]())
    return np.stack(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument(
        "--beam", type=int, default=2,
        help="beam width for the beam-parity leg (<=1 skips it); runs "
        "beam_decode vs HF beam search at the same real dims",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="HF_PARITY")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.audio.mel import MelFrontend
    from whisper_burn_tpu.eval.hf_oracle import (
        agreement,
        build_hf_fixture,
        convert_and_load,
        hf_generate_greedy,
        writeback_gguf_to_hf,
    )
    from whisper_burn_tpu.models.whisper import greedy_decode
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.ops.compute import KernelBackend
    from whisper_burn_tpu.transcribe import enable_compilation_cache, prepare_params

    enable_compilation_cache()
    t0 = time.time()
    print(f"[1/6] building HF fixture: D=1280, 20 heads, 128 mels, "
          f"vocab 51866, {args.layers}+{args.layers} layers", flush=True)
    hf = build_hf_fixture(
        enc_layers=args.layers, dec_layers=args.layers, seed=args.seed
    )

    print("[2/6] convert -> Q4_0 GGUF -> load -> write back", flush=True)
    blob, loaded = convert_and_load(hf)
    gguf_mb = len(blob) / 1e6
    writeback_gguf_to_hf(hf, blob)
    cfg = loaded.config.replace(gelu="erf")
    assert cfg.n_audio_state == 1280 and cfg.n_audio_head == 20
    assert cfg.n_mels == 128 and cfg.n_vocab == 51866

    print("[3/6] mel frontend vs WhisperFeatureExtractor", flush=True)
    audio = eval_audio_batch(args.batch)
    mel_frontend = MelFrontend(n_mels=128, norm="slaney")
    mel = np.asarray(mel_frontend(jnp.asarray(audio)))
    import transformers

    fe = transformers.WhisperFeatureExtractor(feature_size=128)
    fe_mel = fe(
        [a for a in audio], sampling_rate=16000, return_tensors="np",
        padding="max_length",
    )["input_features"]
    t = min(mel.shape[-1], fe_mel.shape[-1])
    mel_max_abs_diff = float(np.max(np.abs(mel[..., :t] - fe_mel[..., :t])))
    print(f"    max |ours - HF| = {mel_max_abs_diff:.2e}", flush=True)

    print("[4/6] HF generate (CPU oracle)", flush=True)
    langs = np.full((args.batch,), cfg.lang_token_start, np.int32)  # <|en|>
    t_hf = time.time()
    theirs = hf_generate_greedy(hf, cfg, mel, langs, max_new=args.max_new)
    hf_s = time.time() - t_hf
    lens = [len(t_) for t_ in theirs]
    print(f"    {hf_s:.0f} s, generated lens = {lens}", flush=True)
    beam_theirs = None
    beam_hf_s = 0.0
    if args.beam > 1:
        t_hf = time.time()
        beam_theirs = hf_generate_greedy(
            hf, cfg, mel, langs, max_new=args.max_new, num_beams=args.beam
        )
        beam_hf_s = time.time() - t_hf
        print(
            f"    beam-{args.beam} oracle: {beam_hf_s:.0f} s, "
            f"lens = {[len(t_) for t_ in beam_theirs]}", flush=True,
        )
    del hf
    gc.collect()

    serving = Compute.fastest(kv_bits=4).replace(
        quantized_logits=True, w8a8=True
    )
    rows = {
        "parity_f32_xla": Compute.parity().replace(backend=KernelBackend.XLA),
        "fast_bf16_xla": Compute.fast().replace(backend=KernelBackend.XLA),
        "serving_int8kv": Compute.fastest(),
        "serving_default_int4cross_q8log_w8a8": serving,
        "serving_int4self": serving.replace(self_kv_bits=4),
        "serving_mixed_8k4v": serving.replace(self_kv_vbits=4),
    }
    results: dict[str, dict] = {}
    tokens_by_row: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    mel_j = jnp.asarray(mel)
    langs_j = jnp.asarray(langs)
    print("[5/6] our rows", flush=True)
    for name, comp in rows.items():
        t_row = time.time()
        params = prepare_params(loaded.params, comp)
        res = greedy_decode(
            params, cfg, mel_j.astype(comp.dtype) if comp.dtype != jnp.float32
            else mel_j, langs_j, comp, max_tokens=args.max_new,
        )
        ours = np.asarray(res.tokens)
        n_gen = np.asarray(res.n_generated)
        tokens_by_row[name] = (ours, n_gen)
        agr = [agreement(ours[i], n_gen[i], theirs[i]) for i in range(args.batch)]
        exact = all(
            int(n_gen[i]) == len(theirs[i])
            and np.array_equal(ours[i][: n_gen[i]], theirs[i])
            for i in range(args.batch)
        )
        # first step (per stream) where our trajectory leaves the HF one —
        # positional agreement zeroes everything AFTER a single greedy
        # near-tie flip, so the flip point is the informative number at
        # full depth where bf16 rounding makes trajectories chaotic
        first_div = [
            next(
                (
                    i
                    for i in range(min(int(n_gen[s]), len(theirs[s])))
                    if int(ours[s][i]) != int(theirs[s][i])
                ),
                -1,  # -1 = no positional mismatch (may still differ in length)
            )
            for s in range(args.batch)
        ]
        results[name] = {
            "agreement_mean": round(float(np.mean(agr)), 4),
            "agreement_min": round(float(np.min(agr)), 4),
            "token_exact": bool(exact),
            "per_stream": [round(a, 4) for a in agr],
            "first_divergence_vs_hf": first_div,
            "wall_s": round(time.time() - t_row, 1),
        }
        print(f"    {name}: mean={np.mean(agr):.4f} min={np.min(agr):.4f} "
              f"exact={exact} div@{first_div} ({time.time()-t_row:.0f} s)",
              flush=True)
        del params
        gc.collect()

    # attribution column: agreement vs OUR bf16/XLA trajectory. At full
    # depth the random-weight logit surface is trajectory-chaotic under
    # bf16 rounding (f32 stays token-exact vs the f32 HF oracle); this
    # column separates "bf16 precision flipped a near-tie" from "the
    # Pallas/quantized path changed the math".
    bf16_toks, bf16_n = tokens_by_row["fast_bf16_xla"]
    for name, r in results.items():
        ours, n_gen = tokens_by_row[name]
        vs = [
            agreement(ours[i], n_gen[i], bf16_toks[i][: int(bf16_n[i])])
            for i in range(args.batch)
        ]
        r["vs_bf16_mean"] = round(float(np.mean(vs)), 4)
        r["vs_bf16_min"] = round(float(np.min(vs)), 4)

    # beam leg: beam_decode vs HF beam search at the same real dims, in
    # the no-early-stop regime where the hypothesis-set evolution is
    # identical (tests/test_hf_parity.py pins this at toy dims; this is
    # the real-width counterpart).
    beam_results: dict[str, dict] = {}
    if beam_theirs is not None:
        from whisper_burn_tpu.models.beam import beam_decode

        beam_rows = {
            "beam_parity_f32_xla": rows["parity_f32_xla"],
            "beam_fast_bf16_xla": rows["fast_bf16_xla"],
            "beam_serving_int8kv": rows["serving_int8kv"],
            "beam_serving_no_q8log":
                rows["serving_default_int4cross_q8log_w8a8"].replace(
                    quantized_logits=False
                ),
            "beam_serving_int8cross":
                Compute.fastest().replace(
                    quantized_logits=True, w8a8=True
                ),
            "beam_serving_default":
                rows["serving_default_int4cross_q8log_w8a8"],
        }
        print(f"[5b] beam-{args.beam} rows", flush=True)
        for name, comp in beam_rows.items():
            t_row = time.time()
            params = prepare_params(loaded.params, comp)
            res = beam_decode(
                params, cfg,
                mel_j.astype(comp.dtype) if comp.dtype != jnp.float32
                else mel_j,
                langs_j, comp, beam_width=args.beam,
                max_tokens=args.max_new,
            )
            ours = np.asarray(res.tokens)
            n_gen = np.asarray(res.n_generated)
            agr = [
                agreement(ours[i], n_gen[i], beam_theirs[i])
                for i in range(args.batch)
            ]
            exact = all(
                int(n_gen[i]) == len(beam_theirs[i])
                and np.array_equal(ours[i][: n_gen[i]], beam_theirs[i])
                for i in range(args.batch)
            )
            beam_results[name] = {
                "agreement_mean": round(float(np.mean(agr)), 4),
                "agreement_min": round(float(np.min(agr)), 4),
                "token_exact": bool(exact),
                "per_stream": [round(a, 4) for a in agr],
                "wall_s": round(time.time() - t_row, 1),
            }
            print(
                f"    {name}: mean={np.mean(agr):.4f} "
                f"min={np.min(agr):.4f} exact={exact} "
                f"({time.time()-t_row:.0f} s)", flush=True,
            )
            del params
            gc.collect()

    print("[6/6] writing artifacts", flush=True)
    payload = {
        "protocol": "hf_oracle real-dims (see scripts/hf_realdims_parity.py)",
        "dims": {"d_model": 1280, "n_heads": 20, "n_mels": 128,
                 "vocab": 51866, "layers": args.layers,
                 "n_audio_ctx": 1500},
        "batch": args.batch,
        "max_new": args.max_new,
        "seed": args.seed,
        "gguf_mb": round(gguf_mb, 1),
        "backend": jax.default_backend(),
        "mel_max_abs_diff_vs_hf_extractor": mel_max_abs_diff,
        "hf_generate_lens": lens,
        "hf_generate_s": round(hf_s, 1),
        "rows": results,
        "beam": (
            {
                "width": args.beam,
                "hf_generate_s": round(beam_hf_s, 1),
                "rows": beam_results,
            }
            if beam_results
            else None
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(payload, f, indent=1)

    md = [
        "# HF_PARITY — real-dims token parity vs HF generate (offline)",
        "",
        f"Fixture: random-init HF Whisper at real Large-V3 width (D=1280, 20 heads,",
        f"128 mels, vocab 51866, n_audio_ctx=1500), {args.layers}+{args.layers} layers, run through the",
        "FULL production intake (convert -> Q4_0 GGUF -> loader -> prepare_params);",
        "the same GGUF is dequantized back into HF so both stacks run identical",
        "effective weights (whisper_burn_tpu/eval/hf_oracle.py). HF `generate()`",
        "implements the reference greedy protocol independently",
        "(/root/reference/src/model/whisper.rs:104-127).",
        "",
        f"Eval set: {args.batch} streams x {args.max_new} max tokens — stream 0 is",
        "/root/reference/test.wav, the rest deterministic synthetic audio.",
        f"Backend: `{jax.default_backend()}`. HF oracle lens: {lens}.",
        "",
        f"Mel frontend vs `WhisperFeatureExtractor` (128 mels): max abs diff "
        f"**{mel_max_abs_diff:.2e}**.",
        "",
        "| row | compute | token-exact | vs HF mean / min | vs our bf16 mean / min |",
        "|---|---|---|---|---|",
    ]
    desc = {
        "parity_f32_xla": "f32, XLA",
        "fast_bf16_xla": "bf16, XLA",
        "serving_int8kv": "bf16, Pallas, int8 self+cross KV",
        "serving_default_int4cross_q8log_w8a8":
            "bf16, Pallas, int8 self + int4 cross, int8 logits, W8A8",
        "serving_int4self": "serving + int4-group self-KV (opt-in)",
        "serving_mixed_8k4v": "serving + int8-K/int4-V self-KV (opt-in)",
    }
    for name, r in results.items():
        md.append(
            f"| {name} | {desc[name]} | "
            f"{'**yes**' if r['token_exact'] else 'no'} | "
            f"{r['agreement_mean']:.4f} / {r['agreement_min']:.4f} | "
            f"{r['vs_bf16_mean']:.4f} / {r['vs_bf16_min']:.4f} |"
        )
    beam_desc = {
        "beam_parity_f32_xla": "beam search, f32, XLA",
        "beam_fast_bf16_xla": "beam search, bf16, XLA",
        "beam_serving_int8kv": "beam search, bf16, Pallas, int8 self+cross KV",
        "beam_serving_no_q8log":
            "beam search, serving config minus int8 logits",
        "beam_serving_int8cross":
            "beam search, serving config with int8 (not int4) cross-KV",
        "beam_serving_default":
            "beam search, full serving config (int4 cross, int8 logits, W8A8)",
    }
    for name, r in beam_results.items():
        md.append(
            f"| {name} (W={args.beam}) | {beam_desc[name]} | "
            f"{'**yes**' if r['token_exact'] else 'no'} | "
            f"{r['agreement_mean']:.4f} / {r['agreement_min']:.4f} | — |"
        )
    md += [
        "",
        "Parity compute is required to be token-exact (the verdict's",
        "correctness axis); serving rows are gated at >= 0.90 agreement by",
        "tests/test_accuracy.py-style floors at 4+4 depth. `vs our bf16`",
        "re-scores each row against our own bf16/XLA trajectory: greedy",
        "decode on a random-weight surface is trajectory-chaotic — a single",
        "bf16-rounded near-tie flip rewrites every later position — so at",
        "full 32+32 depth that column (plus `first_divergence_vs_hf` in the",
        "JSON) is what separates precision-induced trajectory splits from",
        "kernel error. Beam rows compare `beam_decode` (HF-parity banked",
        "early stopping, length_penalty=1.0) against HF",
        "`generate(num_beams=W)` over the same weights — their `vs HF`",
        "column scores against the HF *beam* oracle. Generated by",
        "`python scripts/hf_realdims_parity.py`.",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"ok": True, "wall_s": payload["wall_s"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
