"""Quantization-accuracy acceptance sweep CLI (VERDICT r1 item 3).

Measures, at real model dims, what each serving-mode quantization costs
relative to an f32 reference — the offline proxy for BASELINE.md's WER
target (no real checkpoint exists in this environment):

* weight axis: f32 weights vs Q4_0-quantized weights (same underlying
  float values, quantized through gguf/repack.py — the real checkpoint
  path);
* KV-cache axis: bf16 vs int8 (per-channel cross / per-token self) vs
  int4-packed cross + int8 self (``Compute.fastest(kv_bits=4)``, the
  bench default).

The measurement core lives in whisper_burn_tpu/eval/quant_accuracy.py
(teacher-forced per-step agreement + logit drift); floors are enforced by
tests/test_accuracy.py.

Usage (on the TPU chip; CPU works for the tiny config):
    python scripts/accuracy_sweep.py --config large_v3 --seeds 5 \
        --steps 64 --batch 4 --out ACCURACY
Writes <out>.md (human table) and <out>.json (machine-readable).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from whisper_burn_tpu.eval.quant_accuracy import compare_variant, reference_run
from whisper_burn_tpu.models import WhisperConfig
from whisper_burn_tpu.models.params import random_params
from whisper_burn_tpu.ops import Compute
from whisper_burn_tpu.ops.compute import KernelBackend


def run_sweep(
    cfg_name: str,
    seeds: int,
    steps: int,
    batch: int,
    backend: str,
    on_seed=None,
):
    cfg = {
        "large_v3": WhisperConfig.large_v3,
        "turbo": WhisperConfig.large_v3_turbo,
        "medium": WhisperConfig.medium,
        "tiny": lambda: WhisperConfig.tiny_test().replace(n_audio_ctx=16),
    }[cfg_name]()

    kb = {
        "auto": KernelBackend.AUTO,
        "xla": KernelBackend.XLA,
        "pallas": KernelBackend.PALLAS,
    }[backend]

    variants = {
        "q4_f32": Compute.parity().replace(backend=kb),
        "q4_bf16": Compute.fast().replace(backend=kb),
        "q4_int8kv": Compute.fastest(kv_bits=8).replace(backend=kb),
        "q4_int4kv": Compute.fastest(kv_bits=4).replace(backend=kb),
    }
    ref_compute = Compute.parity().replace(backend=KernelBackend.XLA)

    acc: dict[str, list] = {k: [] for k in variants}
    for seed in range(seeds):
        t0 = time.time()
        # matched f32/Q4 pairs: same rng stream -> identical float weights
        params_f32 = random_params(cfg, seed=seed, quantized=False)
        params_q4 = random_params(cfg, seed=seed, quantized=True)
        rng = np.random.default_rng(1000 + seed)
        mel = jnp.asarray(
            rng.standard_normal((batch, cfg.n_mels, cfg.n_audio_ctx * 2)).astype(
                np.float32
            )
        )
        langs = jnp.asarray(
            rng.integers(cfg.lang_token_start, cfg.lang_token_end, size=batch),
            jnp.int32,
        )

        ref_tokens, ref_lg, valid = reference_run(
            params_f32, cfg, mel, langs, ref_compute, steps
        )
        for name, comp in variants.items():
            row = compare_variant(
                ref_lg, valid, params_q4, cfg, mel, langs, ref_tokens, comp, steps
            )
            acc[name].append(dict(seed=seed, **row))
        print(
            f"seed {seed} done in {time.time() - t0:.1f}s: "
            + ", ".join(f"{k}={acc[k][-1]['token_agreement']:.4f}" for k in variants),
            file=sys.stderr,
            flush=True,
        )
        if on_seed is not None:
            on_seed(_summarize(acc, cfg_name, seed + 1, steps, batch, backend))

    return _summarize(acc, cfg_name, seeds, steps, batch, backend)


def _summarize(acc, cfg_name, seeds, steps, batch, backend):
    summary = {}
    for name, rows in acc.items():
        summary[name] = dict(
            token_agreement_mean=float(np.mean([r["token_agreement"] for r in rows])),
            token_agreement_min=float(np.min([r["token_agreement"] for r in rows])),
            max_logit_drift=float(np.max([r["max_logit_drift"] for r in rows])),
            norm_drift_max=float(np.max([r["norm_drift"] for r in rows])),
            per_seed=rows,
        )
    return dict(
        config=cfg_name,
        seeds=seeds,
        steps=steps,
        batch=batch,
        backend=backend,
        device=str(jax.devices()[0].platform),
        variants=summary,
    )


def write_outputs(result: dict, out: str) -> None:
    with open(out + ".json", "w") as f:
        json.dump(result, f, indent=1)

    lines = [
        "# ACCURACY — quantization acceptance sweep",
        "",
        f"Config **{result['config']}** at real dims, {result['seeds']} seeds x "
        f"{result['batch']} streams x {result['steps']} teacher-forced decode steps "
        f"per variant, backend `{result['backend']}` on `{result['device']}`. "
        "Reference: f32 weights, f32 XLA compute. Protocol: the reference greedy "
        "trajectory is teacher-forced through each quantized variant; per-step "
        "argmax agreement + logit drift are measured over pre-EOT steps "
        "(whisper_burn_tpu/eval/quant_accuracy.py).",
        "",
        "| variant | weights | compute | KV cache | token agreement (mean / min over seeds) | max logit drift | drift / ref-logit-std |",
        "|---|---|---|---|---|---|---|",
    ]
    meta = {
        "q4_f32": ("Q4_0", "f32", "f32"),
        "q4_bf16": ("Q4_0", "bf16", "bf16"),
        "q4_int8kv": ("Q4_0", "bf16", "int8 self + int8 cross"),
        "q4_int4kv": ("Q4_0", "bf16", "int8 self + int4 cross (bench default)"),
    }
    for name, s in result["variants"].items():
        w, c, kv = meta.get(name, ("?", "?", "?"))
        lines.append(
            f"| {name} | {w} | {c} | {kv} | "
            f"{s['token_agreement_mean']:.4f} / {s['token_agreement_min']:.4f} | "
            f"{s['max_logit_drift']:.3f} | {s['norm_drift_max']:.3f} |"
        )
    lines += [
        "",
        "Floors are enforced by tests/test_accuracy.py on this committed JSON "
        "and on a small in-CI sweep.",
        "",
    ]
    with open(out + ".md", "w") as f:
        f.write("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="large_v3")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--out", default="ACCURACY")
    args = ap.parse_args()
    # partial results are flushed after every seed so a wall-clock-limited
    # run still leaves a usable (fewer-seed) artifact on disk
    result = run_sweep(
        args.config, args.seeds, args.steps, args.batch, args.backend,
        on_seed=lambda partial: write_outputs(partial, args.out),
    )
    write_outputs(result, args.out)
    print(json.dumps({k: v["token_agreement_mean"] for k, v in result["variants"].items()}))


if __name__ == "__main__":
    main()
