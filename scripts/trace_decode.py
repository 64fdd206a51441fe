"""Op-level XPlane trace of the decode step: where does the time go?

The stage breakdown (bench.py) attributes decode wall time to whole
stages; the per-kernel microbenches (exp_*_kernel.py) give each kernel's
efficiency in isolation. This closes the gap between them: it traces a
fori_loop of real decode steps with the JAX profiler and aggregates
device-plane op durations by name, so inter-kernel overhead (fusions,
layout changes, dynamic-update-slices, scan plumbing) becomes visible
next to the Pallas kernels themselves.

Usage (on the TPU chip):
    BENCH_BATCH=64 python scripts/trace_decode.py [--steps 8] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def _xplane_op_durations(trace_dir: str) -> dict[str, float]:
    """Aggregate device-plane event durations (us) by event name from the
    xplane protobuf (no tensorflow dependency: raw proto decode via
    tensorboard_plugin_profile's bundled schema, falling back to xprof)."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            name = plane.name.lower()
            # device planes: "/device:TPU:0" / "TPU:0" / gpu variants
            if "tpu" not in name and "device" not in name:
                continue
            if "host" in name:
                continue
            ev_names = {k: v for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    meta = ev_names.get(ev.metadata_id)
                    if meta is None:
                        continue
                    dur_us = ev.duration_ps / 1e6
                    totals[meta.name] += dur_us
                    counts[meta.name] += 1
    return totals, counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_burn_tpu.models import WhisperConfig
    from whisper_burn_tpu.models.decoder import (
        decode_step,
        fill_cross_cache,
        init_cache,
        prefill,
    )
    from whisper_burn_tpu.models.encoder import encode
    from whisper_burn_tpu.models.params import fabricated_quantized_params
    from whisper_burn_tpu.models.whisper import PROMPT_LEN
    from whisper_burn_tpu.ops import Compute
    from whisper_burn_tpu.transcribe import enable_compilation_cache, prepare_params

    enable_compilation_cache()
    cfg = WhisperConfig.large_v3()
    compute = Compute.fastest(kv_bits=4).replace(quantized_logits=True, w8a8=True)
    params = prepare_params(fabricated_quantized_params(cfg, seed=0), compute)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((BATCH, cfg.n_mels, 3000)).astype(np.float32) * 0.1
    )
    lang = jnp.full((BATCH,), cfg.lang_token_start, jnp.int32)

    enc_out = jax.jit(lambda p, m: encode(p, m, cfg, compute))(params, mel)
    ctx = 256

    @jax.jit
    def setup(p, enc_out, lang):
        cache = init_cache(cfg, BATCH, compute, ctx=ctx)
        cache = fill_cross_cache(p, cfg, enc_out, cache, compute)
        from whisper_burn_tpu.models.config import SOT

        prompt = jnp.stack(
            [
                jnp.full((BATCH,), SOT, jnp.int32),
                lang,
                jnp.full((BATCH,), cfg.transcribe_token, jnp.int32),
                jnp.full((BATCH,), cfg.no_timestamps_token, jnp.int32),
            ],
            axis=1,
        )
        logits, cache = prefill(p, cfg, prompt, cache, compute)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    first, cache = setup(params, enc_out, lang)

    @jax.jit
    def run(p, tok, cache):
        def body(k, carry):
            tok, cache = carry
            logits, cache = decode_step(p, cfg, tok, PROMPT_LEN + k, cache, compute)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        return jax.lax.fori_loop(0, args.steps, body, (tok, cache))

    out = run(params, first, cache)  # compile + warm
    jax.block_until_ready(out)

    import shutil

    trace_dir = "/tmp/wb_decode_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)  # one run per analysis
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        out = run(params, *out)
        jax.block_until_ready(out)

    totals, counts = _xplane_op_durations(trace_dir)
    grand = sum(totals.values())
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"\ndevice-plane total {grand/1e3:.2f} ms over {args.steps} steps "
          f"({grand/args.steps/1e3:.3f} ms/step, B={BATCH})\n")
    print(f"{'us total':>12} {'us/step':>10} {'count':>6}  op")
    for name, us in rows[: args.top]:
        print(f"{us:12.1f} {us/args.steps:10.1f} {counts[name]:6d}  {name[:110]}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {
                    "batch": BATCH,
                    "steps": args.steps,
                    "total_us": grand,
                    "ops": [
                        {"name": n, "us": u, "count": counts[n]} for n, u in rows
                    ],
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
