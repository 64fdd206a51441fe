"""Collective-instruction audit of compiled sharded programs (VERDICT r3 #10).

The DP/TP design claims are structural: utterance data-parallelism adds
ZERO decode-time communication, and tensor parallelism communicates only
through the row-parallel psums (all-reduce) — never gathers or reshards.
These are asserted by counting collective instructions in the compiled
HLO (tests/test_collectives.py fails if a future change adds one), and
reported per mesh configuration in SCALING.md (scripts/scaling_report.py).
"""

from __future__ import annotations

import re

# HLO collective op mnemonics (XLA SPMD/shard_map lowering targets)
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
)


def count_collectives(hlo_text: str) -> dict[str, int]:
    """Static instruction counts per collective kind in compiled HLO text.

    Counts instruction *sites* (``= op-name(`` occurrences incl. -start/
    -done pairs collapsed to starts), not dynamic executions — a psum
    inside a scanned layer body appears once regardless of layer count.
    """
    counts = {}
    for op in COLLECTIVE_OPS:
        # match "all-reduce(", "all-reduce-start(", "%all-reduce.12 ="
        n = len(re.findall(rf"= {op}(?:-start)?[.(]", hlo_text))
        n += len(re.findall(rf"= \S+ {op}(?:-start)?\(", hlo_text))
        counts[op] = n
    return counts


def compiled_decode_hlo(
    cfg, compute, mesh, params, mel, lang_tokens, *, max_tokens: int = 8,
    beam_width: int = 1,
) -> str:
    """Lower + compile the shard_map decode program, return its HLO text."""
    from whisper_burn_tpu.parallel.sharded import _build

    fn = _build(
        cfg, compute, mesh,
        beam_width=beam_width, detect=False, max_tokens=max_tokens,
        task="transcribe", length_penalty=1.0,
    )
    compiled = fn.lower(params, mel, lang_tokens).compile()
    return "\n".join(m.to_string() for m in compiled.runtime_executable().hlo_modules())


def audit_mesh(cfg, compute, mesh, params, mel, lang_tokens, *, max_tokens: int = 8,
               beam_width: int = 1):
    """(collective counts, total) for the compiled decode at this mesh."""
    hlo = compiled_decode_hlo(
        cfg, compute, mesh, params, mel, lang_tokens, max_tokens=max_tokens,
        beam_width=beam_width,
    )
    counts = count_collectives(hlo)
    return counts, sum(counts.values())
