"""Tracing/profiling: the TPU counterpart of the reference's observability.

The reference uses the ``tracing`` crate + a single wall-clock Instant
(SURVEY §5: src/transcribe.rs:84-92, src/bin/main.rs:4). Here:

* :class:`StageTimer` — named wall-clock stages with device sync, logged
  through the standard ``logging`` module;
* :class:`ThroughputMeter` — audio-seconds/s and token/s counters;
* :func:`trace` — context manager around ``jax.profiler`` emitting XPlane
  traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger("whisper_burn_tpu")


class StageTimer:
    """Accumulates wall-clock time per named stage.

    ``sync=True`` blocks on device work so stage boundaries are honest
    (JAX dispatch is async).
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                import jax

                if result is not None:
                    jax.block_until_ready(result)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            logger.debug("stage %s: %.1f ms", name, dt * 1e3)

    def report(self) -> str:
        lines = [
            f"{name}: {total * 1e3:.1f} ms total, "
            f"{total / self.counts[name] * 1e3:.1f} ms avg x{self.counts[name]}"
            for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@dataclass
class ThroughputMeter:
    """Audio-seconds/s and tokens/s over a measurement window."""

    audio_seconds: float = 0.0
    tokens: int = 0
    wall_seconds: float = 0.0
    _start: float | None = field(default=None, repr=False)

    def begin(self) -> None:
        self._start = time.perf_counter()

    def end(self, audio_seconds: float, tokens: int = 0) -> None:
        assert self._start is not None, "begin() not called"
        self.wall_seconds += time.perf_counter() - self._start
        self.audio_seconds += audio_seconds
        self.tokens += tokens
        self._start = None

    @property
    def audio_s_per_s(self) -> float:
        return self.audio_seconds / max(self.wall_seconds, 1e-9)

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / max(self.wall_seconds, 1e-9)


@contextlib.contextmanager
def trace(log_dir: str):
    """XPlane trace of everything inside the block (TensorBoard-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
