"""Observability utilities: stage timers, throughput meters, profiler hooks."""

from whisper_burn_tpu.utils.profiling import StageTimer, ThroughputMeter, trace

__all__ = ["StageTimer", "ThroughputMeter", "trace"]
