"""Shared utilities: PRNG discipline, profiling/tracing, structured logging."""

from sept_tpu.utils.logging import MetricsLogger, RunManifest
from sept_tpu.utils.profiling import StepTimer, trace
from sept_tpu.utils.prng import KeySeq, fold_in_name

__all__ = [
    "KeySeq",
    "MetricsLogger",
    "RunManifest",
    "StepTimer",
    "fold_in_name",
    "trace",
]
