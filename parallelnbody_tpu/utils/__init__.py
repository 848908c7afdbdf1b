"""Auxiliary subsystems: snapshot/trajectory IO, checkpointing, metrics,
profiling, debugging (SURVEY.md §5 — the reference has none of these)."""

from parallelnbody_tpu.utils.io import (
    save_snapshot,
    load_snapshot,
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
    TrajectoryWriter,
)
from parallelnbody_tpu.utils.metrics import MetricsLogger
from parallelnbody_tpu.utils.profiling import profile_trace, StepTimer

__all__ = [
    "save_snapshot",
    "load_snapshot",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "TrajectoryWriter",
    "MetricsLogger",
    "profile_trace",
    "StepTimer",
]
