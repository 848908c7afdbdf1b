"""Profiling and timing helpers.

TPU-native tracing: jax.profiler traces viewable in Perfetto/XProf/
TensorBoard (SURVEY.md §5 "Tracing / profiling" — the reference has none).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Wrap a region in a jax.profiler trace if log_dir is set; no-op
    otherwise. View with `tensorboard --logdir <dir>` or ui.perfetto.dev."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(tree) -> float:
    """Force completion of a pytree's computation and return a host scalar.

    Note: on some backends (e.g. this image's axon tunnel)
    jax.block_until_ready does not actually block; transferring a dependent
    value is the reliable barrier.
    """
    jax.block_until_ready(tree)
    leaf = jax.tree.leaves(tree)[0]
    return float(jax.device_get(jax.numpy.ravel(leaf)[0]))


class StepTimer:
    """Wall-clock steps/sec over a sliding window, with a true device sync."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps0 = 0

    def rate(self, state, steps_done: int) -> float | None:
        force_sync(state.time)
        now = time.perf_counter()
        if self._t0 is None:
            self._t0, self._steps0 = now, steps_done
            return None
        dt = now - self._t0
        ds = steps_done - self._steps0
        self._t0, self._steps0 = now, steps_done
        return ds / dt if dt > 0 else None
