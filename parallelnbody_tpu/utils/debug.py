"""Numerical-health checks (SURVEY.md §5 "Race detection / sanitizers").

JAX's functional model removes data races by construction; the failure modes
that remain are numerical (NaN/Inf from unsoftened close encounters, fp32
overflow) and configuration (mismatched shapes). These helpers are the
sanitizer layer:

  * debug_nans(): context manager enabling jax_debug_nans (XLA raises at the
    op that produced the first NaN).
  * validate_state(): shape/dtype/finiteness audit of a SimState.
  * check_finite(): device-side finite check usable inside jit via
    jax.debug.callback (no host sync on the hot path).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.state import SimState


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StateValidationError(ValueError):
    pass


def validate_state(state: SimState, check_values: bool = True) -> None:
    """Host-side audit: shapes, dtypes, finiteness, positive masses."""
    n = state.pos.shape[0]
    expect = {"pos": (n, 3), "vel": (n, 3), "acc": (n, 3),
              "mass": (n,), "pot": (n,)}
    for name, shape in expect.items():
        arr = getattr(state, name)
        if arr.shape != shape:
            raise StateValidationError(f"{name}: shape {arr.shape} != {shape}")
        if arr.dtype != state.pos.dtype:
            raise StateValidationError(
                f"{name}: dtype {arr.dtype} != {state.pos.dtype}")
    if check_values:
        for name in expect:
            a = np.asarray(jax.device_get(getattr(state, name)))
            if not np.all(np.isfinite(a)):
                bad = int(np.sum(~np.isfinite(a)))
                raise StateValidationError(f"{name}: {bad} non-finite values")
        if np.any(np.asarray(jax.device_get(state.mass)) < 0):
            raise StateValidationError("mass: negative values")


def check_finite(tag: str, *arrays) -> None:
    """Inside-jit finite assertion. Cheap reduction on device; reports via
    debug callback only when violated."""
    flags = jnp.stack([jnp.all(jnp.isfinite(a)) for a in arrays])

    def report(ok):
        if not bool(np.all(ok)):
            raise FloatingPointError(f"non-finite values detected at {tag!r}")

    jax.debug.callback(report, flags)
