"""Persistent XLA compilation cache.

Large configs pay 2-4 minutes of XLA compilation per process on this
hardware (BENCH_RESULTS.md compile+first column: 123 s at N=1M, 207 s at
the sectioned N=32M) — every CLI invocation, restart, or resumed run pays
it again. JAX's persistent compilation cache keys compiled executables by
(HLO, compiler flags, device kind) and works through the remote TPU
backend: measured 151.8 s -> 6.9 s (22x) for a cold second process on the
N=262k Barnes-Hut step.

Not enabled by default: benchmark artifacts must report HONEST cold
compile times (bench.py / scripts/bench_suite.py never enable it), and a
stale cache directory after a jax upgrade is a debugging trap the user
should opt into knowingly (`--compile-cache-dir DIR` on every CLI subcommand,
or cfg.compile_cache_dir).

The reference has no analogue (UE4 recompiles Blueprint/C++ at build
time); this is TPU-operational surface.
"""

from __future__ import annotations

import jax

_enabled_dir: str | None = None


def enable_compile_cache(path: str) -> None:
    """Idempotently point JAX's persistent compilation cache at `path`
    (created on first write). Safe to call before or after backend init;
    repeated calls with the same path are no-ops."""
    global _enabled_dir
    if not path or _enabled_dir == path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    _enabled_dir = path
