"""Measure XLA gather throughput for full-lane-width rows on TPU.

The sub-granularity near-field design packs each 32-particle sub-tile as one
(128,) f32 row ([x*32, y*32, z*32, m*32]); per-target lists then gather
(Ls, B) such rows into a contiguous (Ls, B, 128) buffer the Pallas kernel
streams at full lane efficiency. Whether that design wins is decided by the
effective rate of THIS gather — rows of exactly one lane-tile width, vs the
known-bad shapes (padded (.., 4) rows ~16 GB/s, 1-D lane gathers ~0.5 GB/s).

Also times the same volume as a 4KB-row gather ((n, 4, 256) leaf rows,
round-1's shape) for comparison.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.utils.profiling import force_sync


def timeit(fn, *args, iters=10):
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}", flush=True)

    for n_rows, row_w, ls, b in (
        (32768, 128, 4096, 1024),    # sub-32 packed rows, near-budget gather
        (32768, 128, 4096, 512),
        (8192, 128, 4096, 1024),
        (4096, 1024, 4096, 128),     # leaf-256 rows (4KB), r1-style
        (32768, 8, 4096, 1024),      # narrow rows (pad to 128) for contrast
    ):
        table = jax.random.normal(key, (n_rows, row_w), jnp.float32)
        idx = jax.random.randint(key, (ls, b), 0, n_rows, jnp.int32)

        @jax.jit
        def g(table, idx):
            return jnp.sum(table[idx], axis=1)  # (ls, row_w): forces the gather

        dt = timeit(g, table, idx)
        vol = ls * b * row_w * 4
        print(f"rows ({n_rows:6d},{row_w:5d}) gather ({ls},{b}): "
              f"{dt*1e3:7.2f} ms  {vol/dt/1e9:7.1f} GB/s eff "
              f"({vol/1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
