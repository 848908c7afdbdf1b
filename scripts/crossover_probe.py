"""Measure the all-pairs / Barnes-Hut crossover N on the real chip.

SimConfig.AUTO_BH_CROSSOVER decides what force="auto" runs; it shipped as an
estimate (131072). This probe measures both methods per N on a Plummer
sphere at the shipped BH operating point (quad, theta=0.72 — the default
config's accuracy class) so the constant can be pinned to the measured
crossover.

Usage: python scripts/crossover_probe.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.api import init_simulation, make_step  # noqa: E402
from parallelnbody_tpu.utils.profiling import force_sync  # noqa: E402


def measure(cfg: SimConfig, iters: int) -> float:
    state = init_simulation(cfg)
    step = make_step(cfg)
    state = step(state)
    force_sync(state.time)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    force_sync(state.time)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[16384, 32768, 65536, 131072, 262144])
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}", flush=True)
    for n in args.sizes:
        row = {"n": n}
        for force in ("direct_pallas", "barnes_hut"):
            cfg = SimConfig(n=n, ic="plummer", softening=0.01, force=force,
                            track_potential=False)
            row[force] = round(measure(cfg, args.iters), 2)
        row["winner"] = min(("direct_pallas", "barnes_hut"),
                            key=lambda k: row[k])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
