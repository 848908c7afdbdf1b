"""Probe: does input-state donation (cfg.donate_state) make the N=16M
fused rebuild-interval block fit reliably on one v5e chip?

Context (docs/DESIGN.md r7, api._REUSE_MAX_ROWS): the 16M fused-reuse run
measured -8% vs per-step ONCE (4553.9 ms/step), then faulted with a TPU
device error on identical code in a later session — a marginal,
environment-dependent HBM fit. The resident set at fault time includes the
caller's un-donated input SimState (11 f32 columns = 704 MB at 16M) held
live across the whole run call. Donation hands those buffers to XLA.

Usage (each invocation is ONE fresh process — the fit question is about a
cold process, run it several times):

    PYTHONPATH=/root/repo:/root/.axon_site timeout 570 \
        python scripts/donate_probe.py --n 16777216 [--no-donate] [--k 8]

Prints one JSON line {n, donate, rebuild_every, ms_per_step, overflow,
compile_plus_first_s} or the fault traceback.
"""

import argparse
import json
import time

import parallelnbody_tpu.api as api
from parallelnbody_tpu.api import init_simulation, make_run
from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.utils.profiling import force_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16777216)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--sections", type=int, default=0)
    args = ap.parse_args()

    # The bench_suite 16M operating point (staged leaf-256, measured-budget
    # headroom), plus the reuse interval under probe.
    cfg = SimConfig(n=args.n, force="barnes_hut", theta=0.72,
                    bh_leaf_size=256, bh_refine="staged",
                    bh_near_budget=512, bh_far_budget=3072,
                    bh_cand_budget=512, bh_cand2_budget=256,
                    bh_sections=args.sections,
                    track_potential=False, ic="plummer",
                    integrator="leapfrog", softening=0.01, dt=1e-4,
                    bh_rebuild_every=args.k,
                    donate_state=not args.no_donate)

    # Lift the capacity gate for the experiment: the probe's whole point is
    # to re-measure the boundary with donation in play.
    api._REUSE_MAX_ROWS = max(api._REUSE_MAX_ROWS, args.n)
    assert api._reuse_eligible(cfg, args.steps), "probe config not eligible"

    t0 = time.perf_counter()
    state = init_simulation(cfg)
    run = make_run(cfg, args.steps, report_overflow=True)
    state, of = run(state)  # compile + first block (consumes state)
    force_sync(state.time)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, of = run(state)
    force_sync(state.time)
    ms = (time.perf_counter() - t0) / args.steps * 1e3

    print(json.dumps({
        "n": args.n, "donate": cfg.donate_state, "rebuild_every": args.k,
        "sections": args.sections, "ms_per_step": ms,
        "overflow": int(of), "compile_plus_first_s": t_compile,
    }))


if __name__ == "__main__":
    main()
