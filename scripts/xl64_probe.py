"""Attempt N=64M Barnes-Hut on ONE chip (runtime probe for the r5 ledger).

The compiled memory ledger (scripts/donate_mem.py --n 67108864
--skip-init-forces) says the 64M per-step program does NOT fit undonated
but DOES fit with cfg.donate_state:

    undonated: args 3.5 + out 3.5 + temps 10.7 GB = peak 17.85 GB  (> 15.75)
    donated:   input aliased onto the output         peak 14.53 GB (fits)

So "beyond 32M, the distributed path" (CLAUDE.md r6) is only true for the
undonated program — donation, built as the capacity lever in r4, is what
decides whether this scale exists single-chip at all. This probe is the
runtime attempt: one donated make_step at N=64M (staged lists, auto 16
sections at 262144 leaves), timed evals with the overflow counter and a
sampled rms force error so a success row is physics-validated, not just
"it didn't fault".

The t=0 force evaluation is skipped (compute_forces=False): it is a
SECOND multi-minute 64M compile whose only role is leapfrog's first
half-kick (dt 1e-4 — immaterial for a capacity probe), and the rms is
measured against the step's own output forces, which are a genuine 64M
Barnes-Hut evaluation either way.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        scripts/xl64_probe.py [--n 67108864] [--iters 2] \
        [--cache /tmp/xla64cache] [--no-donate]
"""

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
from parallelnbody_tpu.utils.accuracy import rms_force_error_sample  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=67108864)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--cache", type=str, default="/tmp/xla64cache",
                    help="persistent compile cache dir (retries after a "
                         "tunnel timeout skip the multi-minute compile); "
                         "'' disables")
    ap.add_argument("--no-donate", action="store_true",
                    help="attempt the undonated program (the ledger says "
                         "17.85 GB > HBM — expected to fail; kept so the "
                         "boundary stays re-measurable)")
    args = ap.parse_args()

    # The shipped >=4M static budget tier (config.resolve_* defaults); the
    # overflow counter validates them at this scale.
    cfg = SimConfig(n=args.n, force="barnes_hut", theta=0.72,
                    ic="plummer", integrator="leapfrog", softening=0.01,
                    dt=1e-4, track_potential=False, bh_leaf_size=256,
                    bh_refine="staged", bh_near_budget=512,
                    bh_far_budget=3072, bh_cand_budget=512,
                    bh_cand2_budget=256,
                    donate_state=not args.no_donate,
                    compile_cache_dir=args.cache)

    t0 = time.perf_counter()
    state = init_simulation(cfg, compute_forces=False)
    force_sync(state.time)
    t_init = time.perf_counter() - t0
    print(json.dumps({"phase": "init", "n": args.n, "s": round(t_init, 1),
                      "donate": cfg.donate_state}), flush=True)

    step = make_step(cfg, report_overflow=True)
    t0 = time.perf_counter()
    state, of = step(state)
    force_sync(state.time)
    t_compile_first = time.perf_counter() - t0
    print(json.dumps({"phase": "compile+first",
                      "s": round(t_compile_first, 1),
                      "overflow_step1": int(jax.device_get(of))}),
          flush=True)

    of_total = 0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, of = step(state)
        of_total += int(jax.device_get(of))
    force_sync(state.time)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    rms = rms_force_error_sample(state.pos, state.mass, state.acc,
                                 g=cfg.g, softening=cfg.softening)
    print(json.dumps({"phase": "steady", "ms_per_step": round(ms, 1),
                      "overflow": of_total, "rms": float(rms)}),
          flush=True)


if __name__ == "__main__":
    main()
