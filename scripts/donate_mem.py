"""Measure what cfg.donate_state saves, from the compiler's own ledger.

The axon tunnel exposes no runtime memory_stats, but XLA's AOT
memory_analysis() reports the compiled program's argument/output/temp/alias
sizes — donation shows up as input->output buffer aliasing, shrinking the
peak footprint the runtime must reserve (arguments + outputs + temps -
aliased). This is the precise, honest form of "donation frees one copy of
the state".

    PYTHONPATH=/root/repo:/root/.axon_site timeout 570 \
        python scripts/donate_mem.py --n 1048576 [--k 8] [--steps 16]

Prints one JSON line per variant {donate, argument_mb, output_mb, temp_mb,
alias_mb, peak_mb} where peak = argument + output + temp - alias.
"""

import argparse
import json


from parallelnbody_tpu.api import init_simulation, make_run
from parallelnbody_tpu.config import SimConfig


def analyze(cfg, n_steps, state):
    run = make_run(cfg, n_steps, report_overflow=True)  # already jitted
    compiled = run.lower(state).compile()
    m = compiled.memory_analysis()
    if m is None:
        return {"donate": cfg.donate_state, "memory_analysis": None}
    mb = 1.0 / (1 << 20)
    arg = m.argument_size_in_bytes * mb
    out = m.output_size_in_bytes * mb
    tmp = m.temp_size_in_bytes * mb
    alias = m.alias_size_in_bytes * mb
    return {
        "donate": cfg.donate_state,
        "argument_mb": round(arg, 1), "output_mb": round(out, 1),
        "temp_mb": round(tmp, 1), "alias_mb": round(alias, 1),
        "peak_mb": round(arg + out + tmp - alias, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--only", choices=("off", "on", "both"), default="both",
                    help="which donate variant(s) to compile — large-N "
                         "compiles can need one process per variant to fit "
                         "a timeout window")
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, force="barnes_hut", theta=0.72,
                    bh_near_budget=3584, bh_far_budget=2816,
                    track_potential=False, ic="plummer",
                    integrator="leapfrog", softening=0.01, dt=1e-4,
                    bh_rebuild_every=args.k)
    if args.n >= (1 << 22):
        cfg = cfg.replace(bh_leaf_size=256, bh_refine="staged",
                          bh_near_budget=512, bh_far_budget=3072,
                          bh_cand_budget=512, bh_cand2_budget=256)
    state = init_simulation(cfg)
    variants = {"off": (False,), "on": (True,), "both": (False, True)}
    for donate in variants[args.only]:
        print(json.dumps(analyze(cfg.replace(donate_state=donate),
                                 args.steps, state)), flush=True)


if __name__ == "__main__":
    main()
