"""Measure what cfg.donate_state saves, from the compiler's own ledger.

The axon tunnel exposes no runtime memory_stats, but XLA's AOT
memory_analysis() reports the compiled program's argument/output/temp/alias
sizes — donation shows up as input->output buffer aliasing, shrinking the
peak footprint the runtime must reserve (arguments + outputs + temps -
aliased). This is the precise, honest form of "donation frees one copy of
the state".

    PYTHONPATH=/root/repo:/root/.axon_site timeout 570 \
        python scripts/donate_mem.py --n 1048576 [--k 8] [--steps 16]

    # distributed fused run (CPU mesh, P virtual devices):
    python scripts/donate_mem.py --n 262144 --k 8 --devices 8 [--comm let]

Prints one JSON line per variant {donate, path, argument_mb, output_mb,
temp_mb, alias_mb, peak_mb} where peak = argument + output + temp - alias.
`path` is the program actually compiled (reuse / per-step / distributed_*)
— at N past api._REUSE_MAX_ROWS the gate is lifted to match the documented
reuse measurements (ADVICE r4: without the lift, make_run silently compiled
the per-step program and the ledger measured the wrong thing).
"""

import argparse
import json
import os
import sys


def analyze(run, state, label, donate):
    compiled = run.lower(state).compile()
    m = compiled.memory_analysis()
    if m is None:
        return {"donate": donate, "path": label, "memory_analysis": None}
    mb = 1.0 / (1 << 20)
    arg = m.argument_size_in_bytes * mb
    out = m.output_size_in_bytes * mb
    tmp = m.temp_size_in_bytes * mb
    alias = m.alias_size_in_bytes * mb
    return {
        "donate": donate, "path": label,
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
    ap.add_argument("--devices", type=int, default=0,
                    help="compile make_distributed_run over a P-device CPU "
                         "mesh instead of the single-chip make_run (forces "
                         "JAX_PLATFORMS=cpu with virtual devices)")
    ap.add_argument("--comm", choices=("ring", "let"), default="ring")
    ap.add_argument("--skip-init-forces", action="store_true",
                    help="skip the t=0 force evaluation when building the "
                         "probe state (the AOT ledger only needs shapes; at "
                         "capacity-probe N the t=0 eval is itself the fault "
                         "risk being measured)")
    args = ap.parse_args()

    if args.devices:
        os.environ.setdefault("XLA_FLAGS", "")
        if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
            os.environ["XLA_FLAGS"] += (
                f" --xla_force_host_platform_device_count={args.devices}")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from parallelnbody_tpu import api
    from parallelnbody_tpu.api import init_simulation, make_run
    from parallelnbody_tpu.config import SimConfig

    cfg = SimConfig(n=args.n, force="barnes_hut", theta=0.72,
                    bh_near_budget=3584, bh_far_budget=2816,
                    track_potential=False, ic="plummer",
                    integrator="leapfrog", softening=0.01, dt=1e-4,
                    bh_rebuild_every=args.k, bh_comm=args.comm)
    if args.n >= (1 << 22):
        cfg = cfg.replace(bh_leaf_size=256, bh_refine="staged",
                          bh_near_budget=512, bh_far_budget=3072,
                          bh_cand_budget=512, bh_cand2_budget=256)

    if args.devices:
        from parallelnbody_tpu.parallel import make_ring_mesh, shard_state
        from parallelnbody_tpu.parallel.distributed import (
            _dist_reuse_eligible, make_distributed_run)

        cfg = cfg.replace(bh_distributed=True,
                          mesh_shape=(args.devices,))
        mesh = make_ring_mesh(args.devices)
        state = shard_state(init_simulation(cfg, compute_forces=False), mesh)
        label = ("distributed_reuse"
                 if _dist_reuse_eligible(cfg, args.steps)
                 else "distributed_per_step")
        variants = {"off": (False,), "on": (True,), "both": (False, True)}
        for donate in variants[args.only]:
            run = make_distributed_run(cfg.replace(donate_state=donate),
                                       mesh, args.steps)
            print(json.dumps(analyze(run, state, label, donate)), flush=True)
        return

    # The documented reuse ledger rows (8M/16M) sit past the conservative
    # capacity gate; lift it so the compiled program IS the reuse program
    # (the gate guards runtime faults, not compilation).
    api._REUSE_MAX_ROWS = max(api._REUSE_MAX_ROWS, args.n)
    label = ("reuse" if api._reuse_eligible(cfg, args.steps) else "per_step")
    if args.k > 1 and label != "reuse":
        print(f"WARNING: k={args.k} requested but config is reuse-ineligible"
              f" — compiling the per-step program", file=sys.stderr)
    state = init_simulation(cfg,
                            compute_forces=not args.skip_init_forces)
    variants = {"off": (False,), "on": (True,), "both": (False, True)}
    for donate in variants[args.only]:
        run = make_run(cfg.replace(donate_state=donate), args.steps,
                       report_overflow=True)
        print(json.dumps(analyze(run, state, label, donate)), flush=True)


if __name__ == "__main__":
    main()
