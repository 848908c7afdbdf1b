"""Count the collective schedule: per-step vs rebuild-interval distributed runs.

The distributed rebuild interval (parallel/distributed.py, bh_rebuild_every)
claims to remove k-1 repartitions (sample-sort all_to_all + splitter/bound
collectives) and k-1 traversal/list builds per block of k steps. Collective
LATENCY is unmeasurable on a 1-chip rig — but the collective COUNT is a
property of the program, not the hardware: static shapes mean the traced
schedule IS the communication a real slice executes. This probe walks the
jaxpr of both runs, counting collective primitives with scan bodies
weighted by their trip counts (exact, trip-aware — unlike grepping HLO,
where a scan body appears once regardless of length).

Usage: python scripts/dist_collectives_probe.py [--n 8192] [--steps 16]
       [--k 8] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COLLECTIVES = ("all_to_all", "ppermute", "all_gather", "psum", "pmin",
               "pmax", "reduce_scatter")


def count_collectives(jaxpr, weight=1, acc=None):
    """Recursive, trip-weighted collective-primitive counts of a jaxpr."""
    acc = {} if acc is None else acc
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if any(name.startswith(c) for c in COLLECTIVES):
            acc[name] = acc.get(name, 0) + weight
        w = weight
        if name == "scan":
            w = weight * eqn.params["length"]
        elif name == "while":
            # bounded fori_loop lowered to while: trip count not static in
            # params; none of the distributed runs use one at this level.
            w = weight
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):        # ClosedJaxpr
                count_collectives(sub.jaxpr, w, acc)
            elif hasattr(sub, "eqns"):       # raw Jaxpr
                count_collectives(sub, w, acc)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        count_collectives(s.jaxpr, w, acc)
                    elif hasattr(s, "eqns"):
                        count_collectives(s, w, acc)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--comm", default="ring", choices=("ring", "let"))
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from parallelnbody_tpu.config import SimConfig
    from parallelnbody_tpu.api import init_simulation
    from parallelnbody_tpu.parallel import make_ring_mesh, shard_state
    from parallelnbody_tpu.parallel.distributed import make_distributed_run

    cfg = SimConfig(n=args.n, ic="plummer", dt=1e-4, softening=0.01,
                    force="barnes_hut", bh_leaf_size=32, bh_near_budget=256,
                    bh_far_budget=512, bh_distributed=True,
                    bh_comm=args.comm)
    mesh = make_ring_mesh(args.devices)
    state = shard_state(init_simulation(cfg, compute_forces=False), mesh)

    def schedule(run):
        jaxpr = jax.make_jaxpr(run)(state)
        c = count_collectives(jaxpr.jaxpr)
        return c, sum(c.values())

    c1, t1 = schedule(make_distributed_run(cfg, mesh, args.steps))
    ck, tk = schedule(make_distributed_run(
        cfg.replace(bh_rebuild_every=args.k), mesh, args.steps))
    print(json.dumps({
        "n": args.n, "steps": args.steps, "k": args.k,
        "devices": args.devices, "comm": args.comm,
        "per_step_run": {"counts": c1, "total": t1,
                         "per_step": t1 / args.steps},
        "reuse_run": {"counts": ck, "total": tk,
                      "per_step": tk / args.steps},
        "reduction": 1.0 - tk / t1,
    }, indent=2))


if __name__ == "__main__":
    main()
