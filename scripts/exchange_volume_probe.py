"""Measure the persistent distributed run's per-step exchange volume.

The steady-state claim (parallel/distributed.py make_distributed_run): the
persistently key-sharded scan only exchanges boundary-crossing MIGRANTS per
step, so after the entry exchange the per-step volume is near-empty. This
probe measures it (VERDICT r3 weak #7 / next #6): migrants-per-step over a
real trajectory at P=8 on the virtual CPU mesh, for an equilibrium state
(plummer, virialized) and a violently collapsing one (cold_sphere through
its collapse, the worst case for key churn).

Usage: JAX_PLATFORMS=cpu python scripts/exchange_volume_probe.py
       [--n 65536] [--steps 200] [--dt 0.002]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.api import init_simulation  # noqa: E402
from parallelnbody_tpu.parallel import make_ring_mesh, shard_state  # noqa: E402
from parallelnbody_tpu.parallel.sharded import sharded_init_accel  # noqa: E402
from parallelnbody_tpu.parallel.distributed import make_distributed_run  # noqa: E402


def run_case(name, cfg, steps, n_dev=8):
    mesh = make_ring_mesh(n_dev)
    state = shard_state(init_simulation(cfg, compute_forces=False), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    run = make_distributed_run(cfg, mesh, steps, debug_exchange=True)
    out, ovf, migrants = run(state)
    mig = np.asarray(jax.device_get(migrants)).astype(np.int64)
    n = cfg.n
    frac = mig / n
    entry, steady = frac[0], frac[1:]
    rec = {
        "case": name, "n": n, "ranks": n_dev, "steps": steps,
        "dt": cfg.dt, "overflow": int(jax.device_get(ovf)),
        "entry_exchange_frac": float(entry),
        "steady_mean_frac": float(steady.mean()),
        "steady_p90_frac": float(np.percentile(steady, 90)),
        "steady_max_frac": float(steady.max()),
        "steady_mean_migrants_per_step": float(mig[1:].mean()),
        "final_time": float(jax.device_get(out.time)),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=0.004)
    # Migration statistics depend on the trajectory, not on MAC tightness;
    # theta=0.9 keeps the CPU-mesh jnp near field tractable (theta=0.5 at
    # n=65536 measured >1 h per case on this rig's 8-virtual-device pool).
    ap.add_argument("--theta", type=float, default=0.9)
    # Generous exchange capacities by default: at probe-scale shards
    # (n/P ~ 2k) the collapse case clips own_cap at the default 0.25
    # slack, and a table with nonzero overflow measures a broken run.
    ap.add_argument("--own-slack", type=float, default=1.0)
    ap.add_argument("--pair-slack", type=float, default=4.0)
    args = ap.parse_args()

    common = dict(n=args.n, force="barnes_hut", softening=0.01,
                  theta=args.theta,
                  integrator="leapfrog", bh_leaf_size=64,
                  bh_near_budget=1024, bh_far_budget=2048, dt=args.dt,
                  bh_own_slack=args.own_slack, bh_pair_slack=args.pair_slack)
    run_case("plummer (virialized equilibrium)",
             SimConfig(ic="plummer", virialize=True, **common), args.steps)
    # Cold collapse: free-fall time ~1.1 at G=M=R=1; steps*dt runs through
    # a large fraction of the collapse — the worst case for key churn.
    run_case("cold_sphere (violent collapse)",
             SimConfig(ic="cold_sphere", **common), args.steps)


if __name__ == "__main__":
    main()
