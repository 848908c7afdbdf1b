"""Drive the distributed Barnes-Hut path ONCE at a production shape on the
virtual CPU mesh (VERDICT r4 #4: every distributed test ran N<=8192; the
staged+octet+LET+reuse combination had never been exercised at a realistic
leaf count).

Shape: N=262144 (BASELINE config 2's N), P=8, staged refinement forced at
leaf 128 (2048 global leaves — the dense plane would be fine here, but the
production >=1M configs resolve staged, so staged is what must be driven),
octet far field (auto), k=8 rebuild interval (the shipped default), ring
AND LET near comm. Reports, per comm mode:

  * overflow (must be 0),
  * sampled rms force error of the final state vs an O(k*N) direct sum
    (must sit in the single-chip MAC class ~1e-3),
  * max |pos| divergence between ring and LET trajectories,
  * the per-step migrant series of the per-step path (debug_exchange) —
    the steady-state exchange-volume observable,
  * wall-clock (CPU jnp kernels; TPU perf is NOT the point — program
    correctness at production shape is).

Usage: PYTHONPATH=. python scripts/dist_production_probe.py [--n 262144]
       [--steps 16] [--devices 8] [--out /tmp/dist_production.json]

Results recorded in docs/DESIGN.md §4 (r8 entry).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.api import init_simulation  # noqa: E402
from parallelnbody_tpu.parallel import make_ring_mesh, shard_state  # noqa: E402
from parallelnbody_tpu.parallel.sharded import sharded_init_accel  # noqa: E402
from parallelnbody_tpu.parallel.distributed import (  # noqa: E402
    make_distributed_run, _dist_reuse_eligible)
from parallelnbody_tpu.utils.accuracy import rms_force_error_sample  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--leaf", type=int, default=128)
    ap.add_argument("--near", type=int, default=1024,
                    help="near budget (explicit: the sharded path does not "
                         "auto-calibrate; 1024 covers the measured plummer "
                         "staged maxima at this shape with headroom)")
    ap.add_argument("--far", type=int, default=2048)
    ap.add_argument("--out", default="/tmp/dist_production.json")
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, ic="plummer", dt=1e-4, softening=0.01,
                    theta=0.72, force="barnes_hut", integrator="leapfrog",
                    bh_leaf_size=args.leaf, bh_refine="staged",
                    bh_near_budget=args.near, bh_far_budget=args.far,
                    bh_multipole=2, bh_distributed=True,
                    bh_rebuild_every=args.k, track_potential=False,
                    dtype="float32")
    assert _dist_reuse_eligible(cfg, args.steps)
    mesh = make_ring_mesh(args.devices)
    state0 = init_simulation(cfg, compute_forces=False)
    state = sharded_init_accel(cfg, mesh, shard_state(state0, mesh))
    report = {"n": args.n, "devices": args.devices, "steps": args.steps,
              "k": args.k, "leaf": args.leaf, "refine": "staged",
              "near_budget": args.near, "far_budget": args.far}

    outs = {}
    for comm in ("ring", "let"):
        c = cfg.replace(bh_comm=comm)
        t0 = time.time()
        run = make_distributed_run(c, mesh, args.steps)
        out, of = run(state)
        out.pos.block_until_ready()
        wall = time.time() - t0
        rms = rms_force_error_sample(out.pos, out.mass, out.acc,
                                     g=c.g, softening=c.softening)
        outs[comm] = out
        report[comm] = {"overflow": int(of), "wall_s": wall,
                        "rms_force_error": float(rms),
                        "steps_done": int(out.step)}
        print(json.dumps({comm: report[comm]}), flush=True)

    dv = float(np.max(np.abs(np.asarray(outs["ring"].pos)
                             - np.asarray(outs["let"].pos))))
    report["ring_vs_let_max_pos_diff"] = dv

    # Per-step migrant series (debug_exchange forces the per-step program):
    # step 0 is the entry exchange (~(P-1)/P of N by construction), the
    # rest is the steady-state boundary-crossing volume.
    t0 = time.time()
    run_dbg = make_distributed_run(cfg, mesh, min(args.steps, 8),
                                   debug_exchange=True)
    out, of, migs = run_dbg(state)
    out.pos.block_until_ready()
    migs = np.asarray(migs)
    report["per_step"] = {
        "overflow": int(of), "wall_s": time.time() - t0,
        "migrants_entry": int(migs[0]),
        "migrants_series": [int(x) for x in migs[1:]],
        "migrants_steady_frac_of_n": float(migs[1:].mean() / args.n)
        if len(migs) > 1 else None,
    }
    print(json.dumps(report, indent=2))
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")


if __name__ == "__main__":
    main()
