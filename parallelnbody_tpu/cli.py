"""Command-line interface — the L4 control layer.

The reference's L4 is a UMG widget (BP_ScreenUI: particle count / dt / box
size text boxes, pause + octree checkboxes, restart button, FPS readout —
SURVEY.md C17) driving the actor API. The TPU framework's control surface is
this CLI driving the same lifecycle:

    run        CreateSpacePoints + Tick loop (with snapshots/metrics/ckpts)
    bench      throughput measurement (pairs/s, steps/s)
    oracle     energy-drift report vs the native C++ direct-sum oracle
    info       devices / backend / config echo

Every reference hardcode (N, dt, theta, G, box size) is a flag here.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import numpy as np

from parallelnbody_tpu.config import SimConfig, reference_compat_config
from parallelnbody_tpu.state import SimState


def _add_config_flags(p: argparse.ArgumentParser):
    p.add_argument("--config", type=str, default=None,
                   help="JSON config file (flags override it)")
    for f in dataclasses.fields(SimConfig):
        name = "--" + f.name.replace("_", "-")
        if f.name in ("mesh_shape", "mesh_axes"):
            continue
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=None)
        elif isinstance(f.default, int):
            p.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float):
            p.add_argument(name, type=float, default=None)
        else:
            p.add_argument(name, type=str, default=None)
    p.add_argument("--devices", type=int, default=0,
                   help="shard over this many devices (0 = single device)")
    p.add_argument("--compat", action="store_true",
                   help="reference-compat profile (G=1e4, slab ICs, "
                        "semi-implicit Euler, theta=1, no softening)")


def _build_config(args) -> SimConfig:
    if args.compat:
        cfg = reference_compat_config(n=args.n or 1024,
                                      size=args.ic_size or 200.0)
    elif args.config:
        cfg = SimConfig.from_json(open(args.config).read())
    else:
        cfg = SimConfig()
    overrides = {}
    for f in dataclasses.fields(SimConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    if args.devices:
        overrides["mesh_shape"] = (args.devices,)
    return cfg.replace(**overrides)


# ------------------------------------------------------------------------ run
def cmd_run(args) -> int:
    from parallelnbody_tpu.api import init_simulation, make_run, make_step, make_accel_fn
    from parallelnbody_tpu.ops import energy as energy_ops
    from parallelnbody_tpu.utils.io import (
        TrajectoryWriter, save_checkpoint, latest_checkpoint, load_checkpoint)
    from parallelnbody_tpu.utils.metrics import MetricsLogger
    from parallelnbody_tpu.utils.profiling import profile_trace, force_sync

    cfg = _build_config(args)

    state = None
    if args.resume:
        ckpt = latest_checkpoint(cfg.checkpoint_dir)
        if ckpt:
            state, cfg = load_checkpoint(ckpt)
            # Explicit CLI flags still win over the checkpointed config (the
            # mesh decision below is then derived from the final cfg).
            overrides = {f.name: getattr(args, f.name)
                         for f in dataclasses.fields(SimConfig)
                         if getattr(args, f.name, None) is not None
                         and f.name != "n"}
            if args.devices:
                overrides["mesh_shape"] = (args.devices,)
            cfg = cfg.replace(**overrides)
            print(f"resumed from {ckpt} at step {int(state.step)}", file=sys.stderr)

    sharded = cfg.n_devices > 1
    if sharded:
        from parallelnbody_tpu.parallel import make_ring_mesh, shard_state
        from parallelnbody_tpu.parallel.sharded import (
            make_sharded_step, sharded_init_accel)

        mesh = make_ring_mesh(cfg.n_devices)

    if state is None:
        state = init_simulation(cfg)

    if cfg.resolve_force() == "barnes_hut":
        # Budget audit (single-chip and sharded runs alike — run it on the
        # not-yet-sharded state): clipped interaction-list entries are lost
        # forces, so surface the overflow before a long run (see ops/bh.py).
        from parallelnbody_tpu.ops.bh import bh_accel, use_pallas_bh

        _, _, ovf = bh_accel(
            state.pos, state.mass, leaf_size=cfg.bh_leaf_size,
            theta=cfg.theta, g=cfg.g, softening=cfg.softening,
            near_budget=cfg.bh_near_budget, far0_budget=cfg.bh_far_budget,
            use_pallas=use_pallas_bh(), curve=cfg.bh_curve,
            multipole=cfg.bh_multipole, max_levels=cfg.bh_max_levels)
        ovf = int(jax.device_get(ovf))
        if ovf and not args.quiet:
            print(f"WARNING: Barnes-Hut budgets clipped {ovf} interaction-list "
                  f"entries; raise --bh-near-budget/--bh-far-budget or theta "
                  f"(forces are degraded for the affected particles)",
                  file=sys.stderr)

    if sharded:
        state = shard_state(state, mesh)
        state = sharded_init_accel(cfg, mesh, state)
        step_fn = make_sharded_step(cfg, mesh)

        def run_k(s, k):
            for _ in range(k):
                s = step_fn(s)
            return s
    else:
        runs = {}

        def run_k(s, k):
            if k not in runs:
                runs[k] = make_run(cfg, k)
            return runs[k](s)

    traj = TrajectoryWriter(cfg.snapshot_dir, cfg) if cfg.snapshot_every else None
    metrics = MetricsLogger(args.metrics, echo=not args.quiet)

    pot_fn = None
    if not cfg.track_potential:
        # Hot steps skip the per-step potential (pot stays zeros); recompute
        # it at diagnostics cadence so logged energy/drift are meaningful
        # (mirrors api.Simulation.diagnostics).
        _accel_pot = make_accel_fn(cfg.replace(track_potential=True), state.mass)
        pot_fn = jax.jit(lambda pos: _accel_pot(pos)[1])

    def diag(s: SimState) -> dict:
        if pot_fn is not None:
            s = s._replace(pot=pot_fn(s.pos))
        d = {k: float(v) for k, v in energy_ops.diagnostics(s).items()}
        return d

    d0 = diag(state)
    e0 = d0["energy"]
    metrics.log(d0)

    # Cadence: the host loop advances in segments of the gcd of all the
    # "every K steps" knobs, each segment one fused scan on device.
    import math

    cadences = [c for c in (cfg.log_every, cfg.snapshot_every,
                            cfg.checkpoint_every) if c > 0]
    seg = math.gcd(*cadences) if cadences else cfg.steps
    seg = max(1, min(seg, cfg.steps))

    t_start = time.perf_counter()
    done = 0
    last_t = t_start
    with profile_trace(args.profile_dir):
        while done < cfg.steps:
            k = min(seg, cfg.steps - done)
            state = run_k(state, k)
            done += k
            step_now = int(force_sync(state.step))
            now = time.perf_counter()
            record = {}
            if cfg.log_every and done % cfg.log_every == 0:
                record = diag(state)
                record["energy_drift"] = (record["energy"] - e0) / abs(e0 or 1.0)
                record["steps_per_sec"] = k / (now - last_t)
                metrics.log(record)
            last_t = now
            if traj and cfg.snapshot_every and done % cfg.snapshot_every == 0:
                traj.append(state)
            if cfg.checkpoint_every and done % cfg.checkpoint_every == 0:
                save_checkpoint(cfg.checkpoint_dir, state, cfg)

    total = time.perf_counter() - t_start
    d1 = diag(state)
    summary = {
        "steps": cfg.steps,
        "n": cfg.n,
        "force": cfg.resolve_force(),
        "wall_s": total,
        "steps_per_sec": cfg.steps / total,
        "energy_drift": (d1["energy"] - e0) / abs(e0 or 1.0),
        "momentum_norm": d1["momentum_norm"],
    }
    print(json.dumps(summary))
    metrics.close()
    return 0


# ---------------------------------------------------------------------- bench
def cmd_bench(args) -> int:
    from parallelnbody_tpu.api import init_simulation, make_step
    from parallelnbody_tpu.utils.profiling import force_sync

    cfg = _build_config(args)
    state = init_simulation(cfg)
    step = make_step(cfg)
    state = step(state)
    force_sync(state.time)
    iters = args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    force_sync(state.time)
    dt = (time.perf_counter() - t0) / iters
    method = cfg.resolve_force()
    out = {
        "n": cfg.n,
        "force": method,
        "ms_per_step": dt * 1e3,
        "steps_per_sec": 1.0 / dt,
    }
    if method in ("direct", "direct_pallas"):
        out["interactions_per_sec"] = cfg.n * cfg.n / dt
    print(json.dumps(out))
    return 0


# --------------------------------------------------------------------- oracle
def cmd_oracle(args) -> int:
    """Energy-drift parity vs the native C++ double-precision oracle."""
    from parallelnbody_tpu.api import init_simulation, make_run
    from parallelnbody_tpu.native import Oracle

    cfg = _build_config(args)
    state = init_simulation(cfg)
    pos0 = np.asarray(jax.device_get(state.pos))
    vel0 = np.asarray(jax.device_get(state.vel))
    mass = np.asarray(jax.device_get(state.mass))

    oracle = Oracle(g=cfg.g, softening=cfg.softening)
    e0 = oracle.total_energy(pos0, vel0, mass)
    out = make_run(cfg, cfg.steps)(state)
    pos1 = np.asarray(jax.device_get(out.pos))
    vel1 = np.asarray(jax.device_get(out.vel))
    e1 = oracle.total_energy(pos1, vel1, mass)
    drift = abs((e1 - e0) / e0) if e0 else float("nan")

    report = {"n": cfg.n, "steps": cfg.steps, "force": cfg.resolve_force(),
              "integrator": cfg.integrator, "energy_initial": e0,
              "energy_final": e1, "relative_drift": drift,
              "target": 1e-4, "pass": bool(drift < 1e-4)}
    if args.trajectory and cfg.n <= 8192:
        pos_c, _ = oracle.run(pos0, vel0, mass, cfg.dt, cfg.steps,
                              integrator=cfg.integrator
                              if cfg.integrator in ("leapfrog", "euler_semi_implicit")
                              else "leapfrog")
        scale = float(np.max(np.linalg.norm(pos_c, axis=1)))
        report["trajectory_rel_err"] = float(
            np.max(np.linalg.norm(pos_c - pos1, axis=1)) / scale)
    print(json.dumps(report))
    return 0 if report["pass"] else 1


# --------------------------------------------------------------------- render
def cmd_render(args) -> int:
    from parallelnbody_tpu.utils.render import render_trajectory

    written = render_trajectory(args.traj_dir, args.out, size=args.size,
                                plane=args.plane, fmt=args.fmt)
    print(json.dumps({"frames_rendered": len(written),
                      "out_dir": str(written[0].parent) if written else None}))
    return 0


# ----------------------------------------------------------------------- info
def cmd_info(args) -> int:
    cfg = _build_config(args)
    print(json.dumps({
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "version": __import__("parallelnbody_tpu").__version__,
        "resolved_force": cfg.resolve_force(),
        "config": json.loads(cfg.to_json()),
    }, indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="parallelnbody_tpu",
        description="TPU-native N-body simulation framework",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run a simulation")
    _add_config_flags(pr)
    pr.add_argument("--metrics", type=str, default=None, help="metrics JSONL path")
    pr.add_argument("--profile-dir", type=str, default=None,
                    help="jax.profiler trace dir")
    pr.add_argument("--resume", action="store_true",
                    help="resume from latest checkpoint")
    pr.add_argument("--quiet", action="store_true")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="measure step throughput")
    _add_config_flags(pb)
    pb.add_argument("--iters", type=int, default=10)
    pb.set_defaults(fn=cmd_bench)

    po = sub.add_parser("oracle", help="energy-drift parity vs C++ oracle")
    _add_config_flags(po)
    po.add_argument("--trajectory", action="store_true",
                    help="also compare full trajectories (small N)")
    po.set_defaults(fn=cmd_oracle)

    pi = sub.add_parser("info", help="backend / config info")
    _add_config_flags(pi)
    pi.set_defaults(fn=cmd_info)

    pv = sub.add_parser("render", help="render a trajectory dir to PPM frames")
    pv.add_argument("traj_dir")
    pv.add_argument("--out", type=str, default=None)
    pv.add_argument("--size", type=int, default=512)
    pv.add_argument("--plane", choices=("xy", "xz", "yz"), default="xy")
    pv.add_argument("--fmt", choices=("png", "ppm"), default="png")
    pv.set_defaults(fn=cmd_render)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
