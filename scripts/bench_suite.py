"""Full benchmark suite — measures every BASELINE.md config that fits a
single chip and writes BENCH_RESULTS.md + JSONL.

Usage:  python scripts/bench_suite.py [--quick] [--out BENCH_RESULTS.md]

(bench.py stays the single-line driver-facing headline; this is the
human-facing table.)
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
from parallelnbody_tpu.api import (init_simulation, make_step,  # noqa: E402
                                   prepare_simulation)
from parallelnbody_tpu.utils.profiling import force_sync  # noqa: E402


def measure(cfg: SimConfig, iters: int = 5) -> dict:
    bh = cfg.resolve_force() == "barnes_hut"
    t_init0 = time.perf_counter()
    # prepare_simulation calibrates the auto (0) budgets against the actual
    # ICs (VERDICT r4 #2: no hand-tuned budget anywhere in this suite); the
    # calibration compiles are charged to the compile column.
    cfg, state = prepare_simulation(cfg)
    # Overflow is carried through every benchmarked step: a BH perf row
    # with clipped budgets benchmarks corrupted physics (the 4M auto-cand
    # clip shipped exactly that way until the rms column caught it).
    step = make_step(cfg, report_overflow=bh)
    overflow = 0
    if bh:
        state, of = step(state)
        overflow += int(of)
    else:
        state = step(state)
    force_sync(state.time)
    t_compile = time.perf_counter() - t_init0

    t0 = time.perf_counter()
    ofs = []
    for _ in range(iters):
        if bh:
            state, of = step(state)
            ofs.append(of)  # device scalar: no host sync inside the loop
        else:
            state = step(state)
    force_sync(state.time)
    dt = (time.perf_counter() - t0) / iters
    if bh:
        # EVERY benchmarked step's counter (mid-run-onset clipping would
        # hide in a first+last-only sum).
        overflow += sum(int(x) for x in ofs)
    out = {
        "n": cfg.n,
        "force": cfg.resolve_force(),
        "ms_per_step": dt * 1e3,
        "steps_per_sec": 1.0 / dt,
        "compile_plus_first_s": t_compile,
    }
    if not bh:
        out["pairs_per_sec"] = cfg.n * cfg.n / dt
    else:
        # Accuracy next to every BH perf number (VERDICT r3 weak #2):
        # state.acc is consistent with state.pos after a KDK step, so the
        # sample audits exactly the forces the benchmarked step produced.
        from parallelnbody_tpu.utils.accuracy import rms_force_error_sample

        out["rms_force_error"] = rms_force_error_sample(
            state.pos, state.mass, state.acc, g=cfg.g,
            softening=cfg.softening)
        out["overflow"] = overflow
        out["budgets"] = {"near": cfg.bh_near_budget,
                          "far": cfg.bh_far_budget,
                          "cand2": cfg.bh_cand2_budget,
                          "cand1": cfg.bh_cand_budget}
    return out


def measure_reuse(cfg: SimConfig, k: int = 8, n_steps: int = 16) -> dict:
    """The same operating point through make_run with a tree-rebuild
    interval (bh_rebuild_every=k, the SHIPPED default since r5 — certified
    by the 1000-step oracle drift gates in tests/test_oracle.py): one sort
    + traversal + list build per block of k steps, multipole pyramid
    refreshed every step (DESIGN.md §3 r7). rms is measured on the final
    state's own forces — the accuracy the reused-list trajectory actually
    integrated with."""
    from parallelnbody_tpu.api import _reuse_eligible, make_run
    from parallelnbody_tpu.utils.accuracy import rms_force_error_sample

    cfg = cfg.replace(bh_rebuild_every=k)
    if not _reuse_eligible(cfg, n_steps):
        raise ValueError("config not eligible for bh_rebuild_every")
    t0 = time.perf_counter()
    cfg, state = prepare_simulation(cfg)
    run = make_run(cfg, n_steps, report_overflow=True)
    out, of = run(state)
    force_sync(out.time)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, of = run(state)
    force_sync(out.time)
    dt = (time.perf_counter() - t0) / n_steps
    return {
        "n": cfg.n, "force": cfg.resolve_force(), "rebuild_every": k,
        "ms_per_step": dt * 1e3, "steps_per_sec": 1.0 / dt,
        "compile_plus_first_s": t_compile,
        "overflow": int(of),
        "rms_force_error": rms_force_error_sample(
            out.pos, out.mass, out.acc, g=cfg.g, softening=cfg.softening),
    }


def measure_sharded(cfg: SimConfig, n_dev: int, iters: int = 5) -> dict:
    """Sharded-step measurement over an n_dev ring mesh (VERDICT r2 #4):
    first contact with real multi-chip hardware is this one function /
    `bench --devices N` on the CLI."""
    from parallelnbody_tpu.parallel import make_ring_mesh, shard_state
    from parallelnbody_tpu.parallel.sharded import (
        make_sharded_step, sharded_init_accel)

    mesh = make_ring_mesh(n_dev)
    state = shard_state(init_simulation(cfg, compute_forces=False), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    step = make_sharded_step(cfg, mesh)
    state = step(state)
    force_sync(state.time)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    force_sync(state.time)
    dt = (time.perf_counter() - t0) / iters
    return {
        "n": cfg.n, "force": cfg.resolve_force(), "devices": n_dev,
        "ms_per_step": dt * 1e3, "steps_per_sec": 1.0 / dt,
        "pairs_per_sec_per_chip": cfg.n * cfg.n / dt / n_dev
        if cfg.resolve_force() != "barnes_hut" else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes only")
    ap.add_argument("--xl", action="store_true",
                    help="include the N=16M single-chip case (~10 min extra)")
    ap.add_argument("--no-reuse", action="store_true",
                    help="skip the bh_rebuild_every=8 make_run rows (the "
                         "SHIPPED operating point since r5; on by default, "
                         "~3 min compile each)")
    ap.add_argument("--filter", default=None,
                    help="run only cases whose name contains this substring "
                         "(re-measure one row without the full suite)")
    ap.add_argument("--out", default="BENCH_RESULTS.md")
    args = ap.parse_args()

    backend = jax.default_backend()
    common = dict(ic="plummer", integrator="leapfrog", softening=0.01, dt=1e-4)
    if args.quick or backend != "tpu":
        cases = [
            ("all-pairs n=4096", SimConfig(n=4096, force="direct", **common)),
            ("BH n=16384", SimConfig(n=16384, force="barnes_hut", theta=0.7,
                                     bh_leaf_size=64, **common)),
        ]
    else:
        cases = [
            ("all-pairs Pallas n=65536",
             SimConfig(n=65536, force="direct_pallas", track_potential=False, **common)),
            ("all-pairs Pallas n=262144 (BASELINE config 2)",
             SimConfig(n=262144, force="direct_pallas", track_potential=False, **common)),
            # BH operating point: theta=0.72 + quadrupoles measured 9.2e-4
            # rms vs direct at N=1M with ZERO list overflow (scripts/
            # theta_sweep.py); track_potential=False skips the per-step
            # potential column (diagnostics recompute on demand).
            # bh_leaf_size left at 0 = auto (128 at 262k, 256 at 1M+ —
            # measured best per size, config.resolve_bh_leaf_size).
            # NO budgets anywhere in this suite since r5: every config
            # leaves them at 0 = auto, and measure() calibrates them from
            # the actual t=0 geometry (api.calibrate_budgets) — the bench
            # table exercises exactly what an untuned user gets, with the
            # overflow column as the guard (VERDICT r4 #2).
            ("Barnes-Hut n=262144 (quad, theta=0.72)",
             SimConfig(n=262144, force="barnes_hut", theta=0.72,
                       track_potential=False, **common)),
            ("Barnes-Hut n=1048576 (BASELINE config 3; quad, theta=0.72)",
             SimConfig(n=1048576, force="barnes_hut", theta=0.72,
                       track_potential=False, **common)),
            # Colliding cores pack more near leaves per target than a
            # single Plummer sphere — exactly why calibration beats a
            # global default here. Auto refine = staged at 8192 leaves.
            ("Barnes-Hut n=2097152 galaxy collision (BASELINE config 5)",
             SimConfig(n=2097152, ic="galaxy_collision", force="barnes_hut",
                       theta=0.72, track_potential=False,
                       integrator="leapfrog", softening=0.01, dt=5e-4)),
            # BASELINE config 4 asks for N=4M on a v5p MESH; this runs it on
            # ONE v5e chip. r4: leaf 256 + staged lists (auto) measured
            # 1025 ms at theta 0.72 vs the round-3 dense leaf-512 1421 ms
            # at theta 0.75 — faster AND more accurate.
            ("Barnes-Hut n=4194304 single chip (staged, theta=0.72)",
             SimConfig(n=4194304, force="barnes_hut", theta=0.72,
                       track_potential=False, **common)),
            ("Barnes-Hut n=8388608 single chip (staged lists, theta=0.72)",
             SimConfig(n=8388608, force="barnes_hut", theta=0.72,
                       track_potential=False, **common)),
        ]
        if args.xl:
            cases.append(
                ("Barnes-Hut n=16777216 single chip (staged, theta=0.72)",
                 SimConfig(n=16777216, force="barnes_hut", theta=0.72,
                           track_potential=False, **common)))
            # Slice-sectioned evaluation (bh_sections auto = 8 windows):
            # unsectioned 32M wants 34.6 GB at compile vs 15.75 GB HBM.
            cases.append(
                ("Barnes-Hut n=33554432 single chip (staged, 8 sections)",
                 SimConfig(n=33554432, force="barnes_hut", theta=0.72,
                           track_potential=False, **common)))

    if args.filter and args.out == "BENCH_RESULTS.md":
        # A filtered run is a partial table — don't clobber the full one.
        args.out = "BENCH_FILTERED.md"

    rows = []
    for name, cfg in cases:
        if args.filter and args.filter not in name:
            continue
        print(f"... {name}", file=sys.stderr, flush=True)
        try:
            r = measure(cfg)
            r["name"] = name
        except Exception as e:  # keep the suite going
            r = {"name": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}
        rows.append(r)
        print(json.dumps(r), flush=True)

    if not args.no_reuse:
        from parallelnbody_tpu.api import _reuse_eligible

        for name, cfg in cases:
            if not _reuse_eligible(cfg.replace(bh_rebuild_every=8), 16):
                continue
            rname = f"{name} + rebuild interval 8 (make_run, DEFAULT)"
            if args.filter and args.filter not in rname:
                continue
            print(f"... {rname}", file=sys.stderr, flush=True)
            try:
                r = measure_reuse(cfg)
                r["name"] = rname
            except Exception as e:
                r = {"name": rname,
                     "error": f"{type(e).__name__}: {str(e)[:200]}"}
            rows.append(r)
            print(json.dumps(r), flush=True)

    # Sharded case: every visible device in one ring (skipped on one chip —
    # this rig tunnels a single TPU; on a real slice it runs unmodified).
    n_dev = len(jax.devices())
    if n_dev > 1 and not args.filter:
        name = f"sharded ring all-pairs n=262144 x{n_dev} devices"
        try:
            cfg = SimConfig(n=262144 if backend == "tpu" else 4096,
                            force="direct_pallas" if backend == "tpu"
                            else "direct",
                            track_potential=False, **common)
            r = measure_sharded(cfg, n_dev)
            r["name"] = name
        except Exception as e:
            r = {"name": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}
        rows.append(r)
        print(json.dumps(r), flush=True)

    dev = str(jax.devices()[0])
    lines = [
        "# Benchmark results",
        "",
        f"Backend: {backend} ({dev}); generated by scripts/bench_suite.py",
        "",
        "rms = relative rms force error vs an O(k*N) direct sum over 4096",
        "sampled targets, measured on the benchmarked step's own forces —",
        "every Barnes-Hut perf number is only meaningful at its stated",
        "accuracy (all-pairs rows are exact by construction). overflow is",
        "the budget-clip counter summed over the benchmarked steps: a",
        "nonzero value means the row benchmarks DEGRADED physics (raise",
        "the listed budgets), zero means every interaction was evaluated.",
        "Rebuild-interval rows (make_run, bh_rebuild_every=8 — the SHIPPED",
        "default operating point, certified by 1000-step oracle drift",
        "gates) appear for eligible scales: _REUSE_MAX_ROWS gates the",
        "fused reuse block at 8M padded rows, the largest scale that",
        "reproduces reliably on this chip (docs/DESIGN.md r7 capacity",
        "record). Every BH budget in this table is AUTO-CALIBRATED from",
        "the actual t=0 geometry (api.calibrate_budgets) — no hand-tuned",
        "budgets anywhere in the suite; calibration compiles are charged",
        "to the compile column.",
        "",
        "| Case | ms/step | steps/s | pairs/s | rms err | overflow "
        "| compile+first (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['name']} | ERROR: {r['error']} | | | | | |")
        else:
            pps = r.get("pairs_per_sec") or r.get("pairs_per_sec_per_chip")
            pps = f"{pps:.3e}" if pps else "-"
            rms = r.get("rms_force_error")
            rms = f"{rms:.2e}" if rms is not None else "exact"
            of = r.get("overflow")
            of = str(of) if of is not None else "-"
            comp = r.get("compile_plus_first_s")
            comp = f"{comp:.0f}" if comp is not None else "-"
            lines.append(
                f"| {r['name']} | {r['ms_per_step']:.1f} | "
                f"{r['steps_per_sec']:.2f} | {pps} | {rms} | {of} | {comp} |")
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
