"""Measure tree/list REUSE across steps: rebuild every k, re-evaluate between.

The r5 breakdown says the near kernel is ~80% of the N=1M step; the rest is
sort + traverse + list build + unsort. All of those are GEOMETRY work whose
output (the interaction lists) changes only as fast as particles cross leaf
boundaries — at dt=1e-4 a Plummer-sphere particle moves ~1e-4 of the system
size per step, ~0.2% of a leaf radius. Classic tree codes exploit this with
a tree-rebuild interval. This probe measures, on TPU:

  1. ms/eval of the full bh_accel (sort+tree+traverse+lists+eval+unsort),
  2. ms/eval of a REUSED-list evaluation (fresh multipole pyramid from
     current positions + the frozen near/far lists; no sort, no traverse,
     no list build, no unsort — the state stays in sorted order),
  3. ms for the plan (sort+traverse+lists) alone, to price block headers,
  4. the accuracy cost: rms relative force error of the reused-list forces
     vs a fresh rebuild at the SAME positions, after j=1,2,4,8,16 REAL
     leapfrog steps driven by the reused forces (the error a production
     bh_rebuild_every=k run would actually integrate with), plus rms vs
     the sampled direct sum (the absolute accuracy class).

Usage: python scripts/reuse_probe.py [--n 1048576] [--dt 1e-4] [--k 16]
       [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.ops import bh  # noqa: E402
from parallelnbody_tpu.utils.accuracy import rms_force_error_sample  # noqa: E402
from parallelnbody_tpu.utils.profiling import force_sync  # noqa: E402


def make_cfg(n: int, dt: float, ic: str) -> SimConfig:
    """Mirror the bench_suite budget choices per N (measured overflow-free)."""
    common = dict(ic=ic, integrator="leapfrog", softening=0.01,
                  dt=dt, force="barnes_hut", theta=0.72,
                  track_potential=False)
    if ic == "galaxy_collision":
        return SimConfig(n=n, bh_near_budget=5120, bh_far_budget=2048,
                         **common)
    if n <= 2 * 1048576:
        return SimConfig(n=n, bh_near_budget=3584, bh_far_budget=1536,
                         **common)
    return SimConfig(n=n, bh_leaf_size=256, bh_refine="staged",
                     bh_near_budget=512, bh_far_budget=2816,
                     bh_cand_budget=512, bh_cand2_budget=256, **common)


def make_plan_eval(cfg: SimConfig):
    """(plan, eval_reuse, full): the bh_accel pipeline split at the list
    boundary. plan(pos, mass) -> (pos_s, mass_s, perm, lists...) runs
    sort+tree+traverse+lists; eval_reuse(pos_s, mass_s, *lists) rebuilds
    ONLY the multipole pyramid from the current sorted positions and
    evaluates the frozen lists (octet far mode, the shipped auto)."""
    leaf = cfg.resolve_bh_leaf_size()
    use_pallas = bh.use_pallas_bh()
    _, _, n_levels = bh.plan_tree(cfg.n, leaf, cfg.bh_max_levels)
    refine, cands = bh.resolve_refine(
        cfg.resolve_bh_refine(), (cfg.bh_cand2_budget, cfg.bh_cand_budget),
        n_levels, cfg.bh_near_budget, cfg.bh_far_budget)
    compute_pot = cfg.track_potential
    theta, g, soft = cfg.theta, cfg.g, cfg.softening
    dtype = jnp.dtype(cfg.dtype)

    @jax.jit
    def plan(pos, mass):
        pos_s, mass_s, perm, tree, n, _ = bh._prepare(
            pos, mass, leaf_size=leaf, curve=cfg.bh_curve,
            multipole_order=cfg.bh_multipole, max_levels=cfg.bh_max_levels)
        lists = bh.bh_plan_lists(
            tree, theta=theta, near_budget=cfg.bh_near_budget,
            far_budget=cfg.bh_far_budget, refine=refine, cand_budgets=cands,
            dtype=dtype)
        return (pos_s, mass_s, perm, lists.near_idx, lists.near_valid,
                lists.far_keys, lists.far_valid, lists.overflow)

    @jax.jit
    def eval_reuse(pos_s, mass_s, near_idx, near_valid, far_keys, far_valid):
        lists = bh.BHListPlan(near_idx, near_valid, far_keys, far_valid,
                              jnp.zeros((), jnp.int32))
        return bh.bh_eval_lists(
            pos_s, mass_s, lists, leaf_size=leaf, g=g, softening=soft,
            multipole=cfg.bh_multipole, max_levels=cfg.bh_max_levels,
            use_pallas=use_pallas, compute_pot=compute_pot, n_live=cfg.n)

    full = jax.jit(functools.partial(
        bh.bh_accel, leaf_size=leaf, theta=theta, g=g, softening=soft,
        near_budget=cfg.bh_near_budget, far0_budget=cfg.bh_far_budget,
        use_pallas=use_pallas, curve=cfg.bh_curve, multipole=cfg.bh_multipole,
        max_levels=cfg.bh_max_levels, compute_pot=compute_pot, refine=refine,
        cand_budgets=cands, far_mode="octet"))
    return plan, eval_reuse, full, refine


def timeit(fn, args, iters, sync_of):
    out = fn(*args)
    force_sync(sync_of(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(sync_of(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--dt", type=float, default=1e-4)
    ap.add_argument("--ic", default="plummer")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = make_cfg(args.n, args.dt, args.ic)
    from parallelnbody_tpu.models import get_ic

    key = jax.random.key(cfg.seed)
    pos, vel, mass = get_ic(cfg.ic)(key, cfg)
    pos.block_until_ready()
    plan, eval_reuse, full, refine = make_plan_eval(cfg)
    print(f"backend={jax.default_backend()} n={cfg.n} refine={refine} "
          f"dt={cfg.dt}", flush=True)

    # --- timings -----------------------------------------------------------
    t_full, (acc_f, _, of_f) = timeit(full, (pos, mass), args.iters,
                                      lambda o: o[2])
    print(f"full bh_accel:   {t_full*1e3:8.1f} ms/eval  overflow={int(of_f)}",
          flush=True)
    t_plan, p = timeit(plan, (pos, mass), args.iters, lambda o: o[7])
    pos_s, mass_s, perm, ni, nv, fk, fv, of_p = p
    print(f"plan (lists):    {t_plan*1e3:8.1f} ms       overflow={int(of_p)}",
          flush=True)
    t_ev, _ = timeit(eval_reuse, (pos_s, mass_s, ni, nv, fk, fv),
                     args.iters, lambda o: o[1])
    print(f"reuse eval:      {t_ev*1e3:8.1f} ms/eval", flush=True)
    for k in (2, 4, 8, 16):
        avg = (t_plan + k * t_ev) / k
        print(f"  k={k:2d}: block avg {avg*1e3:7.1f} ms/step "
              f"({(1 - avg / t_full) * 100:+5.1f}% vs full)", flush=True)

    # --- accuracy over a real reused-force trajectory -----------------------
    # Sorted-space leapfrog (KDK) driven by the FROZEN lists; at checkpoints
    # compare the reused forces vs a fresh rebuild at the same positions.
    dt = jnp.asarray(cfg.dt, pos_s.dtype)
    n = cfg.n

    @jax.jit
    def kdk(pos_s, vel_s, acc_s, ni, nv, fk, fv):
        vh = vel_s + 0.5 * dt * acc_s
        pos_s = pos_s + dt * vh
        acc_new, _ = eval_reuse(pos_s, mass_s, ni, nv, fk, fv)
        return pos_s, vh + 0.5 * dt * acc_new, acc_new

    # vel must ride the same permutation the plan sorted pos by: perm[i] is
    # the original index of sorted row i (a row gather is fine for a probe;
    # production would carry vel through the plan's multi-operand sort).
    vel_pad = jnp.concatenate(
        [vel, jnp.zeros((pos_s.shape[0] - n, 3), vel.dtype)], axis=0)
    vel_s = vel_pad[perm]

    acc_s, _ = eval_reuse(pos_s, mass_s, ni, nv, fk, fv)
    ps, vs, as_ = pos_s, vel_s, acc_s
    checkpoints = {1, 2, 4, 8, 16, 32}
    for j in range(1, args.k + 1):
        ps, vs, as_ = kdk(ps, vs, as_, ni, nv, fk, fv)
        if j in checkpoints:
            a_fresh, _, _ = full(ps[:n], mass_s[:n])
            num = jnp.sum((as_[:n] - a_fresh) ** 2, axis=1)
            den = jnp.sum(a_fresh ** 2, axis=1)
            rel = float(jnp.sqrt(jnp.mean(num) / jnp.mean(den)))
            rms_dir = rms_force_error_sample(
                ps[:n], mass_s[:n], as_[:n], g=cfg.g,
                softening=cfg.softening, k=2048)
            print(f"  step {j:3d}: reuse-vs-fresh rms {rel:.3e}   "
                  f"vs-direct rms {rms_dir:.3e}", flush=True)


if __name__ == "__main__":
    main()
