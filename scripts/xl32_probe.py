"""Attribute the N=32M single-chip excess over the N*logN trend with a
MEASURED phase split (VERDICT r4 #5: the ~28% excess — 13.28 s/eval vs
~10.3 extrapolated from 16M — was attributed to "HBM pressure" by
assertion).

Phases, each its own jit on the real chip (sections resolve to auto=8):

  prepare   sort + pyramid (bh._prepare)
  plan      sectioned traverse + staged list build (bh.bh_plan_lists)
  eval      fresh pyramid + sectioned far/near kernels over frozen lists
            (bh.bh_eval_lists)
  full      bh_accel end-to-end (the bench row's program)
  step      make_step, with and without donate_state (does input aliasing
            move the eval at this scale?)

Comparing (prepare + plan + eval) against full separates phase cost from
composition overhead; comparing each phase's per-N scaling against its 16M
counterpart (scripts/reuse_probe.py rows) says WHICH phase carries the
excess. Run per-phase with --only to fit tunnel timeout windows.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/xl32_probe.py \
      [--n 33554432] [--iters 2] [--only prepare,plan,eval,full,step,donate]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.ops import bh  # noqa: E402
from parallelnbody_tpu.utils.profiling import force_sync  # noqa: E402


def timeit(fn, args, iters, sync_of):
    t_c0 = time.perf_counter()
    out = fn(*args)
    force_sync(sync_of(out))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(sync_of(out))
    return (time.perf_counter() - t0) / iters, compile_s, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=33554432)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--only", default="prepare,plan,eval,full,step,donate")
    args = ap.parse_args()
    only = set(args.only.split(","))

    # The r6 bench row's exact operating point (explicit budgets match the
    # historical row so phase times compose to its 13.28 s).
    cfg = SimConfig(n=args.n, force="barnes_hut", theta=0.72,
                    bh_leaf_size=256, bh_refine="staged",
                    bh_near_budget=512, bh_far_budget=3072,
                    bh_cand_budget=512, bh_cand2_budget=256,
                    track_potential=False, ic="plummer",
                    integrator="leapfrog", softening=0.01, dt=1e-4)
    leaf = cfg.resolve_bh_leaf_size()
    n_leaves, n_pad, n_levels = bh.plan_tree(cfg.n, leaf, cfg.bh_max_levels)
    refine, cands = bh.resolve_refine(
        "staged", (cfg.bh_cand2_budget, cfg.bh_cand_budget), n_levels,
        cfg.bh_near_budget, cfg.bh_far_budget)
    sections = bh.resolve_sections(cfg.bh_sections, n_leaves, refine)
    use_pallas = bh.use_pallas_bh()
    print(json.dumps({"n": cfg.n, "n_leaves": n_leaves,
                      "sections": sections, "iters": args.iters}),
          flush=True)

    from parallelnbody_tpu.models import get_ic

    key = jax.random.key(cfg.seed)
    pos, vel, mass = get_ic(cfg.ic)(key, cfg)
    del vel
    force_sync(pos[0, 0])

    prep = jax.jit(functools.partial(
        bh._prepare, leaf_size=leaf, curve=cfg.bh_curve,
        multipole_order=cfg.bh_multipole, max_levels=cfg.bh_max_levels))

    if "prepare" in only:
        t, c, prep_out = timeit(prep, (pos, mass), args.iters,
                                lambda o: o[0][0, 0])
        print(json.dumps({"phase": "prepare", "ms": t * 1e3,
                          "compile_s": c}), flush=True)
    else:
        prep_out = prep(pos, mass)
    pos_s, mass_s, perm, tree, _, _ = prep_out

    @jax.jit
    def plan_fn(pos, mass):
        _, _, _, tr, _, _ = bh._prepare(
            pos, mass, leaf_size=leaf, curve=cfg.bh_curve,
            multipole_order=cfg.bh_multipole, max_levels=cfg.bh_max_levels)
        return bh.bh_plan_lists(
            tr, theta=cfg.theta, near_budget=cfg.bh_near_budget,
            far_budget=cfg.bh_far_budget, refine=refine, cand_budgets=cands,
            dtype=pos.dtype, sections=sections)

    lists = None
    if "plan" in only or "eval" in only:
        t, c, lists = timeit(plan_fn, (pos, mass), args.iters,
                             lambda o: o.overflow)
        if "plan" in only:
            print(json.dumps({"phase": "prepare+plan", "ms": t * 1e3,
                              "compile_s": c,
                              "overflow": int(lists.overflow)}), flush=True)

    if "eval" in only:
        @jax.jit
        def eval_fn(pos_s, mass_s, ni, nv, fk, fv):
            lp = bh.BHListPlan(ni, nv, fk, fv, jnp.zeros((), jnp.int32))
            return bh.bh_eval_lists(
                pos_s, mass_s, lp, leaf_size=leaf, g=cfg.g,
                softening=cfg.softening, multipole=cfg.bh_multipole,
                max_levels=cfg.bh_max_levels, use_pallas=use_pallas,
                compute_pot=False, n_live=cfg.n, sections=sections)

        t, c, _ = timeit(eval_fn, (pos_s, mass_s, lists.near_idx,
                                   lists.near_valid, lists.far_keys,
                                   lists.far_valid),
                         args.iters, lambda o: o[0][0, 0])
        print(json.dumps({"phase": "eval", "ms": t * 1e3, "compile_s": c}),
              flush=True)
    del lists, pos_s, mass_s, perm, tree, prep_out

    if "full" in only:
        full = jax.jit(functools.partial(
            bh.bh_accel, leaf_size=leaf, theta=cfg.theta, g=cfg.g,
            softening=cfg.softening, near_budget=cfg.bh_near_budget,
            far0_budget=cfg.bh_far_budget, use_pallas=use_pallas,
            curve=cfg.bh_curve, multipole=cfg.bh_multipole,
            max_levels=cfg.bh_max_levels, compute_pot=False, refine=refine,
            cand_budgets=cands, far_mode="octet", sections=cfg.bh_sections))
        t, c, out = timeit(full, (pos, mass), args.iters,
                           lambda o: o[2])
        print(json.dumps({"phase": "full_bh_accel", "ms": t * 1e3,
                          "compile_s": c, "overflow": int(out[2])}),
              flush=True)
        del out

    if "step" in only or "donate" in only:
        from parallelnbody_tpu.api import init_simulation, make_step

        variants = []
        if "step" in only:
            variants.append(False)
        if "donate" in only:
            variants.append(True)
        for donate in variants:
            c = cfg.replace(donate_state=donate)
            state = init_simulation(c, compute_forces=False)
            step = make_step(c)
            t_c0 = time.perf_counter()
            state = step(state)
            force_sync(state.time)
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state = step(state)
            force_sync(state.time)
            t = (time.perf_counter() - t0) / args.iters
            print(json.dumps({"phase": "make_step", "donate": donate,
                              "ms": t * 1e3, "compile_s": compile_s}),
                  flush=True)
            del state, step


if __name__ == "__main__":
    main()
