"""Measure staged vs dense BH candidate refinement on TPU (VERDICT r2 #2).

Times the full force evaluation (bh_accel) and the list-build phase in both
modes at the official operating points, plus accuracy cross-check at small N.

Usage: python scripts/staged_probe.py [--n 1048576] [--theta 0.72]
                                      [--leaf 256] [--near 3584] [--far 2560]
                                      [--cand1 0] [--cand2 0] [--mode both]
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
from parallelnbody_tpu.utils.profiling import force_sync  # noqa: E402


def timeit(fn, *args, iters=5, **kw):
    out = fn(*args, **kw)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    force_sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--near", type=int, default=3584)
    ap.add_argument("--far", type=int, default=2560)
    ap.add_argument("--cand1", type=int, default=0)
    ap.add_argument("--cand2", type=int, default=0)
    ap.add_argument("--multipole", type=int, default=2)
    ap.add_argument("--mode", default="both",
                    choices=("both", "dense", "staged", "lists", "phases"))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ic", default="plummer")
    args = ap.parse_args()

    from parallelnbody_tpu.models import get_ic

    cfg = SimConfig(n=args.n, ic=args.ic, softening=0.01, dt=1e-4,
                    force="barnes_hut")
    pos, _, mass = get_ic(args.ic)(jax.random.key(cfg.seed), cfg)
    use_pallas = bh.use_pallas_bh()
    print(f"backend={jax.default_backend()} pallas={use_pallas}", flush=True)

    kw = dict(leaf_size=args.leaf, theta=args.theta, g=1.0, softening=0.01,
              near_budget=args.near, far0_budget=args.far,
              use_pallas=use_pallas, multipole=args.multipole,
              compute_pot=False)

    # ---- list-build phase comparison
    prep = jax.jit(lambda p, m: bh._prepare(
        p, m, leaf_size=args.leaf, curve="hilbert",
        multipole_order=args.multipole))
    t_prep, (pos_s, mass_s, perm, tree, n, n_pad) = timeit(
        prep, pos, mass, iters=args.iters)
    n_leaves = int(n_pad) // args.leaf
    print(f"prepare: {t_prep*1e3:.1f} ms  n_leaves={n_leaves} "
          f"levels={tree.n_levels}", flush=True)

    _, cands = bh.resolve_refine("staged", (args.cand2, args.cand1),
                                 tree.n_levels, args.near, args.far)
    print(f"cand budgets (c2, c1) = {cands}", flush=True)

    if args.mode in ("both", "lists", "dense"):
        trav1 = jax.jit(functools.partial(bh.traverse, theta=args.theta,
                                          stop_level=1))
        t_t1, (fm1, rej1) = timeit(trav1, tree, iters=args.iters)
        li = jax.jit(functools.partial(
            bh.leaf_interactions, theta=args.theta, start_leaf=0,
            n_slice=n_leaves, near_budget=args.near, far0_budget=args.far))
        t_li, (ni, nv, fi, fv, of) = timeit(li, tree, rej1, iters=args.iters)
        print(f"dense: traverse {t_t1*1e3:.1f} ms + lists {t_li*1e3:.1f} ms "
              f"overflow={int(of)} near_mean={float(jnp.mean(jnp.sum(nv,1))):.0f}"
              f" near_max={int(jnp.max(jnp.sum(nv,1)))}", flush=True)

    if args.mode in ("both", "lists", "staged", "phases"):
        trav2 = jax.jit(functools.partial(bh.traverse, theta=args.theta,
                                          stop_level=2))
        t_t2, (fm2, rej2) = timeit(trav2, tree, iters=args.iters)
        st = jax.jit(functools.partial(
            bh.build_interaction_lists_staged, theta=args.theta, start_leaf=0,
            n_slice=n_leaves, near_budget=args.near, far_budget=args.far,
            cand2_budget=cands[0], cand1_budget=cands[1], dtype=pos_s.dtype))
        t_st, (ni2, nv2, fi2, fv2, _, of2) = timeit(st, tree, fm2, rej2,
                                                    iters=args.iters)
        print(f"staged: traverse {t_t2*1e3:.1f} ms + lists {t_st*1e3:.1f} ms "
              f"overflow={int(of2)} "
              f"near_mean={float(jnp.mean(jnp.sum(nv2,1))):.0f} "
              f"near_max={int(jnp.max(jnp.sum(nv2,1)))} "
              f"far_mean={float(jnp.mean(jnp.sum(fv2,1))):.0f} "
              f"far_max={int(jnp.max(jnp.sum(fv2,1)))}", flush=True)
        print(f"rej2/target: mean {float(jnp.mean(jnp.sum(rej2,1))):.0f} "
              f"max {int(jnp.max(jnp.sum(rej2,1)))} (budget {cands[0]})",
              flush=True)

    if args.mode == "lists":
        return

    if args.mode == "phases" and use_pallas:
        # Per-phase staged kernel timings (far = one combined list call).
        from parallelnbody_tpu.ops.pallas_bh import near_field_pallas

        nodes_all = st(tree, fm2, rej2)[4]
        p_leaves = pos_s.reshape(n_leaves, args.leaf, 3)
        t_far, _ = timeit(jax.jit(functools.partial(
            bh._eval_far_list, g=1.0, softening=0.01, use_pallas=True,
            compute_pot=False)), p_leaves, nodes_all, fi2, fv2,
            iters=args.iters)
        print(f"far kernel (combined): {t_far*1e3:.1f} ms", flush=True)
        for seg_mb in (4, 8):
            f_nr = jax.jit(functools.partial(
                near_field_pallas, leaf_size=args.leaf, g=1.0,
                softening=0.01, guard_zero=False, compute_pot=False,
                seg_bytes=seg_mb << 20))
            t_nr, _ = timeit(f_nr, pos_s, mass_s, p_leaves, ni2, nv2,
                             iters=args.iters)
            print(f"near kernel (seg {seg_mb} MB): {t_nr*1e3:.1f} ms",
                  flush=True)
        return

    # ---- full force evaluation
    for mode in (("dense", "staged") if args.mode == "both" else (args.mode,)):
        whole = jax.jit(functools.partial(
            bh.bh_accel, refine=mode, cand_budgets=cands, **kw))
        t, (acc, _, of) = timeit(whole, pos, mass, iters=args.iters)
        print(f"TOTAL bh_accel[{mode}]: {t*1e3:.1f} ms  overflow={int(of)}",
              flush=True)


if __name__ == "__main__":
    main()
