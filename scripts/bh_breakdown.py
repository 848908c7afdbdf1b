"""Per-phase timing + list statistics for the Barnes-Hut pipeline on TPU.

Times each phase of bh_accel separately (sort+tree, traversal, list build,
far/near kernels, unsort) and dumps near/far list-length histograms — the
data that decides which near-field redesign (cell-aligned leaves, boundary
snapping, smaller leaves) actually pays.

Usage: python scripts/bh_breakdown.py [--n 1048576] [--theta 0.7]
                                      [--leaf 256] [--near 512] [--far 2048]
"""

from __future__ import annotations

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
from parallelnbody_tpu.api import init_simulation  # noqa: E402
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


def stats(counts):
    c = jnp.sort(counts.ravel())
    n = c.shape[0]
    q = lambda p: int(c[min(n - 1, int(p * n))])
    return {"mean": float(jnp.mean(c)), "p50": q(0.5), "p90": q(0.9),
            "p99": q(0.99), "max": int(c[-1])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--theta", type=float, default=0.7)
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--near", type=int, default=512)
    ap.add_argument("--far", type=int, default=2048)
    ap.add_argument("--multipole", type=int, default=2)
    ap.add_argument("--curve", default="hilbert")
    ap.add_argument("--lists-only", action="store_true",
                    help="stop after the list-build phase (fast compile)")
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, ic="plummer", softening=0.01, dt=1e-4,
                    force="barnes_hut", theta=args.theta,
                    bh_leaf_size=args.leaf, bh_near_budget=args.near,
                    bh_far_budget=args.far, bh_multipole=args.multipole,
                    bh_curve=args.curve)
    state = init_simulation(cfg)
    pos, mass = state.pos, state.mass
    use_pallas = bh.use_pallas_bh()
    print(f"backend={jax.default_backend()} pallas={use_pallas}", flush=True)

    # ---- dispatch/sync floor: every phase number below includes this
    # per-call overhead through the remote tunnel (~4-5 ms measured round 3;
    # traverse alone is 4.1 ms real vs 17 ms as printed with the floor).
    floor_fn = jax.jit(lambda p: p.sum())
    t_floor, _ = timeit(floor_fn, pos)
    print(f"sync floor: {t_floor*1e3:.1f} ms (included in every phase time)",
          flush=True)

    # ---- phase 1: prepare (pad + curve sort + pyramid)
    prep = jax.jit(lambda p, m: bh._prepare(
        p, m, leaf_size=args.leaf, curve=args.curve,
        multipole_order=args.multipole))
    t_prep, (pos_s, mass_s, perm, tree, n, n_pad) = timeit(prep, pos, mass)
    n_leaves = int(n_pad) // args.leaf
    print(f"prepare: {t_prep*1e3:.1f} ms  (n_pad={n_pad}, n_leaves={n_leaves}, "
          f"levels={tree.n_levels})", flush=True)

    # ---- phase 2: traversal (upper-level masks)
    trav = jax.jit(functools.partial(bh.traverse, theta=args.theta))
    t_trav, (far_masks, rejects_l1) = timeit(trav, tree)
    up_counts = sum(jnp.sum(far_masks[k], axis=1)
                    for k in range(1, tree.n_levels))
    print(f"traverse: {t_trav*1e3:.1f} ms  upper-accepted/leaf: "
          f"{json.dumps(stats(up_counts))}", flush=True)
    print(f"l1-rejects/leaf: {json.dumps(stats(jnp.sum(rejects_l1, 1)))}",
          flush=True)

    # ---- phase 3: leaf_interactions (list build)
    li = jax.jit(functools.partial(
        bh.leaf_interactions, theta=args.theta, start_leaf=0,
        n_slice=n_leaves, near_budget=args.near, far0_budget=args.far))
    t_li, (near_idx, near_valid, far0_idx, far0_valid, overflow) = timeit(
        li, tree, rejects_l1)
    near_counts = jnp.sum(near_valid, axis=1)
    far0_counts = jnp.sum(far0_valid, axis=1)
    print(f"leaf_interactions: {t_li*1e3:.1f} ms  overflow={int(overflow)}",
          flush=True)
    print(f"near leaves/target: {json.dumps(stats(near_counts))} "
          f"(budget {args.near})", flush=True)
    print(f"far0 leaves/target: {json.dumps(stats(far0_counts))} "
          f"(budget {args.far})", flush=True)
    near_pairs = float(jnp.sum(near_counts)) * args.leaf * args.leaf
    print(f"near pairs total: {near_pairs:.3e} "
          f"(= {near_pairs/1.79e11*1e3:.0f} ms at 1.79e11 pairs/s)", flush=True)

    # leaf radius stats (what drives the near list size)
    rad = jnp.sort(tree.radius[0])
    rad_stats = {
        "mean": float(jnp.mean(rad)),
        "p50": float(rad[n_leaves // 2]),
        "p90": float(rad[min(n_leaves - 1, int(0.9 * n_leaves))]),
        "p99": float(rad[min(n_leaves - 1, int(0.99 * n_leaves))]),
        "max": float(rad[-1]),
    }
    print(f"leaf radius: {json.dumps(rad_stats)}", flush=True)

    if args.lists_only:
        return
    if not use_pallas:
        print("non-TPU backend: skipping kernel timings", flush=True)
        return

    from parallelnbody_tpu.ops.pallas_bh import (  # noqa: E402
        far_field_pallas, near_field_pallas)

    dtype = pos_s.dtype
    with_quad = tree.quad[0] is not None
    p_leaves = pos_s.reshape(n_leaves, args.leaf, 3)

    def node_table(k):
        cols = [tree.com[k], tree.mass[k][:, None]]
        if with_quad:
            cols.append(tree.quad[k])
        return jnp.concatenate(cols, axis=1).astype(dtype)

    nodes_up = jnp.concatenate(
        [node_table(k) for k in range(1, tree.n_levels)], axis=0)
    n_up = nodes_up.shape[0]
    up_mask = jnp.concatenate(
        [far_masks[k] for k in range(1, tree.n_levels)], axis=1)
    cols_up = jax.lax.broadcasted_iota(jnp.int32, up_mask.shape, 1)
    up_idx, up_valid, _ = jax.jit(
        functools.partial(bh._row_compact, budget=n_up))(up_mask, cols_up)
    leaf_nodes = node_table(0)

    # ---- phase 4a: upper far field (front-packed)
    f_up = jax.jit(functools.partial(
        far_field_pallas, g=1.0, softening=0.01, guard_zero=False))
    t_up, _ = timeit(f_up, p_leaves, nodes_up, up_idx, up_valid)
    print(f"far_upper kernel: {t_up*1e3:.1f} ms (width {n_up})", flush=True)

    # ---- phase 4b: leaf far field
    f_l0 = jax.jit(functools.partial(
        far_field_pallas, g=1.0, softening=0.01, guard_zero=False))
    t_f0, _ = timeit(f_l0, p_leaves, leaf_nodes, far0_idx, far0_valid)
    print(f"far_leaf kernel: {t_f0*1e3:.1f} ms (budget {args.far})", flush=True)

    # ---- phase 4c: near field
    f_nr = jax.jit(functools.partial(
        near_field_pallas, leaf_size=args.leaf, g=1.0, softening=0.01,
        guard_zero=False))
    t_nr, _ = timeit(f_nr, pos_s, mass_s, p_leaves, near_idx, near_valid)
    print(f"near kernel: {t_nr*1e3:.1f} ms (budget {args.near})", flush=True)

    # ---- phase 5: unsort (5-operand sort keyed by perm)
    @jax.jit
    def uns(a, p, pot):
        _, ax, ay, az, po = jax.lax.sort(
            (p.astype(jnp.int32), a[:, 0], a[:, 1], a[:, 2], pot), num_keys=1)
        return jnp.stack([ax, ay, az], axis=1)[:args.n], po[:args.n]

    acc = jnp.zeros((n_pad, 3), dtype)
    pot = jnp.zeros((n_pad,), dtype)
    t_un, _ = timeit(uns, acc, perm, pot)
    print(f"unsort: {t_un*1e3:.1f} ms", flush=True)

    # ---- whole thing for reference
    whole = jax.jit(functools.partial(
        bh.bh_accel, leaf_size=args.leaf, theta=args.theta, g=1.0,
        softening=0.01, near_budget=args.near, far0_budget=args.far,
        use_pallas=use_pallas, curve=args.curve, multipole=args.multipole))
    t_all, _ = timeit(whole, pos, mass)
    print(f"TOTAL bh_accel: {t_all*1e3:.1f} ms  "
          f"(sum of phases: {(t_prep+t_trav+t_li+t_up+t_f0+t_nr+t_un)*1e3:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
