"""Measure slice-sectioned BH evaluation (bh_sections) on TPU.

The round-3 boundary: N=32M staged-256 octet OOMs at COMPILE (XLA wants
34.6 GB vs 15.75 GB HBM; sort payloads + staged list planes dominate).
Sectioning the TARGET leaves (lax.map over windows) divides the traversal
planes, staged lists, and their sort buffers by the section count while
sources stay whole — this probe measures the overhead at N where both paths
fit (16M) and whether 32M closes.

Usage: python scripts/sections_probe.py [--n 16777216] [--sections 0 1 4 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16777216)
    ap.add_argument("--sections", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--near", type=int, default=512)
    ap.add_argument("--far", type=int, default=3072)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from parallelnbody_tpu.models import get_ic

    cfg = SimConfig(n=args.n, ic="plummer", softening=0.01, dt=1e-4,
                    force="barnes_hut")
    pos, _, mass = get_ic("plummer")(jax.random.key(cfg.seed), cfg)
    pos.block_until_ready()
    use_pallas = bh.use_pallas_bh()
    n_leaves, _, _ = bh.plan_tree(args.n, args.leaf)
    print(f"backend={jax.default_backend()} pallas={use_pallas} "
          f"n={args.n} n_leaves={n_leaves}", flush=True)

    for s in args.sections:
        fn = jax.jit(functools.partial(
            bh.bh_accel, leaf_size=args.leaf, theta=args.theta, g=1.0,
            softening=0.01, near_budget=args.near, far0_budget=args.far,
            use_pallas=use_pallas, multipole=2, compute_pot=False,
            refine="staged", cand_budgets=(256, 512), sections=s))
        resolved = bh.resolve_sections(s, n_leaves, "staged")
        t0 = time.perf_counter()
        try:
            acc, _, of = fn(pos, mass)
            force_sync(of)
        except Exception as e:
            print(f"sections={s} (resolved {resolved}): "
                  f"FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc, _, of = fn(pos, mass)
        force_sync(of)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"sections={s} (resolved {resolved}): {dt*1e3:.1f} ms/eval  "
              f"overflow={int(of)}  compile+first {t_compile:.0f} s",
              flush=True)


if __name__ == "__main__":
    main()
