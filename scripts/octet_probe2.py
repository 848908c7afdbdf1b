"""Octet far-field scaling probes: 1M variants + large-N staged A/B.

Usage: python scripts/octet_probe2.py --set {1m,4m,8m,galaxy}
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

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


def case(pos, mass, *, leaf, refine, far_mode, theta=0.72, near=3584,
         far=2816, cands=(0, 0), iters=5):
    t, (acc, pot, of) = timeit(
        bh.bh_accel, pos, mass, leaf_size=leaf, theta=theta, g=1.0,
        softening=0.01, near_budget=near, far0_budget=far,
        use_pallas=bh.use_pallas_bh(), curve="hilbert", multipole=2,
        compute_pot=False, refine=refine, far_mode=far_mode,
        cand_budgets=cands, iters=iters)
    print(f"leaf={leaf} refine={refine} far={far_mode} near={near} far_b={far}"
          f" cands={cands}: {t*1e3:.1f} ms  overflow={int(of)}", flush=True)
    return t


def get_state(n, ic="plummer"):
    cfg = SimConfig(n=n, ic=ic, softening=0.01, dt=1e-4,
                    force="barnes_hut")
    s = init_simulation(cfg)
    return s.pos, s.mass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="1m")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} set={args.set}", flush=True)

    if args.set == "1m":
        pos, mass = get_state(1 << 20)
        case(pos, mass, leaf=128, refine="dense", far_mode="octet",
             near=2048, far=2048)
        case(pos, mass, leaf=128, refine="staged", far_mode="octet",
             near=2048, far=2048, cands=(128, 512))
        case(pos, mass, leaf=256, refine="staged", far_mode="octet",
             near=3584, far=2048)
    elif args.set == "4m":
        pos, mass = get_state(1 << 22)
        case(pos, mass, leaf=256, refine="staged", far_mode="gather",
             iters=3)
        case(pos, mass, leaf=256, refine="staged", far_mode="octet",
             iters=3)
    elif args.set == "8m":
        pos, mass = get_state(1 << 23)
        case(pos, mass, leaf=256, refine="staged", far_mode="gather",
             iters=3)
        case(pos, mass, leaf=256, refine="staged", far_mode="octet",
             iters=3)
    elif args.set == "galaxy":
        pos, mass = get_state(1 << 21, ic="galaxy_collision")
        case(pos, mass, leaf=128, refine="staged", far_mode="gather",
             near=1024, far=2048, iters=3)
        case(pos, mass, leaf=128, refine="staged", far_mode="octet",
             near=1024, far=2048, iters=3)
    elif args.set == "leaf4m":
        # Post-octet leaf retune at scale: the leaf-256 autos at 4M+ were
        # tuned when the far field paid a budget-wide HBM gather. Octet
        # makes far entries ~3x cheaper, so the 2.7x near-pair saving of
        # leaf 128 may now win despite 2x the leaves.
        pos, mass = get_state(1 << 22)
        case(pos, mass, leaf=128, refine="staged", far_mode="octet",
             near=2048, far=2560, iters=3)
        case(pos, mass, leaf=256, refine="staged", far_mode="octet",
             iters=3)
    elif args.set == "leaf8m":
        pos, mass = get_state(1 << 23)
        case(pos, mass, leaf=128, refine="staged", far_mode="octet",
             near=2048, far=2560, iters=3)
        case(pos, mass, leaf=256, refine="staged", far_mode="octet",
             iters=3)
    elif args.set == "leafgal":
        pos, mass = get_state(1 << 21, ic="galaxy_collision")
        case(pos, mass, leaf=128, refine="staged", far_mode="octet",
             near=3072, far=2560, iters=3)
        case(pos, mass, leaf=256, refine="staged", far_mode="octet",
             near=3584, far=2816, iters=3)


if __name__ == "__main__":
    main()
