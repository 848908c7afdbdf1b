"""End-to-end A/B of the octet-masked resident-table far field on TPU.

Times bh_accel (full force eval, compute_pot=False to match the official
suite) at N=1M for gather vs octet far modes at the relevant operating
points, plus the isolated far-kernel phase. Usage:

    python scripts/octet_probe.py [--n 1048576] [--quick]
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


def case(pos, mass, *, leaf, refine, far_mode, theta, near, far, iters=5):
    t, (acc, pot, of) = timeit(
        bh.bh_accel, pos, mass, leaf_size=leaf, theta=theta, g=1.0,
        softening=0.01, near_budget=near, far0_budget=far,
        use_pallas=bh.use_pallas_bh(), curve="hilbert", multipole=2,
        compute_pot=False, refine=refine, far_mode=far_mode, iters=iters)
    print(f"leaf={leaf} refine={refine} far={far_mode}: {t*1e3:.1f} ms  "
          f"overflow={int(of)}", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, ic="plummer", softening=0.01, dt=1e-4,
                    force="barnes_hut", theta=args.theta)
    state = init_simulation(cfg)
    pos, mass = state.pos, state.mass
    print(f"backend={jax.default_backend()} n={args.n}", flush=True)

    # The round-4 operating points at N=1M: dense-256 (the 259 ms champion)
    # and staged-128 (262.5 ms).
    case(pos, mass, leaf=256, refine="dense", far_mode="gather",
         theta=args.theta, near=3584, far=2816)
    case(pos, mass, leaf=256, refine="dense", far_mode="octet",
         theta=args.theta, near=3584, far=2816)
    if args.quick:
        return
    case(pos, mass, leaf=128, refine="staged", far_mode="gather",
         theta=args.theta, near=2048, far=4096)
    case(pos, mass, leaf=128, refine="staged", far_mode="octet",
         theta=args.theta, near=2048, far=4096)


if __name__ == "__main__":
    main()
