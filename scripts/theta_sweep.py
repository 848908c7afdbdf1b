"""Sweep Barnes-Hut theta: rms force error vs direct sum (N=262144) and
N=1M force-eval wall clock, to pick the bench operating point."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation
from parallelnbody_tpu.ops.bh import bh_accel, use_pallas_bh
from parallelnbody_tpu.ops.pallas_direct import pallas_accel_tile
from parallelnbody_tpu.utils.profiling import force_sync

LEAF, NEAR_B, FAR_B = 256, 512, 2048


def timeit(fn, *args, iters=5):
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    use_pallas = use_pallas_bh()

    # Accuracy at N=262144 vs fp32 Pallas direct sum.
    cfg = SimConfig(n=262144, ic="plummer", softening=0.01)
    st = init_simulation(cfg.replace(force="direct_pallas"))
    acc_ref, _ = pallas_accel_tile(st.pos, st.pos, st.mass, g=1.0,
                                   softening=0.01)
    ref_norm = jnp.sqrt(jnp.mean(jnp.sum(acc_ref * acc_ref, axis=1)))

    # Timing state at N=1M.
    big = init_simulation(
        SimConfig(n=1048576, ic="plummer", softening=0.01,
                  force="barnes_hut", bh_leaf_size=LEAF, theta=0.7,
                  bh_near_budget=NEAR_B, bh_far_budget=FAR_B, bh_multipole=2))

    for theta in (0.7, 0.75, 0.8, 0.85):
        f = jax.jit(functools.partial(
            bh_accel, leaf_size=LEAF, theta=theta, g=1.0, softening=0.01,
            near_budget=NEAR_B, far0_budget=FAR_B, use_pallas=use_pallas,
            curve="hilbert", multipole=2))
        acc, _, ovf = f(st.pos, st.mass)
        err = float(jnp.sqrt(jnp.mean(jnp.sum((acc - acc_ref) ** 2, axis=1)))
                    / ref_norm)
        t, (_, _, ovf_big) = timeit(f, big.pos, big.mass)
        print(f"theta={theta}: rms_err={err:.2e} ovf_262k={int(ovf)} "
              f"ovf_1m={int(ovf_big)} t_1m={t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
