"""Moment-based MAC experiment (falcON-style): replace the source node's
worst-case bounding radius in the MAC with k * r_rms (mass-weighted rms
member distance). Fat sparse-region leaves have r_max >> r_rms, so this
should shrink near/far lists — measure rms/p99.9 force error vs direct and
the list sizes at N=262144, plus N=1M timing.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation
from parallelnbody_tpu.ops import bh
from parallelnbody_tpu.ops.pallas_direct import pallas_accel_tile
from parallelnbody_tpu.utils.profiling import force_sync

LEAF, NB, FB, THETA = 256, 3584, 1536, 0.72


def rms_radii(pos_s, mass_s, tree):
    """Mass-weighted rms member distance per node, per level (parallel-axis
    upward propagation)."""
    n_leaves = tree.com[0].shape[0]
    p = pos_s.reshape(n_leaves, LEAF, 3)
    m = mass_s.reshape(n_leaves, LEAF)
    msum = jnp.maximum(jnp.sum(m, axis=1), 1e-30)
    d2 = jnp.sum((p - tree.com[0][:, None, :]) ** 2, axis=-1)
    s2 = [jnp.sum(m * d2, axis=1) / msum]
    for k in range(1, tree.n_levels):
        b = tree.com[k - 1].shape[0] // tree.com[k].shape[0]
        mm = tree.mass[k - 1].reshape(-1, b)
        cc = tree.com[k - 1].reshape(-1, b, 3)
        shift = jnp.sum((cc - tree.com[k][:, None, :]) ** 2, axis=-1)
        mk = jnp.maximum(tree.mass[k], 1e-30)
        s2.append(jnp.sum(mm * (s2[-1].reshape(-1, b) + shift), axis=1) / mk)
    return [jnp.sqrt(x) for x in s2]


def run(st, radii_mode, k_rms, n, ref=None, time_it=False):
    prep = jax.jit(lambda p, m: bh._prepare(p, m, leaf_size=LEAF,
                                            curve="hilbert",
                                            multipole_order=2))

    @functools.partial(jax.jit, static_argnames=())
    def forces(pos, mass):
        pos_s, mass_s, perm, tree, _, n_pad = bh._prepare(
            pos, mass, leaf_size=LEAF, curve="hilbert", multipole_order=2)
        if radii_mode == "rms":
            rr = rms_radii(pos_s, mass_s, tree)
            # cap by the true bounding radius (rms*k can exceed it only for
            # tiny nodes; the min keeps the MAC no looser than geometric
            # would ever need)
            rad = tuple(jnp.minimum(k_rms * r, t)
                        for r, t in zip(rr, tree.radius))
            tree = tree._replace(radius=rad)
        far_masks, rejects = bh.traverse(tree, THETA)
        n_leaves = n_pad // LEAF
        acc, pot, ovf = bh._forces_sorted(
            pos_s, mass_s, tree, far_masks, rejects, start_leaf=0,
            n_slice=n_leaves, leaf_size=LEAF, theta=THETA, g=1.0,
            softening=0.01, near_budget=NB, far0_budget=FB,
            use_pallas=bh.use_pallas_bh(), compute_pot=False)
        _, ax, ay, az, _ = jax.lax.sort(
            (perm.astype(jnp.int32), acc[:, 0], acc[:, 1], acc[:, 2], pot),
            num_keys=1)
        return jnp.stack([ax, ay, az], axis=1)[:n], ovf

    acc, ovf = forces(st.pos, st.mass)
    out = {"ovf": int(ovf)}
    if ref is not None:
        e = np.linalg.norm(np.asarray(acc) - ref, axis=1) / np.linalg.norm(ref, axis=1)
        out |= {"rms": float(np.sqrt(np.mean(e * e))),
                "p999": float(np.percentile(e, 99.9)),
                "max": float(e.max())}
    if time_it:
        force_sync(acc)
        t0 = time.perf_counter()
        for _ in range(5):
            acc, _ = forces(st.pos, st.mass)
        force_sync(acc)
        out["ms"] = (time.perf_counter() - t0) / 5 * 1e3
    return out


def main():
    st = init_simulation(SimConfig(n=262144, ic="plummer", softening=0.01,
                                   force="direct_pallas",
                                   track_potential=False))
    acc_ref, _ = pallas_accel_tile(st.pos, st.pos, st.mass, g=1.0,
                                   softening=0.01, compute_pot=False)
    ref = np.asarray(acc_ref)

    big = init_simulation(SimConfig(n=1048576, ic="plummer", softening=0.01,
                                    force="barnes_hut", bh_leaf_size=LEAF,
                                    theta=THETA, bh_near_budget=NB,
                                    bh_far_budget=FB, track_potential=False))

    for mode, k in (("geom", 0.0), ("rms", 3.0), ("rms", 2.5), ("rms", 2.0)):
        r = run(st, mode, k, 262144, ref=ref)
        t = run(big, mode, k, 1048576, time_it=True)
        print(f"{mode} k={k}: 262k rms={r['rms']:.2e} p999={r['p999']:.2e} "
              f"max={r['max']:.2e} ovf={r['ovf']} | 1M t={t['ms']:.0f} ms "
              f"ovf={t['ovf']}", flush=True)


if __name__ == "__main__":
    main()
