"""Cell-aligned (radius-bounded) leaf groups: the decisive statistics probe
(VERDICT r2 #1).

Equal-count Hilbert leaves in sparse regions have bounding radii up to ~25x
the median, so their group MAC makes them near-everything (measured max near
count 3469/4096 at N=1M, theta=0.72). The proposed structural fix is
Cornerstone-style leaves aligned to Hilbert key prefixes — a leaf is the
coarsest octree cell holding <= G particles (optionally also refined to a
depth floor), so its bounding radius is bounded by its cell size.

This probe computes, for the SAME particle set, the near/far list statistics
of both structures and converts them to predicted kernel work:

  * padded tile work = (#near list entries) x G^2 pairs — what the shipped
    (G x G)-tile near kernel actually executes;
  * true pair work  = sum over near pairs of fill_t x fill_s — what an
    ideal CSR kernel (scripts/flat_kernel_tune2.py, 1.26e11 pairs/s) would
    execute.

If cell alignment does not cut the PADDED tile work (the real kernel cost),
it is a measured dead end distinct from the already-rejected sub-group
refinement. Run on CPU (statistics only, no kernels).

Usage: python scripts/cell_leaves_probe.py [--n 1048576] [--g 256]
                                           [--theta 0.72]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.models import get_ic  # noqa: E402
from parallelnbody_tpu.ops.hilbert import hilbert_encode  # noqa: E402
from parallelnbody_tpu.ops.morton import MORTON_BITS  # noqa: E402
from parallelnbody_tpu.ops.bh import domain_cube, MAC_SIZE_SCALE  # noqa: E402


def leaf_stats(name, starts, ends, pos_s, mass_s, theta, G, t0):
    n_leaves = len(starts)
    fills = ends - starts
    com = np.zeros((n_leaves, 3), np.float32)
    rad = np.zeros(n_leaves, np.float32)
    # vectorized per-leaf com/radius via reduceat
    m = mass_s
    mw = np.add.reduceat(m, starts)
    for c in range(3):
        com[:, c] = np.add.reduceat(m * pos_s[:, c], starts) / np.maximum(
            mw, 1e-30)
    # radius: max member distance to com
    leaf_of = np.repeat(np.arange(n_leaves), fills)
    d = np.linalg.norm(pos_s - com[leaf_of], axis=1)
    np.maximum.at(rad, leaf_of, d)

    counts = np.zeros(n_leaves, np.int64)
    true_pairs = 0.0
    block = max(256, (1 << 27) // max(n_leaves, 1))
    fills_f = fills.astype(np.float64)
    for r0 in range(0, n_leaves, block):
        r1 = min(r0 + block, n_leaves)
        d2 = np.zeros((r1 - r0, n_leaves), np.float32)
        for c in range(3):
            dc = com[None, :, c] - com[r0:r1, None, c]
            d2 += dc * dc
        dd = np.sqrt(d2)
        near = (MAC_SIZE_SCALE * rad[None, :]) >= (
            theta * (dd - rad[r0:r1, None]))
        counts[r0:r1] = near.sum(1)
        true_pairs += float((near @ fills_f) @ fills_f[r0:r1])
    tiles = int(counts.sum())
    q = lambda a, p: float(np.percentile(a, p))
    print(f"[{name}] n_leaves={n_leaves} fill mean={fills.mean():.0f} "
          f"p10={q(fills,10):.0f} p50={q(fills,50):.0f} "
          f"radius p50={q(rad,50):.3g} p99={q(rad,99):.3g} "
          f"max={rad.max():.3g}")
    print(f"[{name}] near/target mean={counts.mean():.0f} "
          f"p99={q(counts,99):.0f} max={counts.max()} | "
          f"tiles={tiles} padded_pairs={tiles * G * G:.3e} "
          f"(~{tiles * G * G / 1.79e11 * 1e3:.0f} ms @1.79e11/s) | "
          f"true_pairs={true_pairs:.3e} "
          f"(~{true_pairs / 1.26e11 * 1e3:.0f} ms @CSR 1.26e11/s)  "
          f"[{time.time() - t0:.0f}s]", flush=True)
    return tiles, true_pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--g", type=int, default=256)
    ap.add_argument("--theta", type=float, default=0.72)
    args = ap.parse_args()
    t0 = time.time()

    cfg = SimConfig(n=args.n, ic="plummer")
    pos, _, mass = get_ic("plummer")(jax.random.key(0), cfg)
    pos = np.asarray(pos)
    mass = np.asarray(mass)
    lo, hi = pos.min(0), pos.max(0)
    center, half, _ = domain_cube(jnp.asarray(lo), jnp.asarray(hi))
    keys = np.asarray(hilbert_encode(jnp.asarray(pos), center, half))
    order = np.argsort(keys, kind="stable")
    keys_s, pos_s, mass_s = keys[order], pos[order], mass[order]
    n = args.n
    G = args.g
    print(f"n={n} G={G} theta={args.theta} bits={MORTON_BITS} "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # ---- equal-count leaves (current design)
    n_leaves_eq = -(-n // G)
    starts = np.arange(n_leaves_eq) * G
    ends = np.minimum(starts + G, n)
    leaf_stats("equal-count", starts, ends, pos_s, mass_s, args.theta, G, t0)

    # ---- cell-aligned: leaf = coarsest cell with count <= G, with an
    # optional depth floor d_floor (bounds cell size to half/2^(d_floor-1)).
    bits = MORTON_BITS
    # per-particle cell count at each depth
    leaf_depth = np.full(n, bits, np.int8)
    done = np.zeros(n, bool)
    for d in range(0, bits + 1):
        cid = keys_s >> (3 * (bits - d))
        _, inv, cnt = np.unique(cid, return_inverse=True, return_counts=True)
        ok = (cnt[inv] <= G) & ~done
        leaf_depth[ok] = d
        done |= ok
        if done.all():
            break

    for d_floor in (0, 3, 4, 5):
        dd = np.maximum(leaf_depth, d_floor)
        # leaf id = cell id at the particle's leaf depth, tagged by depth;
        # runs are contiguous in sorted order
        cid = keys_s >> (3 * (bits - dd).astype(np.int64))
        tag = cid.astype(np.int64) * (bits + 1) + dd
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = tag[1:] != tag[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        leaf_stats(f"cell d_floor={d_floor}", starts, ends, pos_s, mass_s,
                   args.theta, G, t0)


if __name__ == "__main__":
    main()
