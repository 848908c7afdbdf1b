"""Mask-fill statistics for an octet-compressed NEAR list.

The octet far kernel (ops/pallas_bh.py) amortizes per-entry dynamic-read
latency 8x by reading (8, 128) sibling tiles with a child mask. The near
kernel could do the same: 8 sibling leaves are 8*G consecutive sorted
particles, so one (4, 8*G) resident-table read per sibling-octet replaces
up to 8 (4, G) reads. The cost is padding: masked-out siblings still pay
compute (pairs scale by 1/fill). Break-even at N=1M (measured r5):

  G=256: read tax ~32 ms, pair floor 156 ms -> needs fill >= ~0.83
  G=128: read tax ~44 ms, pair floor  57 ms -> needs fill >= ~0.60

This script measures the actual fill: for each target leaf, its near list
grouped by source-octet (idx // 8), fill = count / (8 * n_octets).

Usage: python scripts/near_octet_stats.py [--n 1048576] [--leaf 256]
                                          [--near 3584] [--far 2816]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.api import init_simulation  # noqa: E402
from parallelnbody_tpu.ops import bh  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--near", type=int, default=3584)
    ap.add_argument("--far", type=int, default=2816)
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, ic="plummer", softening=0.01, dt=1e-4,
                    force="barnes_hut", theta=args.theta)
    state = init_simulation(cfg)

    prep = jax.jit(functools.partial(
        bh._prepare, leaf_size=args.leaf, curve="hilbert",
        multipole_order=2))
    pos_s, mass_s, perm, tree, n, n_pad = prep(state.pos, state.mass)
    n_leaves = int(n_pad) // args.leaf
    trav = jax.jit(functools.partial(bh.traverse, theta=args.theta))
    _, rejects_l1 = trav(tree)
    li = jax.jit(functools.partial(
        bh.leaf_interactions, theta=args.theta, start_leaf=0,
        n_slice=n_leaves, near_budget=args.near, far0_budget=args.far))
    near_idx, near_valid, _, _, overflow = li(tree, rejects_l1)

    near_idx = np.asarray(jax.device_get(near_idx))
    near_valid = np.asarray(jax.device_get(near_valid))
    print(f"n_leaves={n_leaves} overflow={int(jax.device_get(overflow))}",
          flush=True)

    counts = near_valid.sum(axis=1)
    octets = np.where(near_valid, near_idx // 8, -1)
    fills, n_octs = [], []
    for t in range(n_leaves):
        row = octets[t][octets[t] >= 0]
        if row.size == 0:
            continue
        k = np.unique(row).size
        fills.append(row.size / (8 * k))
        n_octs.append(k)
    fills = np.array(fills)
    n_octs = np.array(n_octs)
    print(json.dumps({
        "near_count": {"mean": float(counts.mean()),
                       "max": int(counts.max())},
        "octets_per_target": {"mean": float(n_octs.mean()),
                              "p50": int(np.percentile(n_octs, 50)),
                              "max": int(n_octs.max())},
        "mask_fill": {"mean": float(fills.mean()),
                      "p10": float(np.percentile(fills, 10)),
                      "p50": float(np.percentile(fills, 50)),
                      "p90": float(np.percentile(fills, 90))},
        "pair_mult_if_octet": float((8 * n_octs.sum()) / counts.sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
