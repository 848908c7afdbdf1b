"""Can a finer IMPORT granularity shrink the LET essential set? (VERDICT
r4 #7.)

The measured essential set at theta=0.72 is 0.55-1.0 of ALL leaves
(scripts/let_halo_probe.py): equal-count Hilbert leaves in sparse regions
have bounding radii up to 25x the median, so their group MAC fails against
almost every target and the whole fat leaf ships. Cell-aligned leaves are a
measured dead end for COMPUTE (r4: padded tile work unchanged), but the
EXCHANGE could use a different granularity: split each source leaf into s
Hilbert-contiguous sub-tiles of G/s particles, give each its own bounding
sphere, and import a sub-tile only when ITS OWN group MAC fails against
some target of the rank. A sub-tile whose MAC passes would be evaluated as
a sub-tile multipole riding the (tiny) summary all_gather instead — the
standard MAC argument keeps accuracy, at the cost of sub-tile multipole
rows (8x the summary table, still KB-scale) and a near kernel that accepts
ragged [imported-sub-tile] source windows.

This probe measures ONLY the geometry: for s in {1, 2, 4, 8} and a
split-fat-only variant (split just the leaves with radius > 4x median),
the per-rank imported VOLUME (particle rows x 16 B) as a fraction of the
s=1 essential set and of the ring's (P-1) x N/P volume. Decision rule: the
kernel surgery is worth scoping only if volume drops well below the ring
on a realistic IC.

  PYTHONPATH=. python scripts/let_granularity_probe.py \
      [--n 1048576] [--ranks 8] [--ic plummer,disk] [--theta 0.72]

Results -> docs/DESIGN.md §4 (adopt or dead-end row).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.ops import bh  # noqa: E402
from parallelnbody_tpu.models import get_ic  # noqa: E402


def subtile_geometry(pos_s, mass_s, leaf, s):
    """Bounding sphere (com approximated by the centroid of live rows,
    radius = max distance to it) of each Hilbert-contiguous G/s sub-tile."""
    n_pad = pos_s.shape[0]
    g = leaf // s
    p = pos_s.reshape(n_pad // g, g, 3)
    m = mass_s.reshape(n_pad // g, g)
    live = (m > 0)[..., None]
    cnt = jnp.maximum(jnp.sum(live, axis=1), 1)
    com = jnp.sum(jnp.where(live, p, 0.0), axis=1) / cnt
    d = jnp.sqrt(jnp.sum((p - com[:, None, :]) ** 2, axis=2))
    rad = jnp.max(jnp.where(live[..., 0], d, 0.0), axis=1)
    occ = jnp.any(live[..., 0], axis=1)
    return com, rad, occ


def near_fail_mask(tgt_com, tgt_r, src_com, src_r, theta, chunk=1024):
    """(n_tgt, n_src) True where the group MAC FAILS (source must be near).
    Chunked over targets to bound the dense plane at 1M-scale inputs."""
    outs = []
    for t0 in range(0, tgt_com.shape[0], chunk):
        tc = tgt_com[t0:t0 + chunk]
        tr = tgt_r[t0:t0 + chunk]
        d2 = jnp.zeros((tc.shape[0], src_com.shape[0]), tc.dtype)
        for c in range(3):
            dc = src_com[:, c][None, :] - tc[:, c][:, None]
            d2 = d2 + dc * dc
        fail = src_r[None, :] >= theta * (jnp.sqrt(d2) - tr[:, None])
        outs.append(fail)
    return jnp.concatenate(outs, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--ranks", type=int, default=8)
    ap.add_argument("--ic", default="plummer,disk")
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--leaf", type=int, default=0)
    ap.add_argument("--out", default="/tmp/let_granularity.json")
    args = ap.parse_args()

    report = []
    for ic in args.ic.split(","):
        cfg = SimConfig(n=args.n, ic=ic, theta=args.theta,
                        force="barnes_hut", softening=0.01, dt=1e-4)
        leaf = args.leaf or cfg.resolve_bh_leaf_size()
        key = jax.random.key(cfg.seed)
        pos, _, mass = get_ic(ic)(key, cfg)
        pos_s, mass_s, _, tree, n, n_pad = bh._prepare(
            pos, mass, leaf_size=leaf, curve="hilbert", multipole_order=1)
        n_leaves = n_pad // leaf
        per = n_leaves // args.ranks
        leaf_com, leaf_r = tree.com[0], tree.radius[0]
        leaf_m = tree.mass[0]
        med_r = float(jnp.median(jnp.where(leaf_m > 0, leaf_r, jnp.nan)))
        row = {"ic": ic, "n": args.n, "leaf": leaf, "n_leaves": n_leaves,
               "ranks": args.ranks, "theta": args.theta,
               "ring_rows_per_rank": (args.ranks - 1) * n_pad // args.ranks,
               "variants": {}}

        def measure(src_com, src_r, src_occ, rows_per_src, label,
                    leaf_of_src):
            """Per-rank imported rows: sources outside the rank's own leaf
            range whose MAC fails vs ANY target leaf of the rank."""
            imported = []
            for r in range(args.ranks):
                t0, t1 = r * per, (r + 1) * per
                tm = leaf_m[t0:t1] > 0
                fail = near_fail_mask(leaf_com[t0:t1], leaf_r[t0:t1],
                                      src_com, src_r, args.theta)
                fail = fail & tm[:, None] & src_occ[None, :]
                needed = jnp.any(fail, axis=0)
                own = (leaf_of_src >= t0) & (leaf_of_src < t1)
                imported.append(int(jnp.sum(needed & ~own)) * rows_per_src)
            imported = np.asarray(imported)
            row["variants"][label] = {
                "rows_per_rank_mean": float(imported.mean()),
                "rows_per_rank_max": int(imported.max()),
                "frac_of_ring": float(imported.mean()
                                      / row["ring_rows_per_rank"]),
            }

        # s = 1 is today's leaf-granularity import (baseline).
        leaf_ids = jnp.arange(n_leaves, dtype=jnp.int32)
        measure(leaf_com, leaf_r, leaf_m > 0, leaf, "s1_leaf", leaf_ids)
        # Per-owner-pair import maxima in LEAVES — what bh_import_budget
        # actually caps (cfg doc): the measured value that lets a static
        # budget shrink the COMPILED LET volume below the auto (= full
        # neighbor width) while staying overflow-free on this IC.
        pair_max = 0
        for r in range(args.ranks):
            t0, t1 = r * per, (r + 1) * per
            tm = leaf_m[t0:t1] > 0
            fail = near_fail_mask(leaf_com[t0:t1], leaf_r[t0:t1],
                                  leaf_com, leaf_r, args.theta)
            fail = fail & tm[:, None] & (leaf_m > 0)[None, :]
            needed = jnp.any(fail, axis=0).reshape(args.ranks, per)
            needed = needed.at[r].set(False)
            pair_max = max(pair_max, int(jnp.max(jnp.sum(needed, axis=1))))
        row["import_budget_pair_max_leaves"] = pair_max
        row["import_budget_auto_leaves"] = per
        for s in (2, 4, 8):
            com, rad, occ = subtile_geometry(pos_s, mass_s, leaf, s)
            src_leaf = jnp.arange(n_leaves * s, dtype=jnp.int32) // s
            measure(com, rad, occ, leaf // s, f"s{s}_subtile", src_leaf)
        # Split-fat-only: sub-tile (s=8) geometry for leaves with radius
        # > 4x median, leaf geometry elsewhere — the minimal-surgery form.
        com8, rad8, occ8 = subtile_geometry(pos_s, mass_s, leaf, 8)
        fat = leaf_r > 4.0 * med_r
        fat_sub = jnp.repeat(fat, 8)
        com_m = jnp.where(fat_sub[:, None], com8,
                          jnp.repeat(leaf_com, 8, axis=0))
        rad_m = jnp.where(fat_sub, rad8, jnp.repeat(leaf_r, 8))
        # Non-fat leaves appear 8x at full leaf radius: count their rows
        # once via rows_per_src of leaf/8 and needed-any semantics — the
        # 8 copies of a non-fat leaf share identical geometry, so all 8
        # are needed together and sum to exactly `leaf` rows.
        src_leaf8 = jnp.arange(n_leaves * 8, dtype=jnp.int32) // 8
        measure(com_m, rad_m, occ8 | jnp.repeat(leaf_m > 0, 8),
                leaf // 8, "fat_only_s8", src_leaf8)
        row["fat_leaves_frac"] = float(jnp.mean(fat.astype(jnp.float32)))
        report.append(row)
        print(json.dumps(row, indent=2), flush=True)

    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")


if __name__ == "__main__":
    main()
