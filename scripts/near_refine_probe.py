"""Quantify near-field refinement options at scale, before building one.

Questions this answers (the data that picks the round-3 near-field design):
  1. How are near pairs distributed over SOURCE leaves — do a few fat
     (large-bounding-radius) leaves dominate the near work?
  2. If the near/far decision were refined to sub-groups of the source leaf
     (sub = 32/64/128 consecutive sorted particles with their own CoM and
     bounding radius), how many near pairs remain?  Sub-entries are exact
     per-particle at sub granularity; a sub that passes the MAC becomes a
     cheap multipole ("mid" class).
  3. Of the refined near entries, what fraction are FULL leaves (all subs
     near) — those can keep streaming through the existing 256-wide kernel
     at full lane efficiency; only partial entries pay the narrow-tile tax.

Usage: python scripts/near_refine_probe.py [--n 1048576] [--theta 0.72]
                                           [--leaf 256]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.api import init_simulation  # noqa: E402
from parallelnbody_tpu.ops import bh  # noqa: E402


def group_moments(pos_s, mass_s, size):
    """CoM + bounding radius of consecutive groups of `size` sorted particles."""
    n_pad = pos_s.shape[0]
    k = n_pad // size
    p = pos_s.reshape(k, size, 3)
    m = mass_s.reshape(k, size)
    msum = jnp.sum(m, axis=1)
    com = jnp.sum(m[:, :, None] * p, axis=1) / jnp.maximum(msum, 1e-30)[:, None]
    r = jnp.linalg.norm(p - com[:, None, :], axis=-1)
    radius = jnp.max(jnp.where(m > 0, r, 0.0), axis=1)
    return com, radius, msum


def d_plane(tgt_com, src_com):
    d2 = jnp.zeros((tgt_com.shape[0], src_com.shape[0]), tgt_com.dtype)
    for c in range(3):
        dc = src_com[:, c][None, :] - tgt_com[:, c][:, None]
        d2 = d2 + dc * dc
    return jnp.sqrt(d2)


@functools.partial(jax.jit, static_argnames=("theta", "sub_per_leaf"))
def chunk_stats(tgt_com, tgt_r, leaf_com, leaf_r, sub_com, sub_r, *, theta,
                sub_per_leaf):
    """For one chunk of target leaves: current near mask at leaf granularity,
    per-sub refined near counts, and per-entry sub-count histogram pieces."""
    d = d_plane(tgt_com, leaf_com)                     # (T, L)
    near_leaf = leaf_r[None, :] >= theta * (d - tgt_r[:, None])

    ds = d_plane(tgt_com, sub_com)                     # (T, L*S)
    near_sub = sub_r[None, :] >= theta * (ds - tgt_r[:, None])
    T, LS = near_sub.shape
    near_sub = near_sub.reshape(T, LS // sub_per_leaf, sub_per_leaf)
    # Only subs inside leaf-level-near entries count (the rest are already far)
    near_sub = near_sub & near_leaf[:, :, None]
    k_sub = jnp.sum(near_sub, axis=2)                  # (T, L) subs near 0..S

    near_leaf_counts = jnp.sum(near_leaf, axis=1)
    sub_counts = jnp.sum(k_sub, axis=1)                # near subs per target
    full = jnp.sum(k_sub == sub_per_leaf, axis=1)      # full-leaf entries
    partial = jnp.sum((k_sub > 0) & (k_sub < sub_per_leaf), axis=1)
    partial_subs = jnp.sum(jnp.where(k_sub < sub_per_leaf, k_sub, 0), axis=1)
    # mid class: subs of near leaves that individually pass the MAC -> become
    # multipole (not exact) entries in the refined design
    mid_counts = near_leaf_counts * sub_per_leaf - sub_counts
    # source-side: how many targets list leaf j as near (column sums)
    src_hits = jnp.sum(near_leaf, axis=0)
    return (near_leaf_counts, sub_counts, full, partial, partial_subs,
            src_hits, mid_counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--ic", default="plummer")
    args = ap.parse_args()
    G = args.leaf

    cfg = SimConfig(n=args.n, ic=args.ic, softening=0.01, dt=1e-4,
                    force="barnes_hut", theta=args.theta, bh_leaf_size=G)
    state = init_simulation(cfg)
    pos_s, mass_s, _, tree, n, n_pad = jax.jit(functools.partial(
        bh._prepare, leaf_size=G, curve="hilbert"))(state.pos, state.mass)
    n_leaves = n_pad // G
    leaf_com, leaf_r = tree.com[0], tree.radius[0]
    print(f"n={n} n_leaves={n_leaves} backend={jax.default_backend()}",
          flush=True)
    rad = np.asarray(leaf_r)
    med = float(np.median(rad))
    print(f"leaf radius: med={med:.4f} p90={np.percentile(rad, 90):.4f} "
          f"p99={np.percentile(rad, 99):.4f} max={rad.max():.4f}", flush=True)

    for sub in (32, 64, 128):
        spl = G // sub
        sub_com, sub_r, _ = group_moments(pos_s, mass_s, sub)
        tot_leaf = tot_sub = tot_full = tot_partial = tot_psubs = 0.0
        src_hits = np.zeros(n_leaves)
        all_sub_counts, all_mid_counts = [], []
        for t0 in range(0, n_leaves, args.chunk):
            tc = jax.lax.dynamic_slice_in_dim(leaf_com, t0, args.chunk, 0)
            tr = jax.lax.dynamic_slice_in_dim(leaf_r, t0, args.chunk, 0)
            out = chunk_stats(tc, tr, leaf_com, leaf_r, sub_com, sub_r,
                              theta=args.theta, sub_per_leaf=spl)
            nl, ns, fl, pa, ps, sh, mc = [np.asarray(o) for o in out]
            tot_leaf += nl.sum(); tot_sub += ns.sum(); tot_full += fl.sum()
            tot_partial += pa.sum(); tot_psubs += ps.sum()
            src_hits += sh
            all_sub_counts.append(ns); all_mid_counts.append(mc)
        sc = np.concatenate(all_sub_counts); mc = np.concatenate(all_mid_counts)
        print(f"sub counts/target: mean {sc.mean():.0f} p50 "
              f"{np.percentile(sc,50):.0f} p99 {np.percentile(sc,99):.0f} "
              f"p999 {np.percentile(sc,99.9):.0f} max {sc.max()}", flush=True)
        print(f"mid counts/target: mean {mc.mean():.0f} p99 "
              f"{np.percentile(mc,99):.0f} max {mc.max()} "
              f"total {mc.sum():.3e}", flush=True)
        pairs_cur = tot_leaf * G * G
        pairs_ref = tot_sub * G * sub
        # effective pairs if partial entries run at sub-tile width `sub`
        # padded to 128 lanes:
        lane_eff = max(sub, 128) / sub
        pairs_eff = (tot_full * G * G
                     + tot_psubs * G * sub * lane_eff)
        print(f"\n--- sub={sub} (per-leaf {spl}) ---", flush=True)
        print(f"near leaf entries: {tot_leaf:.3e} "
              f"(mean/target {tot_leaf/n_leaves:.1f}) "
              f"pairs {pairs_cur:.3e} = {pairs_cur/1.79e11*1e3:.0f} ms-eq",
              flush=True)
        print(f"refined near subs: {tot_sub:.3e} pairs {pairs_ref:.3e} "
              f"= {pairs_ref/1.79e11*1e3:.0f} ms-eq "
              f"(reduction {pairs_cur/max(pairs_ref,1):.2f}x)", flush=True)
        print(f"full-leaf entries {tot_full:.3e} ({tot_full/max(tot_leaf,1)*100:.0f}% "
              f"of entries) partial {tot_partial:.3e} w/ {tot_psubs:.3e} subs; "
              f"eff pairs (lane-padded) {pairs_eff:.3e} "
              f"= {pairs_eff/1.79e11*1e3:.0f} ms-eq", flush=True)
        if sub == 32:
            # fat-source domination: cumulative near-pair share by radius
            order = np.argsort(-rad)
            hits_sorted = src_hits[order]
            cum = np.cumsum(hits_sorted) / max(src_hits.sum(), 1)
            for k in (8, 32, 128, 512):
                print(f"  top-{k} fattest sources: {cum[k-1]*100:.1f}% of near "
                      f"entries (radius >= {rad[order[k-1]]:.3f})", flush=True)


if __name__ == "__main__":
    main()
