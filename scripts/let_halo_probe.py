"""Measure the locally-essential halo behind bh_comm='let'.

The LET near field (parallel/distributed.py _near_let) imports only the
source leaf tiles a rank's near lists reference; its comm volume per force
evaluation is the halo surface, vs the ring's (P-1) full-shard ppermutes.
This probe measures that halo EXACTLY, without a mesh: it builds the global
sorted tree single-chip (the distributed leaf structure modulo per-rank
padding), slices the near lists per contiguous rank window (the same
traverse/build_interaction_lists the distributed path calls with
start_leaf/n_slice), and reports per rank:

  * needed leaves (own + imported) and the import fraction of the global
    leaf count,
  * the max per-owner-pair import count (what bh_import_budget must cover),
  * LET vs ring comm bytes per force evaluation.

Usage: python scripts/let_halo_probe.py [--n 262144] [--ranks 8]
       [--theta 0.72] [--leaf 0] (runs each builtin case; CPU or TPU)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# sitecustomize pins the axon TPU backend; honor an explicit CPU request
# (CLAUDE.md gotcha #1 — the env var alone is ignored).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation
from parallelnbody_tpu.ops.bh import (
    _prepare, traverse, build_interaction_lists,
    build_interaction_lists_staged, resolve_refine,
)


def rank_near_lists(tree, theta, refine, cands, start, n_slice, *,
                    near_budget, far_budget, dtype):
    if refine == "staged":
        far_masks, rej2 = traverse(tree, theta, start_leaf=start,
                                   n_slice=n_slice, stop_level=2)
        near_idx, near_valid, *_ = build_interaction_lists_staged(
            tree, far_masks, rej2, theta=theta, start_leaf=start,
            n_slice=n_slice, near_budget=near_budget, far_budget=far_budget,
            cand2_budget=cands[0], cand1_budget=cands[1], dtype=dtype,
            octet_far=True)
    else:
        far_masks, rejects_l1 = traverse(tree, theta, start_leaf=start,
                                         n_slice=n_slice)
        near_idx, near_valid, *_ = build_interaction_lists(
            tree, far_masks, rejects_l1, theta=theta, start_leaf=start,
            n_slice=n_slice, near_budget=near_budget,
            far0_budget=far_budget, dtype=dtype)
    return near_idx, near_valid


def run_case(name, cfg, n_ranks):
    state = init_simulation(cfg, compute_forces=False)
    leaf_size = cfg.resolve_bh_leaf_size()
    pos_s, mass_s, _, tree, _, n_pad = jax.jit(
        lambda p, m: _prepare(p, m, leaf_size=leaf_size, curve=cfg.bh_curve,
                              multipole_order=cfg.bh_multipole,
                              max_levels=cfg.bh_max_levels)
    )(state.pos, state.mass)
    n_pad = int(n_pad)
    l_glob = n_pad // leaf_size
    n_leaf_loc = -(-l_glob // n_ranks)
    refine, cands = resolve_refine(
        cfg.resolve_bh_refine(), (cfg.bh_cand2_budget, cfg.bh_cand_budget),
        int(tree.n_levels), cfg.bh_near_budget, cfg.bh_far_budget)

    per_rank = []
    fn = jax.jit(rank_near_lists, static_argnames=(
        "theta", "refine", "cands", "start", "n_slice", "near_budget",
        "far_budget", "dtype"))
    for r in range(n_ranks):
        start = r * n_leaf_loc
        ns = min(n_leaf_loc, l_glob - start)
        if ns <= 0:
            break
        idx, valid = fn(tree, theta=cfg.theta, refine=refine, cands=cands,
                        start=start, n_slice=ns,
                        near_budget=cfg.bh_near_budget,
                        far_budget=cfg.bh_far_budget,
                        dtype=jnp.dtype(pos_s.dtype))
        idx = np.asarray(jax.device_get(idx))
        valid = np.asarray(jax.device_get(valid))
        needed = np.zeros(l_glob, bool)
        needed[idx[valid]] = True
        owner = np.arange(l_glob) // n_leaf_loc
        imp_by_owner = np.bincount(owner[needed], minlength=n_ranks)
        imp_by_owner[r] = 0
        per_rank.append({
            "rank": r, "needed": int(needed.sum()),
            "imports": int(imp_by_owner.sum()),
            "max_pair": int(imp_by_owner.max()) if n_ranks > 1 else 0,
        })

    tile_bytes = 4 * leaf_size * 4                      # (4, G) f32 tile
    max_imports = max(p["imports"] for p in per_rank)
    max_pair = max(p["max_pair"] for p in per_rank)
    n_local = n_pad // n_ranks
    rec = {
        "case": name, "n": cfg.n, "ranks": n_ranks, "leaf": leaf_size,
        "l_glob": l_glob, "n_leaf_loc": n_leaf_loc, "refine": refine,
        "theta": cfg.theta,
        "max_needed_frac": max(p["needed"] for p in per_rank) / l_glob,
        "max_import_frac": max_imports / l_glob,
        "max_pair_leaves": max_pair,
        "pair_budget_frac_of_auto": max_pair / n_leaf_loc,
        "let_bytes_per_eval": max_imports * tile_bytes,
        "ring_bytes_per_eval": (n_ranks - 1) * n_local * 16,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ranks", type=int, default=8)
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--theta", type=float, default=0.72)
    ap.add_argument("--leaf", type=int, default=0)
    args = ap.parse_args()

    common = dict(n=args.n, force="barnes_hut", theta=args.theta,
                  softening=0.01, bh_leaf_size=args.leaf,
                  bh_near_budget=3584, bh_far_budget=2816)
    run_case("plummer", SimConfig(ic="plummer", **common), args.ranks)
    run_case("galaxy_collision",
             SimConfig(ic="galaxy_collision", **common), args.ranks)
    run_case("disk", SimConfig(ic="disk", **common), args.ranks)


if __name__ == "__main__":
    main()
