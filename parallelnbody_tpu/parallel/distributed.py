"""Distributed-sort Barnes-Hut: SURVEY.md §7 stage 6.

The replicated-tree path (parallel/sharded.py) all-gathers every particle and
redundantly sorts + builds the full tree on every chip — fine to ~8 chips at
N=1M (DESIGN.md §4 scaling analysis), but the replicated sort+pyramid is the
non-scaling term and per-chip memory is O(N). This module is the scaling
design:

  1. **Sample-sort repartition.** Each rank Hilbert-encodes its local
     particles against the global bounding cube (pmin/pmax collectives),
     sorts locally, and contributes SAMPLES_PER_RANK key quantiles; the
     all-gathered sample defines P-1 splitters (identical on every rank).
     Particles whose key range belongs to another rank migrate via ONE
     `lax.all_to_all` with a static per-pair capacity; stayers never move.
     (The caller's state sharding is key-uncorrelated and restored by the
     reverse exchange below, so under make_sharded_step ~(P-1)/P of the
     particles migrate on EVERY step — the win of this design today is
     O(N/P) per-chip memory and the removal of the replicated O(N log N)
     sort, not total traffic, which stays the same order as the replicated
     path's all_gathers. A persistently key-sharded state, which would make
     the steady-state exchange near-empty, needs the state to carry its
     particle ids through the public API — a future round.)
  2. **Local trees, replicated top.** Each rank sorts its owned range
     ((key, id) two-key sort — ties break by global id exactly like the
     single-chip stable argsort) and builds leaf summaries; one all_gather
     of the ~40 B/leaf summary table (160 KB at N=1M) replicates the leaf
     level, from which every rank rebuilds the tiny global upper pyramid
     (ops/bh.py build_upper). No rank ever holds remote PARTICLES outside
     the ring pass below. This is the locally-essential-tree analogue with
     static shapes: the "essential" remote data is the leaf summary table.
  3. **Sliced traversal + lists** for the rank's own aligned target window
     (ops/bh.py traverse/build_interaction_lists — target leaves ARE the
     local leaves, so no result gather is needed).
  4. **Ring near field.** Near lists reference global leaf ids; the owned
     particle tiles ppermute around the ring and each pass evaluates the
     visiting shard's contiguous id window (near_field_pallas leaf_lo) —
     the ascending front-packed lists make every window a [lo, hi) position
     range. Peak per-chip particle memory stays O(N/P).
  5. **Reverse exchange.** (acc, pot) return to each particle's origin rank
     (carried global id), so the caller's state sharding is unchanged.

Static-shape honesty: the per-pair exchange capacity, the per-rank owned
capacity, and the interaction-list budgets are static; every clipped
particle or list entry is COUNTED into the returned overflow (never silent).
Capacity defaults cover random and steady-state distributions; a fully
adversarial pre-partitioned state can overflow and must raise the slack.

Replaces: the reference's single-thread tree rebuild (OctreeSearch.cpp:74-89)
at multi-chip scale; no NCCL/MPI analogue — XLA collectives over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from parallelnbody_tpu.ops.morton import morton_encode
from parallelnbody_tpu.ops.hilbert import hilbert_encode
from parallelnbody_tpu.ops.bh import (
    build_tree, build_upper, traverse, build_interaction_lists,
    eval_far_lists, _near_field_jnp, use_pallas_bh, domain_cube,
)

SAMPLES_PER_RANK = 64   # splitter sample quantiles per rank
PAIR_SLACK = 2.0        # all_to_all per-pair capacity, x (n_local / P)
OWN_SLACK = 0.25        # owned-range capacity headroom over n_local
_IMAX = jnp.iinfo(jnp.int32).max


def _plan(n_local: int, n_ranks: int, leaf_size: int):
    """Static capacities: (cap_pair, own_cap, n_leaf_loc). cap_pair is
    raised if needed so the merged buffer (n_local stay slots + P*cap_pair
    arrival slots) can always fill own_cap — otherwise small shards with
    large leaf sizes would slice a shorter array than the leaf plan assumes
    and fail at trace time."""
    cap_pair = max(8, int(PAIR_SLACK * n_local / max(n_ranks, 1) + 7) // 8 * 8)
    own_cap = -(-int(n_local * (1 + OWN_SLACK)) // leaf_size) * leaf_size
    need = -(-(own_cap - n_local) // max(n_ranks, 1))
    cap_pair = max(cap_pair, (need + 7) // 8 * 8)
    return cap_pair, own_cap, own_cap // leaf_size


def _exchange(dest, ok_migrant, cols_f, cols_i, fills_i, n_ranks, cap_pair,
              axis):
    """Send each migrant row to rank `dest` with a static per-pair capacity.

    cols_f: list of f32 (n,) columns (empty slots read 0); cols_i: list of
    i32 (n,) columns with per-column empty-slot fills `fills_i`. Returns
    (recv_f, recv_i, n_clipped): received columns of length
    n_ranks * cap_pair with the same empty-slot conventions."""
    onehot = (dest[:, None] == jnp.arange(n_ranks)[None, :]) & ok_migrant[:, None]
    within = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot, axis=1)
    sendable = ok_migrant & (within < cap_pair)
    n_clipped = jnp.sum(ok_migrant & (within >= cap_pair))
    slot = jnp.where(sendable, dest * cap_pair + within, n_ranks * cap_pair)

    out_f, out_i = [], []
    for c in cols_f:
        buf = jnp.zeros((n_ranks * cap_pair,), c.dtype).at[slot].set(
            c, mode="drop")
        out_f.append(lax.all_to_all(buf, axis, 0, 0, tiled=True))
    for c, fill in zip(cols_i, fills_i):
        buf = jnp.full((n_ranks * cap_pair,), fill, jnp.int32).at[slot].set(
            c.astype(jnp.int32), mode="drop")
        out_i.append(lax.all_to_all(buf, axis, 0, 0, tiled=True))
    return out_f, out_i, n_clipped


def dist_bh_accel(pos, mass, cfg, axis, *, compute_pot=True):
    """Distributed Barnes-Hut accelerations for a particle-sharded state.

    pos (n_local, 3) / mass (n_local,) are this rank's shard (inside
    shard_map over `axis`). Returns (acc (n_local, 3), pot (n_local,),
    overflow ()): overflow counts clipped exchange slots + clipped list
    entries across ALL ranks (psum) — nonzero means degraded results;
    raise the slack constants / list budgets."""
    n_ranks = lax.axis_size(axis)
    rank = lax.axis_index(axis)
    n_local = pos.shape[0]
    dtype = pos.dtype
    leaf_size = cfg.resolve_bh_leaf_size()
    cap_pair, own_cap, n_leaf_loc = _plan(n_local, n_ranks, leaf_size)
    softening = cfg.softening
    eps2 = jnp.asarray(softening, dtype) ** 2
    guard_zero = softening == 0.0
    use_pallas = use_pallas_bh()

    # ---- global domain cube + local keys (reference ComputeCubeSize
    # semantics, OctreeSearch.cpp:47-56, via pmin/pmax collectives; the cube
    # formula is shared with the single-chip prepare so both paths bin
    # identically — ops/bh.py domain_cube)
    lo = lax.pmin(jnp.min(pos, axis=0), axis)
    hi = lax.pmax(jnp.max(pos, axis=0), axis)
    center, half, sentinel = domain_cube(lo, hi)
    # Padding slots sit at the sentinel; offset it per rank so the ranks'
    # zero-mass pad leaves do not co-locate into one point cluster (a shared
    # sentinel made every pad leaf a near candidate of every other rank's
    # phantom target rows — able to trip the near budget's overflow signal
    # for particles that do not exist at large P).
    sentinel = sentinel + (rank.astype(pos.dtype) * half)[None] * jnp.array(
        [1.0, 0.0, 0.0], pos.dtype)
    encode = hilbert_encode if cfg.bh_curve == "hilbert" else morton_encode
    keys = encode(pos, center, half)

    # ---- sample-sort splitters (replicated: same gathered sample everywhere)
    s = min(SAMPLES_PER_RANK, n_local)
    k_sorted = jnp.sort(keys)
    samp = k_sorted[(jnp.arange(s) * n_local) // s + n_local // (2 * s)]
    all_samp = jnp.sort(lax.all_gather(samp, axis, axis=0, tiled=True))
    if n_ranks > 1:
        spl = all_samp[(jnp.arange(1, n_ranks) * n_ranks * s) // n_ranks]
        dest = jnp.sum(keys[:, None] >= spl[None, :], axis=1).astype(jnp.int32)
    else:
        dest = jnp.zeros((n_local,), jnp.int32)

    ids = rank * n_local + jnp.arange(n_local, dtype=jnp.int32)
    stay = dest == rank

    # ---- forward exchange: only migrants move
    (fx, fy, fz, fm), (fkey, fid), of_pair = _exchange(
        dest, ~stay, [pos[:, 0], pos[:, 1], pos[:, 2], mass],
        [keys, ids], [_IMAX, -1], n_ranks, cap_pair, axis)

    # ---- merge stayers + arrivals; (key, id) two-key sort == the
    # single-chip stable argsort's tie-breaking (id = global order)
    m_key = jnp.concatenate([jnp.where(stay, keys, _IMAX), fkey])
    m_id = jnp.concatenate([ids, fid])
    m_x = jnp.concatenate([pos[:, 0], fx])
    m_y = jnp.concatenate([pos[:, 1], fy])
    m_z = jnp.concatenate([pos[:, 2], fz])
    m_m = jnp.concatenate([jnp.where(stay, mass, 0.0), fm])
    sk, sid, sx, sy, sz, sm = lax.sort(
        (m_key, m_id, m_x, m_y, m_z, m_m), num_keys=2)
    valid_own = sk[:own_cap] != _IMAX
    of_own = jnp.sum(sk[own_cap:] != _IMAX)
    pos_own = jnp.where(valid_own[:, None],
                        jnp.stack([sx, sy, sz], axis=1)[:own_cap],
                        sentinel[None, :].astype(dtype))
    mass_own = jnp.where(valid_own, sm[:own_cap], 0.0)
    id_own = sid[:own_cap]

    # ---- local leaf summaries -> replicated global upper pyramid
    ltree = build_tree(pos_own, mass_own, leaf_size, sentinel,
                       multipole_order=cfg.bh_multipole, max_levels=1)
    com_g = lax.all_gather(ltree.com[0], axis, axis=0, tiled=True)
    mass_g = lax.all_gather(ltree.mass[0], axis, axis=0, tiled=True)
    rad_g = lax.all_gather(ltree.radius[0], axis, axis=0, tiled=True)
    quad_g = (lax.all_gather(ltree.quad[0], axis, axis=0, tiled=True)
              if ltree.quad[0] is not None else None)
    tree = build_upper(com_g, mass_g, rad_g, quad_g, sentinel,
                       max_levels=cfg.bh_max_levels)

    # ---- sliced traversal + lists for the rank's own (aligned) window
    start = rank * n_leaf_loc
    far_masks, rejects_l1 = traverse(tree, cfg.theta, start_leaf=start,
                                     n_slice=n_leaf_loc)
    (near_idx, near_valid, far0_idx, far0_valid, up_idx, up_valid,
     nodes_up, leaf_nodes, of_lists) = build_interaction_lists(
        tree, far_masks, rejects_l1, theta=cfg.theta, start_leaf=start,
        n_slice=n_leaf_loc, near_budget=cfg.bh_near_budget,
        far0_budget=cfg.bh_far_budget, dtype=dtype)

    tgt_leaves = pos_own.reshape(n_leaf_loc, leaf_size, 3)
    acc, pot = eval_far_lists(
        tgt_leaves, nodes_up, up_idx, up_valid, leaf_nodes, far0_idx,
        far0_valid, g=cfg.g, softening=softening, use_pallas=use_pallas,
        compute_pot=compute_pot)

    # ---- ring near field: shard tiles ppermute around the ring; pass p
    # evaluates the window of leaves owned by rank (self - p) % P
    sh_pos, sh_mass = pos_own, mass_own
    perm = [(i, (i + 1) % n_ranks) for i in range(n_ranks)]
    for p in range(n_ranks):
        # Issue the next rotation BEFORE computing on the current shard (same
        # double-buffered overlap as ring.py: the collective-permute has no
        # data dependence on this pass's near evaluation).
        if p < n_ranks - 1:
            nxt_pos = lax.ppermute(sh_pos, axis, perm)
            nxt_mass = lax.ppermute(sh_mass, axis, perm)
        owner = jnp.mod(rank - p, n_ranks).astype(jnp.int32)
        leaf_lo = owner * n_leaf_loc
        if use_pallas:
            from parallelnbody_tpu.ops.pallas_bh import near_field_pallas

            a, ph = near_field_pallas(
                sh_pos, sh_mass, tgt_leaves, near_idx, near_valid, leaf_size,
                cfg.g, float(softening), guard_zero,
                interpret=jax.default_backend() != "tpu",
                compute_pot=compute_pot, leaf_lo=leaf_lo)
        else:
            w_valid = (near_valid & (near_idx >= leaf_lo)
                       & (near_idx < leaf_lo + n_leaf_loc))
            idx_rel = jnp.clip(near_idx - leaf_lo, 0, n_leaf_loc - 1)
            a, ph = _near_field_jnp(sh_pos, sh_mass, tgt_leaves, idx_rel,
                                    w_valid, leaf_size, cfg.g, eps2,
                                    guard_zero)
        acc = acc + a
        pot = pot + ph
        if p < n_ranks - 1:
            sh_pos, sh_mass = nxt_pos, nxt_mass

    # ---- reverse exchange: results back to each particle's origin rank
    dest_r = jnp.where(valid_own, id_own // n_local, n_ranks)
    stay_r = valid_own & (dest_r == rank)
    slot_r = jnp.where(stay_r, id_own % n_local, n_local)
    acc_out = jnp.zeros((n_local, 3), dtype)
    acc_out = acc_out.at[slot_r].set(acc, mode="drop")
    pot_out = jnp.zeros((n_local,), dtype).at[slot_r].set(pot, mode="drop")

    (rx, ry, rz, rp), (rid,), of_rev = _exchange(
        dest_r, valid_own & ~stay_r, [acc[:, 0], acc[:, 1], acc[:, 2], pot],
        [id_own], [-1], n_ranks, cap_pair, axis)
    arr_slot = jnp.where(rid >= 0, rid % n_local, n_local)
    acc_out = acc_out.at[arr_slot, 0].set(rx, mode="drop")
    acc_out = acc_out.at[arr_slot, 1].set(ry, mode="drop")
    acc_out = acc_out.at[arr_slot, 2].set(rz, mode="drop")
    pot_out = pot_out.at[arr_slot].set(rp, mode="drop")

    overflow = lax.psum(of_pair + of_own + of_rev + of_lists, axis)
    return acc_out, pot_out, overflow
