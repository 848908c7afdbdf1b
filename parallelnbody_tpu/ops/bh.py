"""Barnes-Hut gravity, TPU-style: Hilbert sort + multipole pyramid +
level-synchronous masked traversal + per-target interaction lists.

The reference's Barnes-Hut is a heap-allocated pointer octree rebuilt every
frame and traversed with per-particle recursion (Octree::Add/ComputeMass/
ComputeForces, OctreeSearch.h:60-108). None of that maps to TPU. The
TPU-native re-design (SURVEY.md §7 stage 5):

  1. Hilbert-sort particles (ops/hilbert.py; Morton optional) — replaces
     pointer insertion (Octree::Add, h:60-81): sorted order IS the octree
     linearization, and Hilbert's jump-free locality keeps leaf bounding
     radii compact.
  2. Group particles into fixed-size leaves (bh_leaf_size consecutive sorted
     particles) and build a multipole pyramid (mass, CoM, bounding radius,
     optional traceless quadrupole) over the leaves by pure
     reshape-reductions — replaces the recursive post-order mass pass
     (Octree::ComputeMass, h:83-97), load-balanced by construction.
  3. Level-synchronous traversal with dense boolean masks over the UPPER
     levels (node counts shrink 8x per level, so these masks are narrow):
     for every (target-leaf, node) pair, a group multipole-acceptance test
     (the vectorized analogue of `Size/d < Theta`, h:103) either accepts the
     node or expands its children. No recursion, no pointers, static shapes.
  4. Leaf level handled sparsely (`leaf_interactions`): rejected level-1
     nodes expand to candidate leaves; a second MAC splits candidates into
     accepted leaf multipoles (far0) and exact near pairs, compacted into
     padded per-target lists by row sort. A dense leaf-level mask would be
     the n_leaves^2 memory/compile wall at large N.
  5. All interaction classes are evaluated by the gathered-chunk Pallas
     kernels in ops/pallas_bh.py (pure-jnp fallbacks here for CPU). List
     budget overflow is *reported*, never silently dropped.

The acceptance criterion is the conservative group MAC
    MAC_SIZE_SCALE * r_node < theta * (d - r_leaf)
with r_* tight bounding radii around each group's center of mass, so every
particle in the target leaf satisfies an effective opening angle <= theta.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.ops.morton import morton_encode
from parallelnbody_tpu.ops.hilbert import hilbert_encode


class BHTree(NamedTuple):
    """Per-level multipole pyramid over curve-sorted leaves. Index 0 =
    leaves, index -1 = root. Each level: com (n_k, 3), mass (n_k,),
    radius (n_k,), quad (n_k, 5) traceless quadrupole
    [Qxx, Qyy, Qxy, Qxz, Qyz] about the CoM (Qzz = -Qxx - Qyy);
    quad is a tuple of Nones when built with multipole order 1."""

    com: tuple
    mass: tuple
    radius: tuple
    quad: tuple

    @property
    def n_levels(self):
        return len(self.com)


def plan_tree(n: int, leaf_size: int, max_levels: int = 12):
    """Static plan: (n_leaves, n_padded, n_levels). n_leaves is the next
    power of two (max 2x particle padding); tree levels shrink by 8 where
    divisible, else by the remaining factor (mixed radix at the top)."""
    n_leaves_min = -(-n // leaf_size)
    n_leaves = max(8, 1 << math.ceil(math.log2(n_leaves_min)))
    levels, n_k = 1, n_leaves
    while n_k > 1 and levels < max_levels:
        n_k //= 8 if n_k % 8 == 0 and n_k >= 8 else n_k
        levels += 1
    return n_leaves, n_leaves * leaf_size, levels


def domain_cube(lo, hi):
    """(center, half, sentinel) of the key-quantization cube from a particle
    bounding box. Shared by the single-chip prepare and the distributed path
    (which feeds collective pmin/pmax bounds) so both bin particles into
    identical cells — their equivalence tests depend on it."""
    center = 0.5 * (lo + hi)
    half = jnp.maximum(jnp.max(0.5 * (hi - lo)), 1e-12) * (1 + 1e-6)
    return center, half, center + 4.0 * half


def _quad_about(d, w):
    """Traceless quadrupole [Qxx, Qyy, Qxy, Qxz, Qyz] of weighted
    displacements d: (..., K, 3), w: (..., K) -> (..., 5)."""
    d2 = jnp.sum(d * d, axis=-1)
    qxx = jnp.sum(w * (3 * d[..., 0] * d[..., 0] - d2), axis=-1)
    qyy = jnp.sum(w * (3 * d[..., 1] * d[..., 1] - d2), axis=-1)
    qxy = jnp.sum(w * 3 * d[..., 0] * d[..., 1], axis=-1)
    qxz = jnp.sum(w * 3 * d[..., 0] * d[..., 2], axis=-1)
    qyz = jnp.sum(w * 3 * d[..., 1] * d[..., 2], axis=-1)
    return jnp.stack([qxx, qyy, qxy, qxz, qyz], axis=-1)


def build_tree(pos_sorted, mass_sorted, leaf_size: int, sentinel,
               multipole_order: int = 1, max_levels: int = 12) -> BHTree:
    """Multipole pyramid from curve-sorted particles.

    multipole_order: 1 = monopole only; 2 = + traceless quadrupoles
    (propagated upward with the parallel-axis shift
    Q_parent = sum_c [Q_c + m_c (3 s s^T - |s|^2 I)], s = com_c - com_p).

    Zero-mass (padding) members are excluded from CoM/radius; empty nodes get
    CoM = sentinel (far outside the domain) so they trivially pass the MAC
    and contribute nothing.
    """
    n_pad = pos_sorted.shape[0]
    n_leaves = n_pad // leaf_size

    p = pos_sorted.reshape(n_leaves, leaf_size, 3)
    m = mass_sorted.reshape(n_leaves, leaf_size)
    msum = jnp.sum(m, axis=1)
    com = jnp.where(
        (msum > 0)[:, None],
        jnp.sum(m[:, :, None] * p, axis=1) / jnp.maximum(msum, 1e-30)[:, None],
        sentinel[None, :],
    )
    d = p - com[:, None, :]
    r = jnp.linalg.norm(d, axis=-1)
    radius = jnp.max(jnp.where(m > 0, r, 0.0), axis=1)
    quad = _quad_about(d, m) if multipole_order >= 2 else None

    return build_upper(com, msum, radius, quad, sentinel,
                       max_levels=max_levels)


def build_upper(com, mass, radius, quad, sentinel, *,
                max_levels: int = 12) -> BHTree:
    """Upper multipole pyramid from a leaf-level summary table (level 0 of
    the result). Factored out of build_tree so the distributed path can
    rebuild the (replicated) global upper tree from all-gathered per-rank
    leaf summaries without any particle data (SURVEY.md §7 stage 6).
    quad=None builds a monopole pyramid."""
    coms, masses, radii, quads = [com], [mass], [radius], [quad]
    while coms[-1].shape[0] > 1 and len(coms) < max_levels:
        n_k = coms[-1].shape[0]
        b = 8 if (n_k % 8 == 0 and n_k >= 8) else n_k
        c = coms[-1].reshape(-1, b, 3)
        mm = masses[-1].reshape(-1, b)
        rr = radii[-1].reshape(-1, b)
        msum_k = jnp.sum(mm, axis=1)
        com_k = jnp.where(
            (msum_k > 0)[:, None],
            jnp.sum(mm[:, :, None] * c, axis=1) / jnp.maximum(msum_k, 1e-30)[:, None],
            sentinel[None, :],
        )
        sdisp = c - com_k[:, None, :]
        spread = jnp.linalg.norm(sdisp, axis=-1) + rr
        rad_k = jnp.max(jnp.where(mm > 0, spread, 0.0), axis=1)
        if quads[-1] is not None:
            qk = jnp.sum(quads[-1].reshape(-1, b, 5), axis=1)
            qk = qk + _quad_about(sdisp, mm)
            quads.append(qk)
        else:
            quads.append(None)
        coms.append(com_k)
        masses.append(msum_k)
        radii.append(rad_k)

    return BHTree(com=tuple(coms), mass=tuple(masses), radius=tuple(radii),
                  quad=tuple(quads))


# MAC size constant: the node's "size" in `size/d < theta` is taken as
# MAC_SIZE_SCALE * bounding_radius. Calibrated empirically so theta here
# matches standard cell-side BH theta semantics: at theta=0.5 on a Plummer
# sphere this gives ~1.5e-3 rms force error (classic BH theta=0.5 quality).
# The reference's `Size/d < Theta` (OctreeSearch.h:103) uses the cell
# half-width, which for a cubic cell is ~0.58 * bounding radius.
MAC_SIZE_SCALE = 1.0


def _group_mac(leaf_com, leaf_r, node_com, node_r, theta):
    """(n_leaves, n_k) True where the node monopole is acceptable for every
    particle in the target leaf (group MAC: target radius subtracted from
    the separation so the bound holds for the leaf's worst-case particle).

    Distances are accumulated component-wise: a broadcasted
    (n_leaves, n_k, 3) difference tensor would be lane-padded 3 -> 128 by
    the TPU layout (42x memory at large n_leaves)."""
    d2 = jnp.zeros((leaf_com.shape[0], node_com.shape[0]), leaf_com.dtype)
    for c in range(3):
        dc = node_com[:, c][None, :] - leaf_com[:, c][:, None]
        d2 = d2 + dc * dc
    d_eff = jnp.sqrt(d2) - leaf_r[:, None]
    return (MAC_SIZE_SCALE * node_r[None, :]) < (theta * d_eff)


def traverse(tree: BHTree, theta: float, *, start_leaf=0, n_slice=None,
             stop_level=1):
    """Level-synchronous masked traversal over the upper levels
    (k >= stop_level), for the target-leaf slice
    [start_leaf, start_leaf + n_slice) (defaults to all leaves).

    Returns (far_masks, rejects): far_masks[k] is the (n_slice, n_k) bool
    mask of nodes at level k >= stop_level accepted as monopoles (lower
    indices unused, None); rejects is the (n_slice, n_stop) bool mask of
    stop-level nodes that must be refined further — to leaf granularity by
    `leaf_interactions` (stop_level=1, the dense plane) or by the staged
    gather refinement (stop_level=2, build_interaction_lists_staged).

    The slice parameters matter for multi-chip AND for the slice-sectioned
    single-chip path: each rank / section traverses only its own target
    window, so this phase scales with the window instead of being
    replicated (start_leaf may be traced)."""
    leaf_com, leaf_r = tree.com[0], tree.radius[0]
    n_levels = tree.n_levels
    assert 0 < stop_level < n_levels, (stop_level, n_levels)
    if n_slice is None:
        n_slice = leaf_com.shape[0]
    tgt_com = jax.lax.dynamic_slice_in_dim(leaf_com, start_leaf, n_slice, 0)
    tgt_r = jax.lax.dynamic_slice_in_dim(leaf_r, start_leaf, n_slice, 0)

    far_masks = [None] * n_levels
    active = jnp.ones((n_slice, tree.com[-1].shape[0]), bool)
    for k in range(n_levels - 1, stop_level, -1):
        mac = _group_mac(tgt_com, tgt_r, tree.com[k], tree.radius[k], theta)
        far_masks[k] = active & mac
        branch = tree.com[k - 1].shape[0] // tree.com[k].shape[0]
        active = jnp.repeat(active & ~mac, branch, axis=1)
    mac_s = _group_mac(tgt_com, tgt_r, tree.com[stop_level],
                       tree.radius[stop_level], theta)
    far_masks[stop_level] = active & mac_s
    rejects = active & ~mac_s
    return far_masks, rejects


def _keys_compact(keys, budget):
    """Front-pack the finite (!= INT32_MAX) i32 keys of each row into a
    padded ascending (n_rows, budget) list. Returns (idx, valid, overflow).

    Sort-based: invalid entries carry the sentinel key and sort to the back —
    one row sort instead of a scatter (TPU scatters are an order of magnitude
    slower at these sizes). A cumsum + binary-search variant (log2(C) rounds
    of take_along_axis) was measured 6x SLOWER than the sort at (4096, 2560)
    on v5e — lane-wise take_along_axis hits the slow row-gather path, so the
    sort stays."""
    n_rows, n_cols = keys.shape
    budget = min(budget, n_cols)
    big = jnp.iinfo(jnp.int32).max
    counts = jnp.sum(keys != big, axis=1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(counts - budget, 0)).astype(jnp.int32)
    idx = jax.lax.sort(keys, dimension=1)[:, :budget]
    valid = jax.lax.broadcasted_iota(jnp.int32, (n_rows, budget), 1) < counts[:, None]
    idx = jnp.where(valid, idx, 0)
    return idx, valid, overflow


def _row_compact(mask, fill_idx, budget):
    """Front-pack the True column-values of `fill_idx` per row into a padded
    (n_rows, budget) list. mask/fill_idx: (n_rows, C). Returns
    (idx, valid, overflow). Requires ascending fill_idx per row for the
    output to remain ascending (all callers pass iota-derived candidates)."""
    big = jnp.iinfo(jnp.int32).max
    return _keys_compact(jnp.where(mask, fill_idx, big), budget)


def leaf_interactions(tree: BHTree, rejects_l1, theta: float, *,
                      start_leaf, n_slice, near_budget: int,
                      far0_budget: int):
    """Refine rejected level-1 nodes to leaf granularity for the target-leaf
    slice [start_leaf, start_leaf + n_slice). rejects_l1 must come from
    `traverse` called with the SAME slice (n_slice rows).

    Each rejected level-1 node contributes its `branch` child leaves as
    candidates; the leaf-level MAC splits candidates into accepted leaf
    monopoles (far0) and exact near pairs. Returns
    (near_idx, near_valid, far0_idx, far0_valid, overflow).

    DENSE formulation: the candidate mask and the leaf MAC are computed over
    the full (n_slice, n_leaves) plane with component-wise broadcasts, then
    front-packed by two row sorts. The round-1 sparse pipeline (compact l1
    rejects -> expand -> gather candidate geometry) spent 313 of its 326 ms
    at N=1M in the candidate gathers — (n_slice, C)-indexed gathers from 1-D
    leaf tables run at ~0.5 GB/s effective on v5e — while dense broadcasts
    and row sorts run at memory bandwidth. Dense is also exact: no l1
    compaction budget, so that overflow class is gone. Memory is
    O(n_slice * n_leaves) bools/f32 (67 MB at N=1M/leaf=256) — the multi-chip
    path keeps n_slice at n_leaves / n_ranks, and leaf_size should scale with
    N to hold n_leaves ~ 4-8k."""
    near_mask, far_mask = _dense_leaf_masks(tree, rejects_l1, theta,
                                            start_leaf, n_slice)
    n_leaves = tree.com[0].shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_slice, n_leaves), 1)
    near_idx, near_valid, of_n = _row_compact(near_mask, cols, near_budget)
    far0_idx, far0_valid, of_f = _row_compact(far_mask, cols, far0_budget)
    return near_idx, near_valid, far0_idx, far0_valid, of_n + of_f


def _dense_leaf_masks(tree: BHTree, rejects_l1, theta, start_leaf, n_slice):
    """The dense leaf-refinement core shared by leaf_interactions and
    build_interaction_lists_octet: (near_mask, far_mask) (n_slice, n_leaves)
    bool planes splitting the candidate leaves (children of rejected level-1
    nodes) by the leaf-level MAC."""
    leaf_com, leaf_r = tree.com[0], tree.radius[0]
    n_leaves = leaf_com.shape[0]
    branch = n_leaves // tree.com[1].shape[0]

    assert rejects_l1.shape[0] == n_slice, (rejects_l1.shape, n_slice)
    rej = rejects_l1
    tgt_com = jax.lax.dynamic_slice_in_dim(leaf_com, start_leaf, n_slice, 0)
    tgt_r = jax.lax.dynamic_slice_in_dim(leaf_r, start_leaf, n_slice, 0)

    # Dense leaf-level MAC, component-wise (a (Ls, n_leaves, 3) difference
    # tensor would be lane-padded 3 -> 128 by the TPU layout).
    d2 = jnp.zeros((n_slice, n_leaves), leaf_com.dtype)
    for c in range(3):
        dc = leaf_com[:, c][None, :] - tgt_com[:, c][:, None]
        d2 = d2 + dc * dc
    d = jnp.sqrt(d2)
    mac0 = (MAC_SIZE_SCALE * leaf_r[None, :]) < (theta * (d - tgt_r[:, None]))

    # Candidates = children of rejected level-1 nodes, as a broadcast (no
    # materialized repeat): column j is a candidate iff rej[:, j // branch].
    cand_valid3 = jnp.broadcast_to(rej[:, :, None],
                                   (n_slice, n_leaves // branch, branch))
    cand_valid = cand_valid3.reshape(n_slice, n_leaves)

    # Zero-mass (padding) TARGET leaves get empty lists: their rows are
    # phantom results discarded by the caller, but their near candidates
    # still count against the budget — in the distributed path a rank's
    # co-located pure-sentinel leaves are mutual near candidates (d_eff = 0
    # fails the MAC) and could report overflow for targets that do not
    # exist (ADVICE r2 #1). Consistent with build_tree: a zero-mass leaf
    # already has CoM = sentinel, so it never acts as a real target.
    tgt_m = jax.lax.dynamic_slice_in_dim(tree.mass[0], start_leaf, n_slice, 0)
    cand_valid = cand_valid & (tgt_m > 0)[:, None]
    return cand_valid & ~mac0, cand_valid & mac0


# ------------------------------------------------- staged (hierarchical) lists
def _node_table(tree: BHTree, k: int, dtype):
    """(n_k, 4|9) [com, mass(, quad)] rows of level k, the far kernels'
    multipole format."""
    cols = [tree.com[k], tree.mass[k][:, None]]
    if tree.quad[0] is not None:
        cols.append(tree.quad[k])
    return jnp.concatenate(cols, axis=1).astype(dtype)


def _nodes_all(tree: BHTree, dtype):
    """All levels' node tables stacked: row offsets per _level_offsets."""
    return jnp.concatenate(
        [_node_table(tree, k, dtype) for k in range(tree.n_levels)], axis=0)


def _level_offsets(widths):
    """Global-id offset of each level's rows in _nodes_all."""
    offs = [0]
    for k in range(1, len(widths)):
        offs.append(offs[-1] + widths[k - 1])
    return offs


def _upper_keys(far_masks, offs, n_levels):
    """Accepted upper-level (k >= 2) nodes as global-id key columns
    (INT32_MAX = invalid), ready for a _keys_compact far sort."""
    big = jnp.iinfo(jnp.int32).max
    return jnp.concatenate(
        [jnp.where(far_masks[k],
                   offs[k] + jax.lax.broadcasted_iota(
                       jnp.int32, far_masks[k].shape, 1), big)
         for k in range(2, n_levels)], axis=1)


# ------------------------------------------------ octet-masked far lists
# Every far-accepted node, at any level, lies in an aligned 8-sibling octet
# of its level's node table (levels are padded to multiples of 8 rows). A
# far list entry is therefore one int32 key (octet_id << 8) | child_mask
# instead of up to 8 per-node entries: ~4-8x narrower lists, and the far
# kernel reads each octet as one (8, 128) tile from a VMEM-RESIDENT table
# (ops/pallas_bh.py far_octet_pallas) — no budget-wide HBM gather at all
# (the gather was the dominant far cost: 1467 of 3005 ms at N=8M, r4).

def _octet_offsets(widths):
    """(offs8, n_octets): octet index of each level's first sibling octet in
    the 8-aligned combined table (_nodes_all_octet). Level k's node j lives
    in octet offs8[k] + j // 8, sublane j % 8."""
    offs8, o = [], 0
    for w in widths:
        offs8.append(o)
        o += -(-w // 8)
    return offs8, o


def _nodes_all_octet(tree: BHTree, dtype):
    """All levels' node tables stacked with every level padded to a multiple
    of 8 rows (pad rows are zero: mass 0 and quad 0 contribute nothing even
    unmasked), so each node's 8-sibling octet is an aligned (8, C) tile —
    the unit read of the resident-table far kernel."""
    parts = []
    for k in range(tree.n_levels):
        t = _node_table(tree, k, dtype)
        pad = (-t.shape[0]) % 8
        if pad:
            t = jnp.concatenate(
                [t, jnp.zeros((pad, t.shape[1]), dtype)], axis=0)
        parts.append(t)
    return jnp.concatenate(parts, axis=0)


def _octet_keys_dense(mask, oct_off):
    """Octet keys from a dense (n, n_k) acceptance mask: one int32 key
    (octet_id << 8) | child_mask per sibling octet with any accepted member,
    INT32_MAX elsewhere. Octet ids sit in the high bits, so keys sort
    ascending by octet and the kernel's segment windows stay contiguous."""
    n, w = mask.shape
    pad = (-w) % 8
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros((n, pad), bool)], axis=1)
    bits = jnp.sum(mask.reshape(n, -1, 8).astype(jnp.int32)
                   * (1 << jnp.arange(8, dtype=jnp.int32)), axis=2)
    octs = oct_off + jax.lax.broadcasted_iota(jnp.int32, bits.shape, 1)
    return jnp.where(bits > 0, (octs << 8) | bits,
                     jnp.iinfo(jnp.int32).max)


def _octet_keys_children(mask_b, parent_idx, child_oct_off, b):
    """Octet keys from per-candidate child masks mask_b (R, B, b) for
    parents parent_idx (R, B): node j's children are rows [j*b, (j+1)*b) of
    the child level, i.e. bits (j*b) % 8 .. of octet child_oct_off + j*b//8
    (b is a power of two <= 8, so a parent's children never straddle an
    octet). Parents with b < 8 may share an octet — their masks are
    disjoint, so duplicate-octet entries stay double-count-free."""
    pw = 1 << jnp.arange(b, dtype=jnp.int32)
    small = jnp.sum(mask_b.astype(jnp.int32) * pw, axis=2)
    base = parent_idx * b
    keys = ((child_oct_off + base // 8) << 8) | (small << (base % 8))
    return jnp.where(small > 0, keys, jnp.iinfo(jnp.int32).max)


def _octet_upper_keys(far_masks, offs8, n_levels, lo_level=2):
    """Accepted upper-level (k >= lo_level) nodes as octet key columns."""
    return jnp.concatenate(
        [_octet_keys_dense(far_masks[k], offs8[k])
         for k in range(lo_level, n_levels)], axis=1)


def _map_row_blocks(fn, args, n_rows, row_block):
    """Apply fn over row blocks via lax.map to bound gathered temporaries.
    Picks the largest power-of-two divisor of n_rows <= row_block (falls
    back to one shot); flattens mapped outputs back to full-row leading
    dims (scalar-per-block outputs come back as (n_blocks,) — sum them)."""
    block = n_rows
    while block > row_block or (block > 1 and n_rows % block):
        block = block // 2 if block % 2 == 0 else 1
    if block == n_rows:
        return fn(args)
    nb = n_rows // block
    out = jax.lax.map(
        fn, tuple(a.reshape((nb, block) + a.shape[1:]) for a in args))
    return tuple(o.reshape((-1,) + o.shape[2:]) if o.ndim > 1 else o
                 for o in out)


def _child_pack(tree: BHTree, k: int):
    """Packed child-geometry row table for refining level-k nodes: row j of
    the (n_k, 5*b) table holds node j's b children at level k-1 as
    [cx*b | cy*b | cz*b | r*b | m*b] lane blocks. One FULL-LANE row gather
    per (target, candidate) then brings all b children at once — the fast
    gather shape on TPU (row-count-bound ~255M rows/s; a 1-D per-child
    gather runs at ~0.5 GB/s, scripts/gather_rate_probe.py)."""
    n_child = tree.com[k - 1].shape[0]
    n_k = tree.com[k].shape[0]
    b = n_child // n_k
    cols = [tree.com[k - 1][:, 0], tree.com[k - 1][:, 1],
            tree.com[k - 1][:, 2], tree.radius[k - 1], tree.mass[k - 1]]
    return jnp.concatenate([c.reshape(n_k, b) for c in cols], axis=1), b


def _refine_stage(pack, b, cand_idx, cand_valid, tgt_com, tgt_r, theta):
    """Gather each candidate node's packed children and test the group MAC
    per child. Returns (acc, rej, gid): (R, B, b) masks of children accepted
    as multipoles / needing further refinement, and their global child ids
    (ascending along flattened columns when cand_idx rows are ascending).
    Empty children (mass 0 => CoM = sentinel) are excluded from BOTH
    classes — they carry no physics."""
    rows = pack[cand_idx]                       # (R, B, 5b) full-lane rows
    cx = rows[:, :, 0 * b:1 * b]
    cy = rows[:, :, 1 * b:2 * b]
    cz = rows[:, :, 2 * b:3 * b]
    cr = rows[:, :, 3 * b:4 * b]
    cm = rows[:, :, 4 * b:5 * b]
    dx = cx - tgt_com[:, 0][:, None, None]
    dy = cy - tgt_com[:, 1][:, None, None]
    dz = cz - tgt_com[:, 2][:, None, None]
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    mac = (MAC_SIZE_SCALE * cr) < (theta * (d - tgt_r[:, None, None]))
    live = cand_valid[:, :, None] & (cm > 0)
    gid = cand_idx[:, :, None] * b + jnp.arange(b, dtype=jnp.int32)
    return live & mac, live & ~mac, gid


def build_interaction_lists_staged(tree: BHTree, far_masks, rejects_l2, *,
                                   theta, start_leaf, n_slice, near_budget,
                                   far_budget, cand2_budget, cand1_budget,
                                   dtype, row_block=0, octet_far=False):
    """Hierarchical candidate refinement: the staged replacement for the
    dense (n_slice, n_leaves) leaf plane (VERDICT r2 #2), O(n_slice * budget)
    instead of O(n_slice * n_leaves), so n_leaves can grow past ~8-16k.

    Inputs come from traverse(stop_level=2): far_masks[k] for k >= 2 are the
    dense accepted-node masks (narrow — node counts shrink 8x per level) and
    rejects_l2 is the (n_slice, n_l2) mask of level-2 nodes needing
    refinement. Three stages, all row sorts + full-lane row gathers:

      A. compact rejects_l2 into a per-target candidate list (cand2_budget);
      B. gather each candidate's packed level-1 children (_child_pack) and
         MAC them: accepted -> far entries at level 1; rejected -> compact
         into a level-1 candidate list (cand1_budget);
      C. gather level-1 candidates' packed leaf children and MAC them:
         accepted -> far entries at level 0; rejected -> the exact near list.

    ONE far list covers everything non-near — upper accepted nodes (from the
    dense masks), level-1 accepts, leaf accepts — as ascending global ids
    into the combined node table nodes_all = [leaves | level1 | level2 |...]
    (returned); `far_budget` must cover their SUM per target. Returns
    (near_idx, near_valid, far_idx, far_valid, nodes_all, overflow); near
    ids are leaf ids as in the dense path, so the near kernels are shared
    verbatim. Overflow is an UPPER BOUND on lost entries: candidate-list
    clips count the clipped candidate's worst-case subtree size (b2*b1 per
    level-2 clip, b1 per level-1 clip) since its live-descendant count is
    unknown at clip time, plus exact near/far clips.

    row_block: process targets in row blocks via lax.map to bound the
    gathered temporaries (0 = auto ~256 MB); must divide n_slice (auto picks
    the largest power-of-two divisor).

    octet_far=True: the far list is emitted in octet-masked form — keys
    (octet_id << 8) | child_mask over the 8-aligned combined table
    (_nodes_all_octet, returned in place of _nodes_all), far_budget counts
    octet entries, and a clipped far entry counts 8 into the overflow. The
    stage masks acc1/acc0 are already per-parent child masks, so emission
    is a bit-pack instead of a flat expand."""
    n_levels = tree.n_levels
    n_leaves = tree.com[0].shape[0]
    widths = [c.shape[0] for c in tree.com]
    assert n_levels >= 3, "staged refinement needs >= 3 tree levels"
    big = jnp.iinfo(jnp.int32).max
    offs = _level_offsets(widths)
    offs8, n_oct = _octet_offsets(widths)

    pack2, b2 = _child_pack(tree, 2)
    pack1, b1 = _child_pack(tree, 1)
    cand2_budget = min(cand2_budget, widths[2])
    cand1_budget = min(cand1_budget, widths[1])
    if octet_far:
        far_budget = min(far_budget, n_oct)

    tgt_com = jax.lax.dynamic_slice_in_dim(tree.com[0], start_leaf, n_slice, 0)
    tgt_r = jax.lax.dynamic_slice_in_dim(tree.radius[0], start_leaf, n_slice, 0)
    tgt_m = jax.lax.dynamic_slice_in_dim(tree.mass[0], start_leaf, n_slice, 0)
    up_keys = (_octet_upper_keys(far_masks, offs8, n_levels) if octet_far
               else _upper_keys(far_masks, offs, n_levels))

    def block_fn(args):
        rej2, upk, t_com, t_r, t_m = args
        r = rej2.shape[0]
        # Zero-mass (padding) target leaves get empty lists (see
        # leaf_interactions: phantom targets must not consume budgets).
        rej2 = rej2 & (t_m > 0)[:, None]
        upk = jnp.where((t_m > 0)[:, None], upk, big)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, rej2.shape, 1)
        c2_idx, c2_valid, of2 = _row_compact(rej2, cols2, cand2_budget)

        acc1, rej1, gid1 = _refine_stage(pack2, b2, c2_idx, c2_valid,
                                         t_com, t_r, theta)
        c1_idx, c1_valid, of1 = _keys_compact(
            jnp.where(rej1, gid1, big).reshape(r, -1), cand1_budget)

        acc0, near0, gid0 = _refine_stage(pack1, b1, c1_idx, c1_valid,
                                          t_com, t_r, theta)
        near_keys = jnp.where(near0, gid0, big).reshape(r, -1)
        near_idx, near_valid, of_n = _keys_compact(near_keys, near_budget)

        if octet_far:
            far1_keys = _octet_keys_children(acc1, c2_idx, offs8[1], b2)
            far0_keys = _octet_keys_children(acc0, c1_idx, offs8[0], b1)
        else:
            far1_keys = jnp.where(acc1, offs[1] + gid1, big).reshape(r, -1)
            far0_keys = jnp.where(acc0, gid0, big).reshape(r, -1)
        far_idx, far_valid, of_f = _keys_compact(
            jnp.concatenate([far0_keys, far1_keys, upk], axis=1), far_budget)
        if octet_far:
            of_f = of_f * 8  # a clipped octet hides up to 8 nodes
        # A clipped candidate hides up to b children from BOTH classes.
        of = (of2 * (b2 * b1) + of1 * b1 + of_n + of_f).astype(jnp.int32)
        return near_idx, near_valid, far_idx, far_valid, of

    if row_block <= 0:
        # ~256 MB of gathered (R, B1, 128-lane) temporaries per block.
        per_row = max(cand1_budget, cand2_budget) * 128 * 4
        row_block = max(8, (1 << 28) // max(per_row, 1))
    near_idx, near_valid, far_idx, far_valid, of = _map_row_blocks(
        block_fn, (rejects_l2, up_keys, tgt_com, tgt_r, tgt_m), n_slice,
        row_block)
    overflow = jnp.sum(of).astype(jnp.int32)
    nodes = _nodes_all_octet(tree, dtype) if octet_far \
        else _nodes_all(tree, dtype)
    return (near_idx, near_valid, far_idx, far_valid, nodes, overflow)


# ----------------------------------------------------------------- near field
def _near_field_jnp(pos_sorted, mass_sorted, tgt_leaves, idx, valid,
                    leaf_size, g, eps2, guard_zero):
    """tgt_leaves: (Ls, G, 3) target slice; sources gathered from the full
    sorted arrays via idx (Ls, B)."""
    n_pad = pos_sorted.shape[0]
    n_leaves = n_pad // leaf_size
    n_slice = tgt_leaves.shape[0]
    budget = idx.shape[1]
    dtype = pos_sorted.dtype
    p = pos_sorted.reshape(n_leaves, leaf_size, 3)
    m = mass_sorted.reshape(n_leaves, leaf_size)

    def step(carry, k):
        acc, pot = carry
        src = idx[:, k]                      # (Ls,)
        vf = valid[:, k].astype(dtype)       # (Ls,)
        ps = p[src]                          # (Ls, G, 3)
        ms = m[src] * vf[:, None]            # mask by validity
        d = ps[:, None, :, :] - tgt_leaves[:, :, None, :]  # (Ls, G, G, 3)
        r2 = jnp.sum(d * d, axis=-1) + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0, u, 0.0)
        mu = ms[:, None, :] * u
        w = mu * u * u
        acc = acc + jnp.einsum("lij,lijc->lic", w, d)
        pot = pot - jnp.sum(mu, axis=-1)
        return (acc, pot), None

    acc0 = jnp.zeros((n_slice, leaf_size, 3), dtype)
    pot0 = jnp.zeros((n_slice, leaf_size), dtype)
    (acc, pot), _ = jax.lax.scan(step, (acc0, pot0), jnp.arange(budget))
    n_out = n_slice * leaf_size
    return g * acc.reshape(n_out, 3), g * pot.reshape(n_out)


def _far0_jnp(tgt_leaves, node_pos, node_mass, g, eps2, guard_zero,
              block_leaves, node_quad=None):
    """Accepted node multipoles, per target leaf (jnp fallback path).

    tgt_leaves: (Ls, G, 3); node_pos: (Ls, B0, 3); node_mass: (Ls, B0)
    (invalid entries must already have zero mass); node_quad: optional
    (Ls, B0, 5) traceless quadrupoles [Qxx, Qyy, Qxy, Qxz, Qyz]."""
    n_slice, leaf_size, _ = tgt_leaves.shape

    def block(b0):
        pb = jax.lax.dynamic_slice_in_dim(tgt_leaves, b0, block_leaves, 0)
        npos = jax.lax.dynamic_slice_in_dim(node_pos, b0, block_leaves, 0)
        nm = jax.lax.dynamic_slice_in_dim(node_mass, b0, block_leaves, 0)
        d = npos[:, None, :, :] - pb[:, :, None, :]   # (B, G, B0, 3)
        r2 = jnp.sum(d * d, axis=-1) + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0, u, 0.0)
        mu = nm[:, None, :] * u
        w = mu * u * u
        acc = jnp.einsum("bgk,bgkc->bgc", w, d)
        pot = -jnp.sum(mu, axis=-1)
        if node_quad is not None:
            q = jax.lax.dynamic_slice_in_dim(node_quad, b0, block_leaves, 0)
            q = q[:, None]                            # (B, 1, B0, 5)
            qzz = -(q[..., 0] + q[..., 1])
            qd = jnp.stack([
                q[..., 0] * d[..., 0] + q[..., 2] * d[..., 1] + q[..., 3] * d[..., 2],
                q[..., 2] * d[..., 0] + q[..., 1] * d[..., 1] + q[..., 4] * d[..., 2],
                q[..., 3] * d[..., 0] + q[..., 4] * d[..., 1] + qzz * d[..., 2],
            ], axis=-1)
            qq = jnp.sum(qd * d, axis=-1)             # (B, G, B0)
            u2 = u * u
            u5 = u2 * u2 * u
            c1 = 2.5 * qq * u5 * u2
            acc = acc + jnp.einsum("bgk,bgkc->bgc", c1, d) \
                      - jnp.einsum("bgk,bgkc->bgc", u5, qd)
            pot = pot - jnp.sum(0.5 * qq * u5, axis=-1)
        return acc, pot

    n_blocks = n_slice // block_leaves
    starts = jnp.arange(n_blocks) * block_leaves
    acc, pot = jax.lax.map(block, starts)
    n_out = n_slice * leaf_size
    return g * acc.reshape(n_out, 3), g * pot.reshape(n_out)


def _far_octet_jnp(tgt_leaves, nodes8, keys, valid, g, eps2, guard_zero):
    """Octet-masked far list fallback (non-TPU): expand each key's (8, C)
    sibling tile with its child mask and reuse the node-list math. Semantics
    identical to ops/pallas_bh.far_octet_pallas."""
    n_slice, leaf_size, _ = tgt_leaves.shape
    budget = keys.shape[1]
    n_comp = nodes8.shape[1]
    with_quad = n_comp >= 9
    tiles8 = nodes8.reshape(-1, 8, n_comp)
    bit = jnp.arange(8, dtype=jnp.int32)

    acc = jnp.zeros((n_slice * leaf_size, 3), tgt_leaves.dtype)
    pot = jnp.zeros((n_slice * leaf_size,), tgt_leaves.dtype)
    chunk = max(1, min(64, budget))
    for c0 in range(0, budget, chunk):
        kk = keys[:, c0:c0 + chunk]
        vv = valid[:, c0:c0 + chunk]
        t = tiles8[jnp.where(vv, kk >> 8, 0)]        # (Ls, C8, 8, n_comp)
        mask = (((kk[..., None] >> bit) & 1) > 0) & vv[..., None]
        npos = t[..., :3].reshape(n_slice, -1, 3)
        nm = jnp.where(mask, t[..., 3], 0.0).reshape(n_slice, -1)
        nq = (jnp.where(mask[..., None], t[..., 4:9], 0.0)
              .reshape(n_slice, -1, 5) if with_quad else None)
        block = max(1, min(n_slice, (1 << 21) // max(leaf_size * chunk * 8, 1)))
        while n_slice % block:
            block -= 1
        a, ph = _far0_jnp(tgt_leaves, npos, nm, g, eps2, guard_zero,
                          block, node_quad=nq)
        acc, pot = acc + a, pot + ph
    return acc, pot


def _eval_far_octet(tgt_leaves, nodes8, keys, valid, *, g, softening,
                    use_pallas, compute_pot=True):
    """Evaluate ONE octet-masked far list over the 8-aligned combined node
    table -> (acc, pot) flat over the window's particles. VMEM-resident
    Pallas kernel on TPU (zero HBM gather), chunked jnp fallback
    elsewhere."""
    eps2 = jnp.asarray(softening, tgt_leaves.dtype) ** 2
    guard_zero = softening == 0.0
    if use_pallas:
        from parallelnbody_tpu.ops.pallas_bh import far_octet_pallas

        interpret = jax.default_backend() != "tpu"
        return far_octet_pallas(tgt_leaves, nodes8, keys, valid, g,
                                float(softening), guard_zero,
                                interpret=interpret, compute_pot=compute_pot)
    return _far_octet_jnp(tgt_leaves, nodes8, keys, valid, g, eps2,
                          guard_zero)


# ------------------------------------------------------------------- assembly
def _prepare(pos, mass, *, leaf_size, curve, multipole_order=1, max_levels=12):
    """Pad, curve-sort, and build the monopole pyramid. Returns
    (pos_s, mass_s, perm, tree, n, n_pad)."""
    n = pos.shape[0]
    dtype = pos.dtype
    n_leaves, n_pad, _ = plan_tree(n, leaf_size, max_levels)

    # Domain cube (reference ComputeCubeSize semantics: max extent —
    # OctreeSearch.cpp:47-56 — centered on the particle bounding box for
    # tighter keys).
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    center, half, sentinel = domain_cube(lo, hi)

    encode = hilbert_encode if curve == "hilbert" else morton_encode
    keys = encode(pos, center, half)
    if n_pad > n:
        pad_pos = jnp.broadcast_to(sentinel, (n_pad - n, 3)).astype(dtype)
        pos_p = jnp.concatenate([pos, pad_pos], axis=0)
        mass_p = jnp.concatenate([mass, jnp.zeros(n_pad - n, dtype)], axis=0)
        keys = jnp.concatenate(
            [keys, jnp.full(n_pad - n, jnp.iinfo(jnp.int32).max, jnp.int32)], axis=0
        )
    else:
        pos_p, mass_p = pos, mass

    # Multi-operand (key, iota)-sort carrying the payload columns: measured
    # 8.4 ms vs 23.4 ms for argsort + row gathers at N=1M on v5e — gathers
    # through the lane-padded (N, 3) layout are the usual tax; multi-operand
    # sorts stream at bandwidth. num_keys=2 reproduces stable-argsort
    # tie-breaking exactly.
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, perm, sx, sy, sz, mass_s = jax.lax.sort(
        (keys, iota, pos_p[:, 0], pos_p[:, 1], pos_p[:, 2], mass_p),
        num_keys=2)
    pos_s = jnp.stack([sx, sy, sz], axis=1)
    tree = build_tree(pos_s, mass_s, leaf_size, sentinel,
                      multipole_order=multipole_order, max_levels=max_levels)
    return pos_s, mass_s, perm, tree, n, n_pad


def build_interaction_lists(tree, far_masks, rejects_l1, *, theta, start_leaf,
                            n_slice, near_budget, far0_budget, dtype):
    """Interaction lists + node tables for one target window. Needs only the
    (possibly gathered) tree — no particle data — so the distributed path
    (parallel/distributed.py) shares it verbatim.

    Returns (near_idx, near_valid, far0_idx, far0_valid, up_idx, up_valid,
    nodes_up, leaf_nodes, overflow)."""
    near_idx, near_valid, far0_idx, far0_valid, overflow = leaf_interactions(
        tree, rejects_l1, theta, start_leaf=start_leaf, n_slice=n_slice,
        near_budget=near_budget, far0_budget=far0_budget)

    # Upper-level accepted nodes: the dense mask is narrow (node counts
    # shrink 8x per level), so it serves directly as a full-width list.
    nodes_up = jnp.concatenate(
        [_node_table(tree, k, dtype) for k in range(1, tree.n_levels)],
        axis=0)
    n_up = nodes_up.shape[0]
    # far_masks arrive pre-sliced to this target window (traverse slice).
    up_mask = jnp.concatenate(
        [far_masks[k] for k in range(1, tree.n_levels)], axis=1)
    # Front-pack the (narrow) dense acceptance mask so the kernel's count
    # skipping bites: mean accepted count is ~half the width (measured 274 of
    # 585 at N=1M), and the compacting row sort costs ~3 ms vs the ~15 ms of
    # far-kernel time the skipped sub-tiles save. Budget = full width -> the
    # compaction cannot overflow.
    cols_up = jax.lax.broadcasted_iota(jnp.int32, up_mask.shape, 1)
    up_idx, up_valid, _ = _row_compact(up_mask, cols_up, n_up)
    leaf_nodes = _node_table(tree, 0, dtype)
    return (near_idx, near_valid, far0_idx, far0_valid, up_idx, up_valid,
            nodes_up, leaf_nodes, overflow)


def build_interaction_lists_octet(tree, far_masks, rejects_l1, *, theta,
                                  start_leaf, n_slice, near_budget,
                                  far_budget, dtype):
    """Dense-refinement lists in octet-masked far form: ONE combined far
    list of (octet_id << 8) | child_mask keys covering every far class
    (upper accepted nodes, levels >= 1, AND leaf-MAC-accepted candidates)
    over the 8-aligned combined node table (_nodes_all_octet), plus the
    unchanged near list. far_budget counts OCTET entries — a per-node
    budget is always sufficient (each octet holds >= 1 accepted node) and
    the real requirement is ~4-8x smaller (tree_stats reports it).

    Returns (near_idx, near_valid, far_keys, far_valid, nodes8, overflow);
    overflow counts near clips plus 8x clipped far octets (a clipped octet
    hides up to 8 nodes)."""
    near_mask, far_mask = _dense_leaf_masks(tree, rejects_l1, theta,
                                            start_leaf, n_slice)
    n_leaves = tree.com[0].shape[0]
    offs8, n_oct = _octet_offsets([c.shape[0] for c in tree.com])
    big = jnp.iinfo(jnp.int32).max

    cols = jax.lax.broadcasted_iota(jnp.int32, (n_slice, n_leaves), 1)
    near_idx, near_valid, of_n = _row_compact(near_mask, cols, near_budget)

    # Phantom (zero-mass) targets: the leaf masks already exclude them via
    # _dense_leaf_masks; the upper masks must be blanked the same way.
    tgt_m = jax.lax.dynamic_slice_in_dim(tree.mass[0], start_leaf, n_slice, 0)
    upk = _octet_upper_keys(far_masks, offs8, tree.n_levels, lo_level=1)
    upk = jnp.where((tgt_m > 0)[:, None], upk, big)
    far_keys = jnp.concatenate(
        [_octet_keys_dense(far_mask, offs8[0]), upk], axis=1)
    far_keys, far_valid, of_f = _keys_compact(far_keys,
                                              min(far_budget, n_oct))
    overflow = (of_n + 8 * of_f).astype(jnp.int32)
    return (near_idx, near_valid, far_keys, far_valid,
            _nodes_all_octet(tree, dtype), overflow)


def _eval_far_list(tgt_leaves, table, idx, valid, *, g, softening,
                   use_pallas, compute_pot=True):
    """Evaluate ONE padded per-target multipole list over `table` node rows
    ([com, mass] or [com, mass, quad]) -> (acc, pot) flat over the window's
    particles. Pallas gathered-chunk kernel on TPU, chunked jnp fallback
    elsewhere."""
    dtype = tgt_leaves.dtype
    n_slice, leaf_size, _ = tgt_leaves.shape
    eps2 = jnp.asarray(softening, dtype) ** 2
    guard_zero = softening == 0.0
    with_quad = table.shape[1] >= 9

    if use_pallas:
        from parallelnbody_tpu.ops.pallas_bh import far_field_pallas

        interpret = jax.default_backend() != "tpu"
        acc, pot, _ = far_field_pallas(tgt_leaves, table, idx, valid,
                                       g, float(softening), guard_zero,
                                       interpret=interpret,
                                       compute_pot=compute_pot)
        return acc, pot

    acc = jnp.zeros((n_slice * leaf_size, 3), dtype)
    pot = jnp.zeros((n_slice * leaf_size,), dtype)
    b = idx.shape[1]
    chunk = min(512, b)
    for c0 in range(0, b, chunk):
        ii = idx[:, c0:c0 + chunk]
        vv = valid[:, c0:c0 + chunk]
        npos = table[ii, :3]
        nm = jnp.where(vv, table[ii, 3], 0.0).astype(dtype)
        nq = (jnp.where(vv[..., None], table[ii, 4:9], 0.0)
              if with_quad else None)
        block = max(1, min(n_slice, (1 << 21) // max(leaf_size * chunk, 1)))
        while n_slice % block:
            block -= 1
        a, ph = _far0_jnp(tgt_leaves, npos, nm, g, eps2, guard_zero,
                          block, node_quad=nq)
        acc, pot = acc + a, pot + ph
    return acc, pot


def eval_far_lists(tgt_leaves, nodes_up, up_idx, up_valid, leaf_nodes,
                   far0_idx, far0_valid, *, g, softening, use_pallas,
                   compute_pot=True):
    """Both far classes (upper accepted nodes + leaf-level accepted
    multipoles) for one target window. Returns (acc, pot) flat over the
    window's particles.

    far0 stays unbinned: its list-length distribution is CONCENTRATED
    (N=1M theta=0.72 measured mean 834 / p50 907 of budget 1536 — the
    candidate volume is set by the level-1 rejects, not a fat tail), so
    count-sorted two-bin evaluation either clips heavily (bin_budget
    768: 4.2e5 clipped entries) or saves ~nothing (safe bin_budget
    1280: ~3 ms). Measured scripts/bh_breakdown.py round 3."""
    acc, pot = _eval_far_list(tgt_leaves, nodes_up, up_idx, up_valid,
                              g=g, softening=softening, use_pallas=use_pallas,
                              compute_pot=compute_pot)
    a, ph = _eval_far_list(tgt_leaves, leaf_nodes, far0_idx, far0_valid,
                           g=g, softening=softening, use_pallas=use_pallas,
                           compute_pot=compute_pot)
    return acc + a, pot + ph


def _forces_sorted(pos_s, mass_s, tree, far_masks, rejects, *, start_leaf,
                   n_slice, leaf_size, theta, g, softening, near_budget,
                   far0_budget, use_pallas, compute_pot=True,
                   refine="dense", cand_budgets=(0, 0), far_mode="gather"):
    """Far+near forces for target leaves [start_leaf, start_leaf + n_slice),
    in sorted order. start_leaf may be traced (multi-chip target partition).
    Returns (acc (n_slice*G, 3), pot (n_slice*G,), overflow).

    Everything is per-target lists of sources evaluated by the gathered-chunk
    kernels (ops/pallas_bh.py). refine="dense": the (n_slice, n_leaves)
    dense leaf plane (far_masks/rejects from traverse(stop_level=1));
    refine="staged": hierarchical candidate refinement
    (build_interaction_lists_staged; traverse(stop_level=2)) — O(budget)
    per target instead of O(n_leaves), for large leaf counts. In staged
    mode far0_budget covers ALL far classes (upper + level-1 + leaf) in one
    list, and cand_budgets = (cand2, cand1) sizes the refinement stages.

    far_mode="octet": the far field is emitted as octet-masked keys and
    evaluated by the VMEM-resident sibling-tile kernel (far_octet_pallas) —
    no budget-wide HBM gather, one kernel call for every far class;
    far0_budget then counts octet entries (a per-node budget is always
    sufficient). "gather" keeps the gathered-chunk kernels.

    (A third refine, "block" — one shared far list per level-1 block +
    per-leaf residual — was built, measured never simultaneously
    overflow-free and faster than staged, and retired; full record in
    docs/DESIGN.md r4.)"""
    dtype = pos_s.dtype
    n_pad = pos_s.shape[0]
    n_leaves = n_pad // leaf_size
    eps2 = jnp.asarray(softening, dtype) ** 2
    guard_zero = softening == 0.0

    p_leaves = pos_s.reshape(n_leaves, leaf_size, 3)
    tgt_leaves = jax.lax.dynamic_slice_in_dim(p_leaves, start_leaf, n_slice, 0)
    if refine == "staged":
        (near_idx, near_valid, far_idx, far_valid, nodes_all,
         overflow) = build_interaction_lists_staged(
            tree, far_masks, rejects, theta=theta, start_leaf=start_leaf,
            n_slice=n_slice, near_budget=near_budget, far_budget=far0_budget,
            cand2_budget=cand_budgets[0], cand1_budget=cand_budgets[1],
            dtype=dtype, octet_far=far_mode == "octet")
        if far_mode == "octet":
            acc, pot = _eval_far_octet(
                tgt_leaves, nodes_all, far_idx, far_valid, g=g,
                softening=softening, use_pallas=use_pallas,
                compute_pot=compute_pot)
        else:
            acc, pot = _eval_far_list(
                tgt_leaves, nodes_all, far_idx, far_valid, g=g,
                softening=softening, use_pallas=use_pallas,
                compute_pot=compute_pot)
    elif far_mode == "octet":
        (near_idx, near_valid, far_keys, far_valid, nodes8,
         overflow) = build_interaction_lists_octet(
            tree, far_masks, rejects, theta=theta, start_leaf=start_leaf,
            n_slice=n_slice, near_budget=near_budget, far_budget=far0_budget,
            dtype=dtype)
        acc, pot = _eval_far_octet(
            tgt_leaves, nodes8, far_keys, far_valid, g=g,
            softening=softening, use_pallas=use_pallas,
            compute_pot=compute_pot)
    else:
        (near_idx, near_valid, far0_idx, far0_valid, up_idx, up_valid,
         nodes_up, leaf_nodes, overflow) = build_interaction_lists(
            tree, far_masks, rejects, theta=theta, start_leaf=start_leaf,
            n_slice=n_slice, near_budget=near_budget, far0_budget=far0_budget,
            dtype=dtype)

        acc, pot = eval_far_lists(
            tgt_leaves, nodes_up, up_idx, up_valid, leaf_nodes, far0_idx,
            far0_valid, g=g, softening=softening, use_pallas=use_pallas,
            compute_pot=compute_pot)
    if use_pallas:
        from parallelnbody_tpu.ops.pallas_bh import near_field_pallas

        a, ph = near_field_pallas(pos_s, mass_s, tgt_leaves, near_idx,
                                  near_valid, leaf_size, g, float(softening),
                                  guard_zero,
                                  interpret=jax.default_backend() != "tpu",
                                  compute_pot=compute_pot)
    else:
        a, ph = _near_field_jnp(pos_s, mass_s, tgt_leaves, near_idx,
                                near_valid, leaf_size, g, eps2, guard_zero)
    return acc + a, pot + ph, overflow


def resolve_refine(refine, cand_budgets, n_levels, near_budget, far_budget):
    """Resolve the refinement mode + staged candidate budgets.

    "staged" needs >= 3 tree levels (falls back to dense). Auto candidate
    budgets: every refined level-1 candidate contributes its ~8 leaf
    children to near/far0, so cand1 ~ (near + far) / 8. Level-2 reject
    counts are GEOMETRY-bound (theta and the leaf-radius tail), not
    budget-bound — measured per-target maxima at theta=0.72/quad/leaf-256
    on plummer: 206 at N=4M (16k leaves), 185 at N=8M (32k leaves) — so
    cand2 carries a measured floor of 256 (the r6 formula cand1/4 resolved
    128 at the 4M budget shape and clipped 78 candidates, costing rms
    0.197 vs 9.3e-4; caught by the bench-suite accuracy column)."""
    if refine not in ("dense", "staged"):
        raise ValueError(f"refine must be dense|staged (resolved), "
                         f"got {refine!r}")
    if refine == "staged" and n_levels < 3:
        refine = "dense"
    c2, c1 = cand_budgets
    if refine == "staged":
        if c1 <= 0:
            c1 = max(128, -(-(near_budget + far_budget) // 8) + 127 & ~127)
        if c2 <= 0:
            c2 = max(256, (c1 // 4) + 63 & ~63)
    return refine, (c2, c1)


def resolve_far_mode(far_mode, refine):
    """Resolve the far-field evaluation mode. "auto" -> "octet" (the
    measured-best resident-table sibling-tile path)."""
    if far_mode not in ("auto", "octet", "gather"):
        raise ValueError(f"far_mode must be auto|octet|gather, "
                         f"got {far_mode!r}")
    return "octet" if far_mode == "auto" else far_mode


# Sections auto threshold: the measured single-chip capacity boundary.
# N=16M (65536 leaves) compiles and runs unsectioned in 15.75 GB HBM;
# N=32M (131072 leaves) wants 34.6 GB at compile — the traversal planes,
# staged list planes, and their sort buffers all scale with the target-row
# count, so sectioning the TARGETS (sources stay whole) divides exactly the
# allocations that overshoot (VERDICT r3 next #1).
_SECTION_AUTO_LEAVES = 65536
_SECTION_TARGET_ROWS = 16384


def resolve_sections(sections, n_leaves, refine):
    """Resolve the evaluation section count. 0 = auto: 1 (unsectioned) up
    to the measured single-chip boundary (65536 leaves = N=16M at leaf
    256), then enough power-of-two sections to hold per-section target
    windows at ~16384 rows. Explicit counts are clamped to a power of two
    dividing n_leaves. Dense refine never sections (it is auto-selected
    only below 8192 leaves, far under the memory boundary)."""
    if refine == "dense":
        return 1
    if sections <= 0:
        if n_leaves <= _SECTION_AUTO_LEAVES:
            return 1
        sections = n_leaves // _SECTION_TARGET_ROWS
    s = 1
    while s * 2 <= min(sections, n_leaves):
        s *= 2
    return s


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "theta", "g", "softening", "near_budget",
                     "far0_budget", "use_pallas", "curve", "multipole",
                     "max_levels", "compute_pot", "refine", "cand_budgets",
                     "far_mode", "sections"),
)
def bh_accel(pos, mass, *, leaf_size=256, theta=0.5, g=1.0, softening=1e-2,
             near_budget=64, far0_budget=2048, use_pallas=False,
             curve="hilbert", multipole=1, max_levels=12, compute_pot=True,
             refine="dense", cand_budgets=(0, 0), far_mode="auto",
             sections=0):
    """Barnes-Hut accelerations/potentials in original particle order.

    Returns (acc (N,3), pot (N,), overflow ()): overflow > 0 means the
    near/far budgets clipped some pairs (increase cfg.bh_near_budget /
    cfg.bh_far_budget). The counter is an UPPER BOUND on lost entries, not
    an exact count: staged candidate-list clips are charged their
    worst-case subtree size and clipped far octets are charged 8 nodes
    (see build_interaction_lists_staged) — zero still means exactly
    "nothing clipped".

    refine: "dense" (the (n_slice, n_leaves) leaf plane) or "staged"
    (hierarchical candidate refinement, for large leaf counts — see
    build_interaction_lists_staged; falls back to dense on trees with
    fewer than 3 levels). cand_budgets = (cand2, cand1) candidate budgets;
    0 resolves to a default derived from the list budgets.

    sections: evaluate the target leaves in this many sequential windows
    (lax.map), re-using the same windowed traversal + list machinery the
    multi-chip path runs (bh_accel_target_slice) — the per-window
    traversal planes, staged lists, and their sort buffers are sized by
    n_leaves/sections instead of n_leaves, which is what closes the
    measured N=32M single-chip compile-OOM (34.6 GB unsectioned vs
    15.75 GB HBM). 0 = auto (resolve_sections: unsectioned up to the
    measured 16M boundary). Identical physics and lists to the
    unsectioned evaluation — each target window sees the same candidates.
    """
    pos_s, mass_s, perm, tree, n, n_pad = _prepare(
        pos, mass, leaf_size=leaf_size, curve=curve, multipole_order=multipole,
        max_levels=max_levels)
    n_leaves = n_pad // leaf_size
    refine, cand_budgets = resolve_refine(refine, cand_budgets, tree.n_levels,
                                          near_budget, far0_budget)
    far_mode = resolve_far_mode(far_mode, refine)
    sections = resolve_sections(sections, n_leaves, refine)
    stop = 1 if refine == "dense" else 2

    if sections == 1:
        far_masks, rejects = traverse(tree, theta, stop_level=stop)
        acc, pot, overflow = _forces_sorted(
            pos_s, mass_s, tree, far_masks, rejects,
            start_leaf=0, n_slice=n_leaves, leaf_size=leaf_size, theta=theta,
            g=g, softening=softening, near_budget=near_budget,
            far0_budget=far0_budget, use_pallas=use_pallas,
            compute_pot=compute_pot, refine=refine, cand_budgets=cand_budgets,
            far_mode=far_mode)
    else:
        w = n_leaves // sections

        def section_fn(i):
            start = i * w
            far_masks, rejects = traverse(tree, theta, start_leaf=start,
                                          n_slice=w, stop_level=stop)
            return _forces_sorted(
                pos_s, mass_s, tree, far_masks, rejects,
                start_leaf=start, n_slice=w, leaf_size=leaf_size,
                theta=theta, g=g, softening=softening,
                near_budget=near_budget, far0_budget=far0_budget,
                use_pallas=use_pallas, compute_pot=compute_pot,
                refine=refine, cand_budgets=cand_budgets, far_mode=far_mode)

        accs, pots, ovfs = jax.lax.map(
            section_fn, jnp.arange(sections, dtype=jnp.int32))
        acc = accs.reshape(n_pad, 3)
        pot = pots.reshape(n_pad)
        overflow = jnp.sum(ovfs).astype(jnp.int32)

    # Unsort back to the caller's particle order: a 5-operand row sort keyed
    # by the permutation (sorted row i belongs at original index perm[i]).
    # A scatter (.at[perm].set) measured 100 ms at N=1M on v5e; this sort
    # measured 15 ms (TPU scatters are the slowest reordering primitive;
    # multi-operand sorts stream at bandwidth).
    _, ax, ay, az, pot_out = jax.lax.sort(
        (perm.astype(jnp.int32), acc[:, 0], acc[:, 1], acc[:, 2], pot),
        num_keys=1)
    acc_out = jnp.stack([ax, ay, az], axis=1)[:n]
    return acc_out, pot_out[:n], overflow


def bh_accel_target_slice(pos_all, mass_all, rank, n_ranks, *, leaf_size,
                          theta, g, softening, near_budget, far0_budget,
                          use_pallas, curve, multipole=1, max_levels=12,
                          refine="dense", cand_budgets=(0, 0),
                          far_mode="auto"):
    """Multi-chip building block (replicated tree, partitioned targets):
    compute forces only for the rank-th slice of target leaves.

    pos_all/mass_all are the gathered GLOBAL arrays (identical on every
    chip); rank is the traced mesh position. Returns
    (acc_slice, pot_slice, perm, overflow): slice results in sorted order
    plus the (replicated) sort permutation so the caller can reassemble
    original order after an all_gather of slices. (SURVEY.md §7 stage 6.)
    """
    pos_s, mass_s, perm, tree, n, n_pad = _prepare(
        pos_all, mass_all, leaf_size=leaf_size, curve=curve,
        multipole_order=multipole, max_levels=max_levels)
    n_leaves = n_pad // leaf_size
    # Any rank count: slices of ceil(n_leaves / n_ranks) leaves; the trailing
    # ranks' windows are clamped into range (dynamic_slice semantics), so
    # they recompute a few leaves already covered by the previous rank —
    # harmless duplicated work, and the caller's row map (slice_row_of_sorted)
    # picks a consistent copy.
    n_slice = -(-n_leaves // n_ranks)
    start = jnp.minimum(rank * n_slice, n_leaves - n_slice)
    refine, cand_budgets = resolve_refine(refine, cand_budgets, tree.n_levels,
                                          near_budget, far0_budget)
    far_mode = resolve_far_mode(far_mode, refine)
    # Traverse only this rank's target window: with the sliced traversal and
    # lists, only _prepare (the sort + pyramid) remains replicated work.
    far_masks, rejects = traverse(
        tree, theta, start_leaf=start, n_slice=n_slice,
        stop_level=2 if refine == "staged" else 1)
    acc, pot, overflow = _forces_sorted(
        pos_s, mass_s, tree, far_masks, rejects,
        start_leaf=start, n_slice=n_slice, leaf_size=leaf_size,
        theta=theta, g=g, softening=softening, near_budget=near_budget,
        far0_budget=far0_budget, use_pallas=use_pallas, refine=refine,
        cand_budgets=cand_budgets, far_mode=far_mode)
    return acc, pot, perm, overflow


# ------------------------------------------------------------- list reuse
class BHListPlan(NamedTuple):
    """Frozen interaction lists for rebuild-interval reuse (bh_rebuild_every).

    Built once per rebuild block from the tree at block-start positions;
    re-evaluated against FRESH multipoles (bh_eval_lists rebuilds the
    pyramid every step) while the list membership stays fixed. Valid for
    any far_mode="octet" single-chip configuration (the shipped auto).
    overflow is the list-build clip counter (reuse evaluations cannot clip
    further: membership is frozen)."""

    near_idx: jax.Array    # (n_leaves, near_budget) source-leaf ids
    near_valid: jax.Array  # (n_leaves, near_budget) bool
    far_keys: jax.Array    # (n_leaves, far_budget) (octet_id<<8)|child_mask
    far_valid: jax.Array   # (n_leaves, far_budget) bool
    overflow: jax.Array    # () int32


def bh_plan_lists(tree: BHTree, *, theta, near_budget, far_budget,
                  refine, cand_budgets, dtype, sections=1) -> BHListPlan:
    """Traverse + build the octet-far interaction lists for ALL target
    leaves of `tree` — the geometry half of bh_accel, shared by the
    rebuild-interval runs (api._make_run_reuse) and scripts/reuse_probe.py.
    refine/cand_budgets must arrive resolved (resolve_refine).

    sections > 1 (resolve_sections — the >16M capacity path): the traversal
    planes and list-build intermediates are sized per target WINDOW exactly
    as in sectioned bh_accel, while the returned plan is full-width — the
    builders emit global source ids, so per-window lists concatenate into
    the same plan the unsectioned build produces. The FINAL lists are the
    cheap part (N=32M: ~2.4 GB at the shipped budgets vs the 34.6 GB
    unsectioned *build* ask), which is what makes list reuse available to
    the sectioned scales at all."""
    n_leaves = tree.com[0].shape[0]
    stop = 1 if refine == "dense" else 2

    def window(start, n_slice):
        far_masks, rejects = traverse(tree, theta, start_leaf=start,
                                      n_slice=n_slice, stop_level=stop)
        if refine == "staged":
            ni, nv, fk, fv, _, of = build_interaction_lists_staged(
                tree, far_masks, rejects, theta=theta, start_leaf=start,
                n_slice=n_slice, near_budget=near_budget,
                far_budget=far_budget, cand2_budget=cand_budgets[0],
                cand1_budget=cand_budgets[1], dtype=dtype, octet_far=True)
        else:
            ni, nv, fk, fv, _, of = build_interaction_lists_octet(
                tree, far_masks, rejects, theta=theta, start_leaf=start,
                n_slice=n_slice, near_budget=near_budget,
                far_budget=far_budget, dtype=dtype)
        return ni, nv, fk, fv, of.astype(jnp.int32)

    if sections == 1:
        ni, nv, fk, fv, of = window(0, n_leaves)
    else:
        w = n_leaves // sections
        ni, nv, fk, fv, ofs = jax.lax.map(
            lambda i: window(i * w, w),
            jnp.arange(sections, dtype=jnp.int32))
        ni = ni.reshape(n_leaves, -1)
        nv = nv.reshape(n_leaves, -1)
        fk = fk.reshape(n_leaves, -1)
        fv = fv.reshape(n_leaves, -1)
        of = jnp.sum(ofs).astype(jnp.int32)
    return BHListPlan(ni, nv, fk, fv, of)


def bh_eval_lists(pos_s, mass_s, plan: BHListPlan, *, leaf_size, g,
                  softening, multipole, max_levels, use_pallas, compute_pot,
                  n_live, sections=1):
    """Evaluate frozen lists at CURRENT sorted positions: fresh multipole
    pyramid (build_tree reshape-reductions — the cheap, mass-distribution
    half of the geometry) + the near/far kernels; no sort, no traversal, no
    list build, no unsort. Returns (acc (n_pad, 3), pot (n_pad,)) in sorted
    order. n_live: count of real rows (pads sit at rows [n_live:] in sorted
    order and must not widen the domain cube). sections > 1 evaluates the
    target windows in a lax.map like sectioned bh_accel (measured free —
    CLAUDE.md r6), bounding the per-window kernel operands at the >16M
    scales; physics identical to the unsectioned eval.

    Measured (scripts/reuse_probe.py, v5e): skipping the geometry is -5%
    per eval at N=1M dense-256 (231.8 -> 217.9 ms), -9..-11% at the staged
    scales (4M 913->817, 8M 2052->1842, 2M galaxy 567->508), while the
    frozen lists stay essentially exact for O(10) steps at shipped dt
    (vs-direct rms unchanged at 1e-3 through 8 reused steps; the reuse-vs-
    fresh component stays 3-9e-4, below the MAC error)."""
    dtype = pos_s.dtype
    n_pad = pos_s.shape[0]
    n_leaves = n_pad // leaf_size
    lo = jnp.min(pos_s[:n_live], axis=0)
    hi = jnp.max(pos_s[:n_live], axis=0)
    _, _, sentinel = domain_cube(lo, hi)
    tree = build_tree(pos_s, mass_s, leaf_size, sentinel,
                      multipole_order=multipole, max_levels=max_levels)
    nodes8 = _nodes_all_octet(tree, dtype)
    tgt = pos_s.reshape(n_leaves, leaf_size, 3)

    def eval_window(tgt_w, ni, nv, fk, fv):
        acc, pot = _eval_far_octet(
            tgt_w, nodes8, fk, fv, g=g, softening=softening,
            use_pallas=use_pallas, compute_pot=compute_pot)
        if use_pallas:
            from parallelnbody_tpu.ops.pallas_bh import near_field_pallas

            a, ph = near_field_pallas(
                pos_s, mass_s, tgt_w, ni, nv, leaf_size,
                g, float(softening), softening == 0.0,
                interpret=jax.default_backend() != "tpu",
                compute_pot=compute_pot)
        else:
            eps2 = jnp.asarray(softening, dtype) ** 2
            a, ph = _near_field_jnp(pos_s, mass_s, tgt_w, ni, nv,
                                    leaf_size, g, eps2, softening == 0.0)
        return acc + a, pot + ph

    if sections == 1:
        acc, pot = eval_window(tgt, plan.near_idx, plan.near_valid,
                               plan.far_keys, plan.far_valid)
    else:
        w = n_leaves // sections

        def section_fn(i):
            s = i * w
            return eval_window(
                jax.lax.dynamic_slice_in_dim(tgt, s, w, 0),
                jax.lax.dynamic_slice_in_dim(plan.near_idx, s, w, 0),
                jax.lax.dynamic_slice_in_dim(plan.near_valid, s, w, 0),
                jax.lax.dynamic_slice_in_dim(plan.far_keys, s, w, 0),
                jax.lax.dynamic_slice_in_dim(plan.far_valid, s, w, 0))

        acc, pot = jax.lax.map(section_fn,
                               jnp.arange(sections, dtype=jnp.int32))
    return acc.reshape(n_pad, 3), pot.reshape(n_pad)


def slice_row_of_sorted(sorted_idx, n_leaves, n_ranks, leaf_size):
    """Row in the rank-concatenated slice results for each sorted index.

    With n_slice = ceil(n_leaves / n_ranks) and rank windows clamped as in
    bh_accel_target_slice, sorted leaf L is covered by rank
    min(L // n_slice, n_ranks - 1) (possibly by more when windows overlap;
    this picks that canonical one)."""
    n_slice = -(-n_leaves // n_ranks)
    leaf = sorted_idx // leaf_size
    rank = jnp.minimum(leaf // n_slice, n_ranks - 1)
    start = jnp.minimum(rank * n_slice, n_leaves - n_slice)
    return rank * (n_slice * leaf_size) + (sorted_idx - start * leaf_size)


def leaf_aabbs(pos, mass, *, leaf_size=256, curve="hilbert"):
    """Axis-aligned bounding boxes of the occupied tree leaves, for the
    octree visualization (the reference's ShowOctree draws a red debug box
    per occupied leaf each frame — OctreeSearch.cpp:36-45, flag h:123-124;
    here leaves are Hilbert groups, so the drawn box is the leaf's particle
    AABB). Returns (lo (L,3), hi (L,3), occupied (L,) bool)."""
    pos_s, mass_s, _, _, _, n_pad = _prepare(pos, mass, leaf_size=leaf_size,
                                             curve=curve)
    n_leaves = n_pad // leaf_size
    p = pos_s.reshape(n_leaves, leaf_size, 3)
    occ = (mass_s.reshape(n_leaves, leaf_size) > 0)[..., None]
    lo = jnp.min(jnp.where(occ, p, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(occ, p, -jnp.inf), axis=1)
    return lo, hi, jnp.any(occ[..., 0], axis=1)


def tree_stats(pos, mass, cfg) -> dict:
    """Structure dump for the `tree` CLI subcommand: depth, level widths,
    leaf-radius and interaction-list-length percentiles, overflow. The
    list-length histogram is also the tuning signal for the budgets —
    reported for whichever refinement mode the config resolves to (dense /
    staged / block), so `tree` always audits what `run` would execute."""
    import numpy as np

    pos_s, mass_s, _, tree, n, n_pad = _prepare(
        pos, mass, leaf_size=cfg.resolve_bh_leaf_size(),
        curve=cfg.bh_curve,
        multipole_order=cfg.bh_multipole, max_levels=cfg.bh_max_levels)
    n_leaves = n_pad // cfg.resolve_bh_leaf_size()
    refine, cands = resolve_refine(
        cfg.resolve_bh_refine(), (cfg.bh_cand2_budget, cfg.bh_cand_budget),
        tree.n_levels, cfg.resolve_bh_near_budget(), cfg.resolve_bh_far_budget())
    far_mode = resolve_far_mode(getattr(cfg, "bh_far_mode", "auto"), refine)

    def pct(x):
        x = np.asarray(x, np.float64)
        return {k: float(np.percentile(x, p)) for k, p in
                (("p50", 50), ("p90", 90), ("p99", 99), ("max", 100))} | {
                    "mean": float(x.mean())}

    out = {
        "n": int(n), "n_leaves": n_leaves,
        "leaf_size": cfg.resolve_bh_leaf_size(),
        "levels": tree.n_levels,
        "level_widths": [int(c.shape[0]) for c in tree.com],
        "theta": cfg.theta, "curve": cfg.bh_curve, "refine": refine,
        "far_mode": far_mode,
        "leaf_radius": pct(tree.radius[0]),
        "budgets": {"near": cfg.resolve_bh_near_budget(), "far": cfg.resolve_bh_far_budget()},
    }
    if refine == "dense" and far_mode == "octet":
        far_masks, rejects_l1 = traverse(tree, cfg.theta)
        (_, nv, _, fv, _, overflow) = build_interaction_lists_octet(
            tree, far_masks, rejects_l1, theta=cfg.theta, start_leaf=0,
            n_slice=n_leaves, near_budget=cfg.resolve_bh_near_budget(),
            far_budget=cfg.resolve_bh_far_budget(), dtype=pos_s.dtype)
        out |= {
            "near_leaves_per_target": pct(jnp.sum(nv, axis=1)),
            "far_octets_per_target": pct(jnp.sum(fv, axis=1)),
            "overflow": int(overflow),
        }
    elif refine == "dense":
        far_masks, rejects_l1 = traverse(tree, cfg.theta)
        near_idx, near_valid, far0_idx, far0_valid, overflow = \
            leaf_interactions(
                tree, rejects_l1, cfg.theta, start_leaf=0, n_slice=n_leaves,
                near_budget=cfg.resolve_bh_near_budget(),
                far0_budget=cfg.resolve_bh_far_budget())
        upper = sum(int(jnp.sum(far_masks[k]))
                    for k in range(1, tree.n_levels))
        out |= {
            "near_leaves_per_target": pct(jnp.sum(near_valid, axis=1)),
            "far0_nodes_per_target": pct(jnp.sum(far0_valid, axis=1)),
            "upper_accepted_total": upper,
            "overflow": int(overflow),
        }
    else:  # staged
        far_masks, rej2 = traverse(tree, cfg.theta, stop_level=2)
        (_, nv, _, fv, _, overflow) = build_interaction_lists_staged(
            tree, far_masks, rej2, theta=cfg.theta, start_leaf=0,
            n_slice=n_leaves, near_budget=cfg.resolve_bh_near_budget(),
            far_budget=cfg.resolve_bh_far_budget(), cand2_budget=cands[0],
            cand1_budget=cands[1], dtype=pos_s.dtype,
            octet_far=far_mode == "octet")
        far_key = ("far_octets_per_target" if far_mode == "octet"
                   else "far_nodes_per_target")
        out |= {
            "near_leaves_per_target": pct(jnp.sum(nv, axis=1)),
            far_key: pct(jnp.sum(fv, axis=1)),
            "l2_rejects_per_target": pct(jnp.sum(rej2, axis=1)),
            "cand_budgets": {"cand2": cands[0], "cand1": cands[1]},
            "overflow": int(overflow),
        }
    return out


def measure_budget_requirements(pos, mass, cfg) -> dict:
    """EXACT per-target interaction-list requirements of cfg's resolved
    Barnes-Hut pipeline on THIS mass distribution — the measurement behind
    budget auto-calibration (api.calibrate_budgets; VERDICT r4 #2: the
    framework derives budgets from its own t=0 geometry instead of
    shipping nine knobs the user must hand-tune).

    Counts are taken from the SAME masks/keys the list builders compact
    (_dense_leaf_masks / _refine_stage / _octet_keys_*), but summed per
    target row instead of budget-clipped — so the maxima are exact, not
    capped by any probe budget. The staged pipeline needs candidate lists
    to exist before stages B/C can run, so this is a host-side multi-stage
    procedure: stage A (traverse) yields the exact level-2 candidate
    maximum, which sizes stage B's lists exactly (zero clipping by
    construction), whose reject maximum sizes stage C — three small jits
    instead of one, trading two host round-trips for exactness.

    Returns {"near_max", "far_max", "cand2_max", "cand1_max", "refine",
    "far_mode", "sections", "n_leaves", "leaf_size"} (cand maxima are 0
    for dense refine). far_max counts octet entries when the far mode
    resolves to octet (the shipped auto), node entries for gather.

    Reference contrast: zero knobs — OctreeSearch.cpp:85 hardcodes theta
    and has no budgets because its lists are pointer recursion."""
    leaf_size = cfg.resolve_bh_leaf_size()
    theta = cfg.theta
    n = pos.shape[0]
    n_leaves, n_pad, n_levels = plan_tree(n, leaf_size, cfg.bh_max_levels)
    refine, _ = resolve_refine(cfg.resolve_bh_refine(), (1, 1), n_levels,
                               1, 1)
    far_mode = resolve_far_mode(getattr(cfg, "bh_far_mode", "auto"), refine)
    sections = resolve_sections(getattr(cfg, "bh_sections", 0), n_leaves,
                                refine)
    w = n_leaves // sections
    big = jnp.iinfo(jnp.int32).max
    octet = far_mode == "octet"
    out = {"refine": refine, "far_mode": far_mode, "sections": sections,
           "n_leaves": n_leaves, "leaf_size": leaf_size,
           "cand2_max": 0, "cand1_max": 0}

    def prep(pos, mass):
        _, _, _, tree, _, _ = _prepare(
            pos, mass, leaf_size=leaf_size, curve=cfg.bh_curve,
            multipole_order=cfg.bh_multipole, max_levels=cfg.bh_max_levels)
        return tree

    if refine == "dense":
        @jax.jit
        def measure_dense(pos, mass):
            tree = prep(pos, mass)
            offs8, _ = _octet_offsets([c.shape[0] for c in tree.com])

            def win(start):
                far_masks, rejects_l1 = traverse(tree, theta,
                                                 start_leaf=start, n_slice=w)
                near_mask, far_mask = _dense_leaf_masks(
                    tree, rejects_l1, theta, start, w)
                near_req = jnp.sum(near_mask, axis=1)
                tgt_m = jax.lax.dynamic_slice_in_dim(tree.mass[0], start, w, 0)
                if octet:
                    upk = _octet_upper_keys(far_masks, offs8, tree.n_levels,
                                            lo_level=1)
                    upk = jnp.where((tgt_m > 0)[:, None], upk, big)
                    far_req = (jnp.sum(_octet_keys_dense(
                        far_mask, offs8[0]) != big, axis=1)
                        + jnp.sum(upk != big, axis=1))
                else:
                    # gather-dense: only the leaf (far0) list is budgeted;
                    # the upper list compacts at full width (cannot clip).
                    far_req = jnp.sum(far_mask, axis=1)
                return jnp.max(near_req), jnp.max(far_req)

            if sections == 1:
                return win(0)
            nr, fr = jax.lax.map(lambda i: win(i * w),
                                 jnp.arange(sections, dtype=jnp.int32))
            return jnp.max(nr), jnp.max(fr)

        near_max, far_max = jax.device_get(measure_dense(pos, mass))
        return out | {"near_max": int(near_max), "far_max": int(far_max)}

    # ---- staged: three exact stages (A: traverse -> cand2 requirement;
    # B: level-2 refinement at exactly-sized lists -> cand1 requirement +
    # level-1 far counts; C: level-1 refinement -> near + leaf far counts).
    @jax.jit
    def stage_a(pos, mass):
        tree = prep(pos, mass)
        widths = [c.shape[0] for c in tree.com]
        offs8, _ = _octet_offsets(widths)
        offs = _level_offsets(widths)

        def win(start):
            far_masks, rej2 = traverse(tree, theta, start_leaf=start,
                                       n_slice=w, stop_level=2)
            tgt_m = jax.lax.dynamic_slice_in_dim(tree.mass[0], start, w, 0)
            rej2 = rej2 & (tgt_m > 0)[:, None]
            upk = (_octet_upper_keys(far_masks, offs8, tree.n_levels)
                   if octet else _upper_keys(far_masks, offs, tree.n_levels))
            upc = jnp.sum(jnp.where((tgt_m > 0)[:, None], upk, big) != big,
                          axis=1)
            return jnp.sum(rej2, axis=1), upc, rej2

        if sections == 1:
            c2r, upc, rej2 = win(0)
        else:
            c2r, upc, rej2 = jax.lax.map(
                lambda i: win(i * w), jnp.arange(sections, dtype=jnp.int32))
            c2r = c2r.reshape(n_leaves)
            upc = upc.reshape(n_leaves)
            rej2 = rej2.reshape(n_leaves, -1)
        return tree, c2r, upc, rej2

    tree, c2r, upc, rej2 = stage_a(pos, mass)
    widths = [int(c.shape[0]) for c in tree.com]
    offs8, _ = _octet_offsets(widths)
    cand2_max = int(jax.device_get(jnp.max(c2r)))
    c2b = max(8, min(cand2_max, widths[2]))

    def _blocked(fn, args, per_row):
        row_block = max(8, (1 << 28) // max(per_row, 1))
        return _map_row_blocks(fn, args, n_leaves, row_block)

    @jax.jit
    def stage_b(tree, rej2):
        pack2, b2 = _child_pack(tree, 2)

        def block_fn(args):
            rej2_b, t_com, t_r = args
            r = rej2_b.shape[0]
            cols2 = jax.lax.broadcasted_iota(jnp.int32, rej2_b.shape, 1)
            c2_idx, c2_valid, _ = _row_compact(rej2_b, cols2, c2b)
            acc1, rej1, gid1 = _refine_stage(pack2, b2, c2_idx, c2_valid,
                                             t_com, t_r, theta)
            c1req = jnp.sum(rej1.reshape(r, -1), axis=1)
            if octet:
                k1 = _octet_keys_children(acc1, c2_idx, offs8[1], b2)
                f1 = jnp.sum(k1.reshape(r, -1) != big, axis=1)
            else:
                f1 = jnp.sum(acc1.reshape(r, -1), axis=1)
            return c1req, f1

        return _blocked(block_fn, (rej2, tree.com[0], tree.radius[0]),
                        c2b * 128 * 4)

    c1req, f1 = stage_b(tree, rej2)
    cand1_max = int(jax.device_get(jnp.max(c1req)))
    c1b = max(8, min(cand1_max, widths[1]))

    @jax.jit
    def stage_c(tree, rej2):
        pack2, b2 = _child_pack(tree, 2)
        pack1, b1 = _child_pack(tree, 1)

        def block_fn(args):
            rej2_b, t_com, t_r = args
            r = rej2_b.shape[0]
            cols2 = jax.lax.broadcasted_iota(jnp.int32, rej2_b.shape, 1)
            c2_idx, c2_valid, _ = _row_compact(rej2_b, cols2, c2b)
            acc1, rej1, gid1 = _refine_stage(pack2, b2, c2_idx, c2_valid,
                                             t_com, t_r, theta)
            c1_idx, c1_valid, _ = _keys_compact(
                jnp.where(rej1, gid1, big).reshape(r, -1), c1b)
            acc0, near0, gid0 = _refine_stage(pack1, b1, c1_idx, c1_valid,
                                              t_com, t_r, theta)
            near_req = jnp.sum(near0.reshape(r, -1), axis=1)
            if octet:
                k0 = _octet_keys_children(acc0, c1_idx, offs8[0], b1)
                f0 = jnp.sum(k0.reshape(r, -1) != big, axis=1)
            else:
                f0 = jnp.sum(acc0.reshape(r, -1), axis=1)
            return near_req, f0

        return _blocked(block_fn, (rej2, tree.com[0], tree.radius[0]),
                        max(c1b, c2b) * 128 * 4)

    near_req, f0 = stage_c(tree, rej2)
    near_max = int(jax.device_get(jnp.max(near_req)))
    far_max = int(jax.device_get(jnp.max(upc + f1 + f0)))
    return out | {"near_max": near_max, "far_max": far_max,
                  "cand2_max": cand2_max, "cand1_max": cand1_max}


def measure_import_requirement(pos, mass, cfg, n_ranks: int) -> dict:
    """Measured LET import-budget requirement (bh_comm="let"): the maximum
    over (requester, owner) rank pairs of DISTINCT owner leaves referenced
    by the requester's near lists on THIS mass distribution — the
    measurement behind bh_import_budget auto-calibration
    (api.calibrate_budgets(n_ranks=...)). The per-pair import capacity it
    sizes is _near_let_plan's cap_req (parallel/distributed.py), whose
    runtime auto (bh_import_budget=0) is a FULL neighbor width — always
    overflow-free but O(N)/rank memory; a measured budget restores
    O(halo)/rank on ICs whose essential set is actually local
    (scripts/let_granularity_probe.py: per-pair max 286 of 512 at P=8/1M
    plummer).

    Partition proxy: the sample-sort ranges of the distributed repartition
    are approximated by equal-count contiguous leaf windows of the
    single-chip Hilbert order — the same curve, the same equal-count
    intent, identical up to <leaf_size particles at each rank boundary
    plus the per-rank pad rows. Exactness is neither possible (splitters
    resample every repartition) nor required: the result feeds
    calibrate_budgets' relative+absolute headroom and every clipped import
    is COUNTED into overflow at plan time (_near_let_plan), never silent.

    Returns {"import_max", "n_leaf_loc_proxy", "n_leaves"}.
    """
    leaf_size = cfg.resolve_bh_leaf_size()
    n = pos.shape[0]
    n_leaves, _, n_levels = plan_tree(n, leaf_size, cfg.bh_max_levels)
    refine, cands = resolve_refine(
        cfg.resolve_bh_refine(), (cfg.bh_cand2_budget, cfg.bh_cand_budget),
        n_levels, cfg.resolve_bh_near_budget(), cfg.resolve_bh_far_budget())
    sections = resolve_sections(cfg.bh_sections, n_leaves, refine)

    @jax.jit
    def near_lists(pos, mass):
        _, mass_s, _, tree, _, _ = _prepare(
            pos, mass, leaf_size=leaf_size, curve=cfg.bh_curve,
            multipole_order=cfg.bh_multipole, max_levels=cfg.bh_max_levels)
        plan = bh_plan_lists(
            tree, theta=cfg.theta, near_budget=cfg.resolve_bh_near_budget(),
            far_budget=cfg.resolve_bh_far_budget(), refine=refine,
            cand_budgets=cands, dtype=pos.dtype, sections=sections)
        return plan.near_idx, plan.near_valid

    ni, nv = (np.asarray(a) for a in jax.device_get(near_lists(pos, mass)))
    l_loc = -(-n_leaves // n_ranks)
    owner = np.minimum(np.arange(n_leaves) // l_loc, n_ranks - 1)
    imp_max = 0
    for r in range(n_ranks):
        rows = slice(r * l_loc, min((r + 1) * l_loc, n_leaves))
        ids = np.unique(ni[rows][nv[rows]])
        counts = np.bincount(owner[ids], minlength=n_ranks)
        counts[r] = 0
        imp_max = max(imp_max, int(counts.max()))
    return {"import_max": imp_max, "n_leaf_loc_proxy": l_loc,
            "n_leaves": n_leaves}


def use_pallas_bh() -> bool:
    """Pallas BH kernels are used on TPU (interpret mode is test-only)."""
    try:
        if jax.default_backend() == "tpu":
            import parallelnbody_tpu.ops.pallas_bh  # noqa: F401

            return True
    except ImportError:
        pass
    return False


def make_bh_accel(cfg, mass, overflow_cell=None):
    """accel_fn(pos) -> (acc, pot) with the configured BH parameters.

    overflow_cell: optional one-element list; each evaluation's budget
    overflow counter is ACCUMULATED into it (a closure cell threaded through
    the caller's trace — the same side channel the distributed path uses, so
    multi-eval integrators sum clipping across their intermediate force
    evaluations). Without it the counter is dropped, which violates the
    module contract ("overflow is reported, never silently dropped") for
    any state that only starts clipping mid-run — api.make_step/make_run
    thread it through the step/scan when report_overflow=True.

    The counter is an UPPER BOUND on lost interaction entries, not an exact
    count: staged/octet clipping multiplies clipped candidates by their
    worst-case subtree width (build_interaction_lists_staged). Zero means
    exactly zero clipping; a nonzero value says "raise the budgets" without
    promising the precise number of dropped entries."""
    use_pallas = use_pallas_bh()

    def accel_fn(pos):
        acc, pot, ovf = bh_accel(
            pos, mass,
            leaf_size=cfg.resolve_bh_leaf_size(), theta=cfg.theta, g=cfg.g,
            softening=cfg.softening, near_budget=cfg.resolve_bh_near_budget(),
            far0_budget=cfg.resolve_bh_far_budget(),
            use_pallas=use_pallas, curve=cfg.bh_curve,
            multipole=cfg.bh_multipole, max_levels=cfg.bh_max_levels,
            compute_pot=getattr(cfg, "track_potential", True),
            refine=cfg.resolve_bh_refine(),
            cand_budgets=(cfg.bh_cand2_budget, cfg.bh_cand_budget),
            far_mode=getattr(cfg, "bh_far_mode", "auto"),
            sections=getattr(cfg, "bh_sections", 0),
        )
        if overflow_cell is not None:
            # int32 regardless of x64 mode: the counter rides scan carries
            # whose in/out types must match exactly.
            overflow_cell[0] = overflow_cell[0] + ovf.astype(jnp.int32)
        return acc, pot

    return accel_fn
