"""Pallas TPU kernel for the Barnes-Hut far and near fields.

One kernel family serves every interaction class: for each target leaf, a
gathered chunk of sources (raw particle tiles for the exact near field, or
(CoM, mass) monopoles for accepted tree nodes) is evaluated against the
leaf's particles. Sources are gathered by XLA into contiguous buffers and
streamed through the kernel as regular pipelined blocks — no data-dependent
in-kernel DMAs (those are latency-bound at ~1us per tiny tile; measured
~0.8s for the near field at N=1M before this design).

Layout rules (everything is shaped by TPU tiling):
  * NEVER materialize big (n, 4) or (..., G, 4) arrays — the trailing 4
    pads to 128 lanes (32x memory and bandwidth; a row gather through such
    a layout measured 16 GB/s effective). Big operands are (..., 4, G)
    particle tiles or full-lane (n, 128) node-row tables (row gathers are
    row-count-bound at ~255M rows/s regardless of row width, so the 128-pad
    is free — scripts/gather_rate_probe.py).
  * Per-target list lengths live in SMEM; a fori_loop runs over exactly the
    live 128-entry sub-tiles and the last tile is masked in-kernel, so
    budget padding costs gather bandwidth only, never flops.
  * The near kernel puts targets on sublanes and source particles on lanes;
    the far kernel puts source ENTRIES on sublanes and targets on lanes so
    node components are lane slices and nothing needs transposing. Weighted
    tiles are accumulated wide and reduced once per trip/target — eager
    per-entry lane reductions measured ~17% of the near kernel.

This replaces the reference's per-particle recursive force traversal
(Octree::ComputeForces, OctreeSearch.h:99-108).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gathered_kernel(cnt_ref, tgt_ref, src_ref, out_ref, *, eps2, guard_zero,
                     quad, compute_pot=True):
    """One target leaf (1, 4, G) against its gathered source ROWS
    (1, S_outer, S_in, 128): S_outer sub-tiles of S_in node rows, each row
    [x, y, z, m, Qxx, Qyy, Qxy, Qxz, Qyz, 0...] in the first lanes.
    out: (1, 4, G) = [sum w*dx, sum w*dy, sum w*dz, sum m_j*u].

    Orientation: source ENTRIES on sublanes, TARGETS on lanes — node
    components are (S_in, 1) lane slices of the row tile and the target row
    (1, G) needs no transposes at all. A fori_loop runs over exactly
    ceil(count / S_in) live sub-tiles; entries past `count` inside the last
    tile are masked in-kernel (sublane iota vs count), so no XLA-side
    validity pass over the gathered buffer is needed. Accumulators are kept
    (8, G) sublane-wide across the loop and folded once at the end (the
    round-2 kernel's eager per-chunk lane reductions were measured at ~60%
    of a small chunk's cost in the flat-kernel probes)."""
    t = pl.program_id(0)
    count = cnt_ref[t % 8, 0]
    s_outer, s_in = src_ref.shape[1], src_ref.shape[2]

    tgt = tgt_ref[0]                      # (4, G)
    xi = tgt[0:1, :]                      # (1, G)
    yi = tgt[1:2, :]
    zi = tgt[2:3, :]
    g_t = xi.shape[1]
    z8 = jnp.zeros((8, g_t), xi.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (s_in, 1), 0)

    def fold8(a):                          # (S_in, G) -> (8, G)
        return jnp.sum(a.reshape(s_in // 8, 8, g_t), axis=0)

    def body(j, carry):
        ax, ay, az, sp = carry
        src = src_ref[0, j]               # (S_in, 128), dynamic sub-tile read
        xj = src[:, 0:1]                  # (S_in, 1)
        yj = src[:, 1:2]
        zj = src[:, 2:3]
        mj = src[:, 3:4]

        dx = xj - xi                      # (S_in, G)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0.0, u, 0.0)
        # Mask entries past this target's count (and therefore also the
        # gathered idx-0 rows behind them) by zeroing u: every term below
        # scales with u, including the quadrupole ones.
        u = u * (iota < (count - j * s_in)).astype(u.dtype)
        mu = mj * u
        u2 = u * u
        w = mu * u2
        cax = w * dx
        cay = w * dy
        caz = w * dz
        csp = mu
        if quad:
            # Traceless quadrupole: a += -G(Q dx)/r^5 + (5G/2)(dx'Q dx) dx/r^7,
            # phi += -(G/2)(dx'Q dx)/r^5 (dx = com - x).
            qxx = src[:, 4:5]
            qyy = src[:, 5:6]
            qxy = src[:, 6:7]
            qxz = src[:, 7:8]
            qyz = src[:, 8:9]
            qzz = -(qxx + qyy)
            qdx = qxx * dx + qxy * dy + qxz * dz
            qdy = qxy * dx + qyy * dy + qyz * dz
            qdz = qxz * dx + qyz * dy + qzz * dz
            qq = qdx * dx + qdy * dy + qdz * dz
            u4 = u2 * u2
            u5 = u4 * u
            c1 = (2.5 * qq) * (u5 * u2)
            cax = cax + c1 * dx - u5 * qdx
            cay = cay + c1 * dy - u5 * qdy
            caz = caz + c1 * dz - u5 * qdz
            csp = csp + (0.5 * qq) * u5
        ax = ax + fold8(cax)
        ay = ay + fold8(cay)
        az = az + fold8(caz)
        if compute_pot:
            sp = sp + fold8(csp)
        return ax, ay, az, sp

    n_live = jnp.minimum((count + s_in - 1) // s_in, s_outer)
    ax, ay, az, sp = jax.lax.fori_loop(0, n_live, body, (z8, z8, z8, z8))
    out_ref[0] = jnp.concatenate(
        [jnp.sum(ax, axis=0, keepdims=True),
         jnp.sum(ay, axis=0, keepdims=True),
         jnp.sum(az, axis=0, keepdims=True),
         jnp.sum(sp, axis=0, keepdims=True)], axis=0)


def _gathered_call(tgt_t, src, cnt, *, eps2, guard_zero, quad, interpret,
                   compute_pot=True):
    """tgt_t: (L, 4, G); src: (L, S_outer, S_in, 128) node rows; cnt: (L, 1)
    int32 -> (L, 4, G) sums over each target's count live entries."""
    n_slice, _, leaf_size = tgt_t.shape
    s_outer, s_in = src.shape[1], src.shape[2]
    return pl.pallas_call(
        functools.partial(_gathered_kernel, eps2=eps2, guard_zero=guard_zero,
                          quad=quad, compute_pot=compute_pot),
        out_shape=jax.ShapeDtypeStruct((n_slice, 4, leaf_size), tgt_t.dtype),
        grid=(n_slice,),
        in_specs=[
            pl.BlockSpec((8, 1), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, leaf_size), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_outer, s_in, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, leaf_size), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=15 * n_slice * s_outer * s_in * leaf_size,
            bytes_accessed=n_slice * s_outer * s_in * 512,
            transcendentals=n_slice * s_outer * s_in * leaf_size,
        ),
        interpret=interpret,
    )(cnt, tgt_t, src)


def _to_tgt_t(tgt_leaves):
    """(L, G, 3) -> (L, 4, G) with a zero mass row."""
    n_slice, leaf_size, _ = tgt_leaves.shape
    dtype = tgt_leaves.dtype
    t4 = jnp.concatenate(
        [tgt_leaves, jnp.zeros((n_slice, leaf_size, 1), dtype)], axis=-1)
    return jnp.swapaxes(t4, 1, 2)


def _unpack(out_t, g):
    """(L, 4, G) raw sums -> (L*G, 3) acc, (L*G,) pot."""
    n_slice, _, leaf_size = out_t.shape
    out = jnp.swapaxes(out_t, 1, 2).reshape(n_slice * leaf_size, 4)
    return g * out[:, :3], -g * out[:, 3]


def _near_table_kernel(bnd_ref, idx_ref, tgt_ref, table_ref, out_ref, *,
                       eps2, guard_zero, base, compute_pot=True):
    """One target leaf (1, 4, G) against its [lo, hi) slice of the near list,
    reading source tiles (4, G) straight out of the VMEM-resident table
    segment by dynamic index. No HBM gather, no budget quantization: the
    fori_loop runs exactly hi-lo iterations."""
    t = pl.program_id(0)
    lo = bnd_ref[t % 8, 0]
    hi = bnd_ref[t % 8, 1]
    tgt = tgt_ref[0]                      # (4, G)
    xi = jnp.transpose(tgt[0:1, :])       # (G, 1)
    yi = jnp.transpose(tgt[1:2, :])
    zi = jnp.transpose(tgt[2:3, :])
    zeros = jnp.zeros((xi.shape[0], 1), xi.dtype)
    # Unrolled entries' (G, G) temporaries live on the VMEM stack (~1 MB per
    # accumulated component at G=512): unroll 8 fits comfortably at G<=256
    # (measured best) but blows the 16 MB scoped-vmem limit at G=512
    # (26.3 M at N=4M); unroll 4 fits there (N=4M measured 1473 ms/step vs
    # 1516 at unroll 2, at the price of a longer compile) — EXCEPT with the
    # potential accumulator on, whose extra (G, G) tile per entry pushes the
    # stack to 18.6 M (the default-config budget audit at N>=4M OOM'd in
    # compile); unroll 2 fits that case. The VMEM-resident table segment
    # shares the same scoped budget: with the 8 MB segments used for big
    # tables, G=256 + potential + unroll 8 is 17.3 M — drop to 4 there too.
    g_rows = xi.shape[0]
    seg_bytes = table_ref.shape[0] * 4 * table_ref.shape[2] * 4
    if g_rows <= 256:
        unroll = 4 if (compute_pot and seg_bytes > (4 << 20)) else 8
    else:
        unroll = 4 if not compute_pot else 2

    def one(k):
        """One list entry's weighted (G, G) tile contributions. k past hi is
        masked via zeroed mass (clamped read keeps the index in range)."""
        kk = jnp.minimum(k, hi - 1)
        src = table_ref[idx_ref[t % 8, kk] - base]  # (4, G) dynamic VMEM read
        xj = src[0:1, :]
        yj = src[1:2, :]
        zj = src[2:3, :]
        mj = src[3:4, :] * (k < hi).astype(src.dtype)
        dx = xj - xi                            # (G, G)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0.0, u, 0.0)
        mu = mj * u
        w = mu * (u * u)
        return w * dx, w * dy, w * dz, mu

    def body(c, carry):
        # `unroll` independent entries per trip: amortizes the scalar
        # bookkeeping and lets the dependent dynamic loads overlap the
        # previous entries' vector work (measured 1.6x on v5e vs unroll=1).
        # The weighted tiles are SUMMED WIDE across the trip and lane-reduced
        # once — per-entry reductions were ~17% of the kernel (4 reductions
        # x 7 shuffle steps over a 2-lane-tile row, measured round 3).
        ax, ay, az, sp = carry
        k0 = lo + c * unroll
        cax, cay, caz, csp = one(k0)
        for u in range(1, unroll):
            tx, ty, tz, tp = one(k0 + u)
            cax = cax + tx
            cay = cay + ty
            caz = caz + tz
            if compute_pot:
                csp = csp + tp
        ax = ax + jnp.sum(cax, axis=1, keepdims=True)
        ay = ay + jnp.sum(cay, axis=1, keepdims=True)
        az = az + jnp.sum(caz, axis=1, keepdims=True)
        if compute_pot:
            sp = sp + jnp.sum(csp, axis=1, keepdims=True)
        return ax, ay, az, sp

    n_trips = (hi - lo + unroll - 1) // unroll
    ax, ay, az, sp = jax.lax.fori_loop(0, n_trips, body,
                                       (zeros, zeros, zeros, zeros))
    out_ref[0] = jnp.concatenate(
        [jnp.transpose(ax), jnp.transpose(ay),
         jnp.transpose(az), jnp.transpose(sp)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "g", "softening", "guard_zero", "interpret",
                     "compute_pot", "seg_bytes"),
)
def near_field_pallas(pos_s, mass_s, tgt_leaves, idx, valid, leaf_size, g,
                      softening, guard_zero, interpret=False,
                      compute_pot=True, seg_bytes=0, leaf_lo=None,
                      src_t4=None):
    """Exact near field: targets (Ls, G, 3) against per-target lists of
    source leaves idx/valid (Ls, B) over the global sorted particles.

    The source table (n_leaves, 4, G) is kept RESIDENT IN VMEM, split into
    segments that fit the ~16 MB budget (4 MB each). The per-target lists are
    front-packed ascending (ops/bh.py _row_compact), so each target's entries
    for segment s form a contiguous [lo, hi) range, computed here with plain
    reductions; the kernel loops exactly over that range. This replaced a
    budget-wide XLA gather (n_leaves * budget * 4KB = 8.6 GB at N=1M,
    budget 512) plus 32-entry compute quantization: measured 376 ms -> see
    DESIGN.md (the round-1 design's gather+quantization waste was ~60% of its
    runtime). Round-1's rejected alternative — per-entry in-kernel DMAs from
    HBM — stays rejected: those are latency-bound at ~1 us/tile.

    leaf_lo (traced scalar, default 0): pos_s/mass_s hold only the SHARD of
    the globally sorted particles whose leaves span
    [leaf_lo, leaf_lo + n_shard_leaves) — idx keeps GLOBAL leaf ids and
    entries outside the window are skipped by the same [lo, hi) position
    bounds (ascending lists make every window a contiguous run). This is the
    multi-chip ring-pass building block (parallel/distributed.py): each
    ppermute pass evaluates the visiting shard's window.

    src_t4: optional pre-built (n_leaves, 4, G) source table — pos_s/mass_s
    are then ignored (pass None). Used by the LET near field
    (parallel/distributed.py _near_let), which assembles the table from
    imported leaf tiles and must not round-trip through lane-padded (n, 3)
    particle arrays. Entries whose idx falls beyond the table are skipped
    by the same ascending [lo, hi) bounds (LET overflow handling)."""
    budget = idx.shape[1]
    n_slice = tgt_leaves.shape[0]
    leaf_lo = jnp.asarray(0 if leaf_lo is None else leaf_lo, jnp.int32)

    if src_t4 is not None:
        p_t4 = src_t4
        n_leaves = src_t4.shape[0]
        dtype = src_t4.dtype
    else:
        dtype = pos_s.dtype
        n_leaves = pos_s.shape[0] // leaf_size
        # Source table: (n_leaves, 4, G) rows, 2x lane padding at worst.
        p4 = jnp.concatenate([pos_s, mass_s[:, None]], axis=1)
        p_t4 = jnp.swapaxes(p4.reshape(n_leaves, leaf_size, 4), 1, 2)

    # Segment size: ~seg_bytes of VMEM per table segment (tests shrink it to
    # force the multi-segment path at small N). seg_bytes=0 = auto: 4 MB
    # (measured best at N=1M, 4 segments) until the table is large enough
    # that the per-segment overhead dominates — each segment call pays the
    # full n_slice grid of per-target fixed costs even for targets whose
    # [lo, hi) window in that segment is empty, so at N=8M (134 MB table)
    # 8 MB segments measured 1245 ms vs 1565 at 4 MB. 8 MB + the unroll-8
    # (G, G) stack still fits the 16 MB scoped-vmem limit at G <= 256
    # (12 MB segments do NOT: 19.07 M, compile OOM).
    bytes_per_row = 4 * max(leaf_size, 128) * 4
    if seg_bytes <= 0:
        # G > 256 keeps 4 MB: the unroll-4 stack at G=512 already runs
        # ~11-15 MB, so an 8 MB segment would blow the scoped limit there.
        big = n_leaves * bytes_per_row > (32 << 20) and leaf_size <= 256
        seg_bytes = (8 << 20) if big else (4 << 20)
    rows_per_seg = min(n_leaves, max(8, seg_bytes // bytes_per_row))
    n_seg = -(-n_leaves // rows_per_seg)
    if n_seg * rows_per_seg > n_leaves:
        pad = n_seg * rows_per_seg - n_leaves
        p_t4 = jnp.concatenate(
            [p_t4, jnp.zeros((pad, 4, leaf_size), dtype)], axis=0)

    # Per-target segment boundaries over the ascending front-packed lists:
    # bnd[:, s] = #list positions with leaf id < leaf_lo + s * rows_per_seg.
    bnds = [jnp.sum(valid & (idx < leaf_lo + s * rows_per_seg), axis=1,
                    dtype=jnp.int32) for s in range(n_seg + 1)]
    bnd = jnp.stack(bnds, axis=1)                     # (Ls, n_seg + 1)

    tgt_t = _to_tgt_t(tgt_leaves)
    eps2 = float(softening) ** 2
    # Kernel reads shard-relative ids; positions outside the window bounds
    # are never read, so out-of-window values (negative / huge) are inert.
    idx = idx.astype(jnp.int32) - leaf_lo

    out = jnp.zeros_like(tgt_t)
    for s in range(n_seg):
        table = jax.lax.slice_in_dim(p_t4, s * rows_per_seg,
                                     (s + 1) * rows_per_seg, axis=0)
        pair = jax.lax.slice_in_dim(bnd, s, s + 2, axis=1)   # (Ls, 2)
        out = out + pl.pallas_call(
            functools.partial(_near_table_kernel, eps2=eps2,
                              guard_zero=guard_zero, base=s * rows_per_seg,
                              compute_pot=compute_pot),
            out_shape=jax.ShapeDtypeStruct((n_slice, 4, leaf_size), dtype),
            grid=(n_slice,),
            in_specs=[
                pl.BlockSpec((8, 2), lambda t: (t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, budget), lambda t: (t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, leaf_size), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_per_seg, 4, leaf_size),
                             lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 4, leaf_size), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=15 * n_slice * (budget // n_seg + 1) * leaf_size ** 2,
                bytes_accessed=rows_per_seg * 4 * leaf_size * 4
                + n_slice * leaf_size * 32,
                transcendentals=n_slice * (budget // n_seg + 1) * leaf_size ** 2,
            ),
            interpret=interpret,
        )(pair, idx, tgt_t, table)
    return _unpack(out, g)


def _far_octet_kernel(bnd_ref, key_ref, tgt_ref, table_ref, out_ref, *,
                      eps2, guard_zero, quad, base, compute_pot=True):
    """One target leaf (1, 4, G) against its [lo, hi) slice of the
    octet-masked far list, reading each entry's (8, 128) sibling tile
    straight out of the VMEM-resident node table segment by dynamic index.
    An entry key is (octet_id << 8) | child_mask: the 8 sibling node rows
    [x, y, z, m, Qxx, Qyy, Qxy, Qxz, Qyz, 0...] are evaluated together
    with mask bits zeroing the non-accepted children via u (every
    acceleration/potential term scales with u). No HBM gather, no 128-entry
    count quantization: the fori_loop covers exactly the live entries at an
    8-node granule.

    Orientation matches _gathered_kernel: source nodes on sublanes, targets
    on lanes; accumulators stay (8, G) sublane-wide across the whole loop
    and fold once at the end. The (8, G) temporaries are tiny (4 KB at
    G=128), so the entry loop is unrolled deeper than the near kernel's —
    per-entry vector work is only ~8 x G and the scalar bookkeeping (SMEM
    read, shift/mask, clamped index) would otherwise stall the pipe."""
    t = pl.program_id(0)
    lo = bnd_ref[t % 8, 0]
    hi = bnd_ref[t % 8, 1]
    tgt = tgt_ref[0]                      # (4, G)
    xi = tgt[0:1, :]                      # (1, G)
    yi = tgt[1:2, :]
    zi = tgt[2:3, :]
    g_t = xi.shape[1]
    z8 = jnp.zeros((8, g_t), xi.dtype)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    unroll = 8

    def one(k):
        """One octet entry's masked (8, G) contributions; k past hi is
        inert via the mask (clamped read keeps the index in range)."""
        kk = jnp.minimum(k, hi - 1)
        key = key_ref[t % 8, kk]
        src = table_ref[(key >> 8) - base]          # (8, 128) sibling tile
        mb = ((key >> iota8) & 1) * (k < hi).astype(jnp.int32)
        xj = src[:, 0:1]                  # (8, 1)
        yj = src[:, 1:2]
        zj = src[:, 2:3]
        mj = src[:, 3:4]
        dx = xj - xi                      # (8, G)
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0.0, u, 0.0)
        u = u * mb.astype(u.dtype)        # child mask: every term scales w/ u
        mu = mj * u
        u2 = u * u
        w = mu * u2
        cax = w * dx
        cay = w * dy
        caz = w * dz
        csp = mu
        if quad:
            qxx = src[:, 4:5]
            qyy = src[:, 5:6]
            qxy = src[:, 6:7]
            qxz = src[:, 7:8]
            qyz = src[:, 8:9]
            qzz = -(qxx + qyy)
            qdx = qxx * dx + qxy * dy + qxz * dz
            qdy = qxy * dx + qyy * dy + qyz * dz
            qdz = qxz * dx + qyz * dy + qzz * dz
            qq = qdx * dx + qdy * dy + qdz * dz
            u4 = u2 * u2
            u5 = u4 * u
            c1 = (2.5 * qq) * (u5 * u2)
            cax = cax + c1 * dx - u5 * qdx
            cay = cay + c1 * dy - u5 * qdy
            caz = caz + c1 * dz - u5 * qdz
            csp = csp + (0.5 * qq) * u5
        return cax, cay, caz, csp

    def body(c, carry):
        ax, ay, az, sp = carry
        k0 = lo + c * unroll
        cax, cay, caz, csp = one(k0)
        for u in range(1, unroll):
            tx, ty, tz, tp = one(k0 + u)
            cax = cax + tx
            cay = cay + ty
            caz = caz + tz
            if compute_pot:
                csp = csp + tp
        ax = ax + cax
        ay = ay + cay
        az = az + caz
        if compute_pot:
            sp = sp + csp
        return ax, ay, az, sp

    n_trips = (hi - lo + unroll - 1) // unroll
    ax, ay, az, sp = jax.lax.fori_loop(0, n_trips, body, (z8, z8, z8, z8))
    out_ref[0] = jnp.concatenate(
        [jnp.sum(ax, axis=0, keepdims=True),
         jnp.sum(ay, axis=0, keepdims=True),
         jnp.sum(az, axis=0, keepdims=True),
         jnp.sum(sp, axis=0, keepdims=True)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("g", "softening", "guard_zero", "interpret",
                     "compute_pot", "seg_bytes"),
)
def far_octet_pallas(tgt_leaves, nodes8, keys, valid, g, softening,
                     guard_zero, interpret=False, compute_pot=True,
                     seg_bytes=0):
    """Octet-masked multipole far field: targets (Ls, G, 3) against
    per-target lists of (octet_id << 8) | child_mask keys over the
    8-row-aligned combined node table nodes8 (ops/bh.py _nodes_all_octet) —
    (n8, 4) monopole or (n8, 9) quadrupole rows, n8 % 8 == 0.

    The table is kept RESIDENT IN VMEM as (n8/8, 8, 128) sibling tiles,
    split into segments that fit the ~16 MB budget; the per-target lists
    are front-packed ascending in octet id (ops/bh.py _keys_compact on the
    high-bits-octet keys), so each target's entries for a segment form a
    contiguous [lo, hi) range. This replaces the gathered-chunk far path's
    budget-wide HBM row gather (the dominant far cost at scale: 1467 of
    3005 ms at N=8M round 4) with zero gather bytes, and drops the count
    quantization from 128 rows to one 8-node entry.

    Returns (acc, pot) flat over the window's particles."""
    budget = keys.shape[1]
    dtype = tgt_leaves.dtype
    n_slice, leaf_size, _ = tgt_leaves.shape
    n_comp = nodes8.shape[1]
    n8 = nodes8.shape[0]
    assert n8 % 8 == 0, n8
    n_oct = n8 // 8

    tab = jnp.zeros((n8, 128), dtype).at[:, :n_comp].set(nodes8)
    tab = tab.reshape(n_oct, 8, 128)

    # Segments: 4 MB of VMEM each (1024 octets) — the whole combined table
    # is ~4.6 MB per 8192 leaves, so most configs run 1-2 segments. Big
    # tables (N=8M leaf 256: ~18 MB) follow the near kernel's measured
    # rule: 8 MB segments once the table exceeds 32 MB... but unlike the
    # near kernel the (8, G) stack here is tiny, so 8 MB segments are safe
    # at any G and we switch earlier (> 8 MB).
    bytes_per_oct = 8 * 128 * 4
    if seg_bytes <= 0:
        seg_bytes = (8 << 20) if n_oct * bytes_per_oct > (8 << 20) \
            else (4 << 20)
    oct_per_seg = min(n_oct, max(8, seg_bytes // bytes_per_oct))
    n_seg = -(-n_oct // oct_per_seg)
    if n_seg * oct_per_seg > n_oct:
        pad = n_seg * oct_per_seg - n_oct
        tab = jnp.concatenate([tab, jnp.zeros((pad, 8, 128), dtype)], axis=0)

    # Per-target segment boundaries over the ascending front-packed keys:
    # bnd[:, s] = #entries with octet id < s * oct_per_seg.
    bnds = [jnp.sum(valid & (keys < ((s * oct_per_seg) << 8)), axis=1,
                    dtype=jnp.int32) for s in range(n_seg + 1)]
    bnd = jnp.stack(bnds, axis=1)                     # (Ls, n_seg + 1)

    tgt_t = _to_tgt_t(tgt_leaves)
    eps2 = float(softening) ** 2
    keys = jnp.where(valid, keys, 0).astype(jnp.int32)

    out = jnp.zeros_like(tgt_t)
    for s in range(n_seg):
        table = jax.lax.slice_in_dim(tab, s * oct_per_seg,
                                     (s + 1) * oct_per_seg, axis=0)
        pair = jax.lax.slice_in_dim(bnd, s, s + 2, axis=1)   # (Ls, 2)
        out = out + pl.pallas_call(
            functools.partial(_far_octet_kernel, eps2=eps2,
                              guard_zero=guard_zero, quad=n_comp >= 9,
                              base=s * oct_per_seg, compute_pot=compute_pot),
            out_shape=jax.ShapeDtypeStruct((n_slice, 4, leaf_size), dtype),
            grid=(n_slice,),
            in_specs=[
                pl.BlockSpec((8, 2), lambda t: (t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, budget), lambda t: (t // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, leaf_size), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((oct_per_seg, 8, 128),
                             lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 4, leaf_size), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=30 * n_slice * (budget // n_seg + 1) * 8 * leaf_size,
                bytes_accessed=oct_per_seg * bytes_per_oct
                + n_slice * leaf_size * 32,
                transcendentals=n_slice * (budget // n_seg + 1) * 8
                * leaf_size,
            ),
            interpret=interpret,
        )(pair, keys, tgt_t, table)
    return _unpack(out, g)


_FAR_S_IN = 128  # sub-tile height: count skipping quantum inside the kernel


_FAR_GATHER_BYTES = 2 << 30  # cap on one gathered (rows x budget x 512B) buffer


def _far_eval(tgt_t, tab, idx, valid, cnt, *, eps2, guard_zero, quad,
              interpret, compute_pot, scattered_valid=False):
    """Gather + evaluate one row bin. tgt_t: (L, 4, G); tab: (n, 128) node
    rows; idx/valid: (L, B); cnt: (L,) live-entry counts (<= B).

    The gather reads full-lane (n, 128) rows — row-count-bound at ~255M
    rows/s on v5e (scripts/gather_rate_probe.py); a (n, 9) or (n, 16) table
    would pad its minor dim to 128 in the HBM layout anyway, costing the
    same bytes, and a (9, n) lane-gather + transpose measured 1.35x slower
    with a 137 s XLA compile. Front-packed invalidity is masked in-kernel
    by count; scattered_valid=True zeroes whole rows here instead (safe:
    every acceleration term scales with m or Q, which live in the row).

    Evaluation is chunked over target rows so the 512 B/entry gathered
    buffer stays under _FAR_GATHER_BYTES (at N=4M / 8192 leaves a single
    full-width buffer is ~6.4 GB and the remote compile falls over).

    The sub-tile height shrinks for wide target tiles: the kernel's
    (s_in, G) temporaries are ~1 MB each at G=2048 (block-granularity
    targets) and the scoped-vmem stack overflows at s_in=128 — cap
    s_in * G at 128 * 512."""
    n_slice, budget = idx.shape
    g_lanes = tgt_t.shape[2]
    s_in = max(8, min(_FAR_S_IN, (_FAR_S_IN * 512) // max(g_lanes, 128)))
    pad = (-budget) % s_in
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((n_slice, pad), idx.dtype)], axis=1)
        valid = jnp.concatenate(
            [valid, jnp.zeros((n_slice, pad), bool)], axis=1)
        budget += pad
    s_outer = budget // s_in

    row_block = max(8, min(n_slice, _FAR_GATHER_BYTES // (budget * 512)))
    outs = []
    for r0 in range(0, n_slice, row_block):
        rows = slice(r0, min(r0 + row_block, n_slice))
        n_rows = rows.stop - rows.start
        src = tab[idx[rows]]                              # (R, B, 128)
        if scattered_valid:
            src = src * valid[rows][..., None].astype(src.dtype)
        src = src.reshape(n_rows, s_outer, s_in, 128)
        outs.append(_gathered_call(
            tgt_t[rows], src, cnt[rows][:, None].astype(jnp.int32),
            eps2=eps2, guard_zero=guard_zero, quad=quad,
            interpret=interpret, compute_pot=compute_pot))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("g", "softening", "guard_zero", "interpret",
                     "front_packed", "compute_pot"),
)
def far_field_pallas(tgt_leaves, nodes, idx, valid, g, softening, guard_zero,
                     interpret=False, front_packed=True, compute_pot=True):
    """Multipole far field: targets (Ls, G, 3) against per-target lists of
    accepted nodes idx/valid (Ls, B) over the global node table — (n, 4)
    [com, mass] monopole or (n, 9) [com, mass, Qxx, Qyy, Qxy, Qxz, Qyz]
    quadrupole (any mix of tree levels — the lists encode the structure, so
    upper-level and leaf-level nodes share one kernel).

    Returns (acc, pot, overflow); overflow is always 0 (kept for call-site
    symmetry — this kernel never clips; a count-sorted two-bin variant
    existed for the retired block refine and was removed with it,
    docs/DESIGN.md r4).

    front_packed=False: `valid` is a raw scattered mask — count skipping
    would drop valid entries past the count, so every sub-tile is evaluated
    (invalid entries contribute nothing via zeroed moments)."""
    dtype = tgt_leaves.dtype
    n_slice = tgt_leaves.shape[0]
    budget = idx.shape[1]
    n_comp = nodes.shape[1]
    # Full-lane row table: [x, y, z, m (, Qxx, Qyy, Qxy, Qxz, Qyz)] + zeros.
    tab = jnp.zeros((nodes.shape[0], 128), dtype).at[:, :n_comp].set(nodes)
    tgt_t = _to_tgt_t(tgt_leaves)
    if front_packed:
        cnt = jnp.sum(valid.astype(jnp.int32), axis=1)
    else:
        cnt = jnp.full((n_slice,), budget, jnp.int32)
    eps2 = float(softening) ** 2
    kw = dict(eps2=eps2, guard_zero=guard_zero, quad=n_comp >= 9,
              interpret=interpret, compute_pot=compute_pot,
              scattered_valid=not front_packed)
    out = _far_eval(tgt_t, tab, idx, valid, cnt, **kw)
    acc, pot = _unpack(out, g)
    return acc, pot, jnp.zeros((), jnp.int32)
