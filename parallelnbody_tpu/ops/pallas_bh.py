"""Pallas TPU kernels for the Barnes-Hut far and near fields.

Far field: all tree levels' nodes are concatenated into one (n_nodes, 4)
monopole list, and a single VMEM-tiled kernel evaluates every particle
against every node weighted by the (leaf, node) acceptance mask from the
traversal — the level structure only matters for building the mask, not for
evaluating it. Grid = (leaf, node-tile); the leaf's particle block and its
accumulator stay resident in VMEM across the node sweep.

Near field: one grid step per target leaf. The per-leaf source list (from
ops.bh.near_lists) arrives as SMEM blocks; the kernel manually
double-buffers DMA of each source leaf's (4, G) column slice from HBM into
VMEM while computing the previous G x G exact tile — the Pallas analogue of
the CUDA shared-memory staging loop the reference README describes
(README.md:16-22), with data-dependent source indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODE_TILE = 512


# ------------------------------------------------------------------ far field
def _far_kernel(pi_ref, nt_ref, mask_ref, out_ref, *, eps2):
    # mask_ref is an 8-row block (TPU sublane granularity); select this
    # leaf's row dynamically.
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pi_ref[:, 0:1]
    yi = pi_ref[:, 1:2]
    zi = pi_ref[:, 2:3]
    xj = nt_ref[0:1, :]
    yj = nt_ref[1:2, :]
    zj = nt_ref[2:3, :]
    mj = nt_ref[3:4, :] * mask_ref[pl.ds(t % 8, 1), :]  # masked node mass

    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2
    u = jax.lax.rsqrt(r2)
    mu = mj * u
    w = mu * (u * u)
    out_ref[:] += jnp.concatenate(
        [
            jnp.sum(w * dx, axis=1, keepdims=True),
            jnp.sum(w * dy, axis=1, keepdims=True),
            jnp.sum(w * dz, axis=1, keepdims=True),
            jnp.sum(mu, axis=1, keepdims=True),
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("leaf_size", "g", "softening", "interpret"))
def far_field_pallas(pos_s, nodes, mask, leaf_size, g, softening, interpret=False):
    """pos_s: (Npad, 3) sorted; nodes: (n_nodes, 4) [com, mass]; mask:
    (n_leaves, n_nodes) float32. Returns (acc (Npad,3), pot (Npad,))."""
    n_pad = pos_s.shape[0]
    n_leaves = n_pad // leaf_size
    n_nodes = nodes.shape[0]
    dtype = pos_s.dtype

    tile_j = min(NODE_TILE, n_nodes)
    pad_j = (-n_nodes) % tile_j
    if pad_j:
        nodes = jnp.pad(nodes, ((0, pad_j), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_j)))
    n_nodes_p = n_nodes + pad_j
    if n_leaves % 8:
        raise ValueError(f"n_leaves must be a multiple of 8, got {n_leaves}")

    pi = jnp.concatenate([pos_s, jnp.zeros((n_pad, 1), dtype)], axis=1)
    out = pl.pallas_call(
        functools.partial(_far_kernel, eps2=float(softening) ** 2),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), dtype),
        grid=(n_leaves, n_nodes_p // tile_j),
        in_specs=[
            pl.BlockSpec((leaf_size, 4), lambda t, j: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_j), lambda t, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda t, j: (t // 8, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((leaf_size, 4), lambda t, j: (t, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=15 * n_pad * n_nodes_p,
            bytes_accessed=n_pad * 16 + n_leaves * n_nodes_p * 20,
            transcendentals=n_pad * n_nodes_p,
        ),
        interpret=interpret,
    )(pi, nodes.T, mask)
    return g * out[:, :3], -g * out[:, 3]


# ----------------------------------------------------------------- near field
def _near_kernel(tgt_ref, idx_ref, cnt_ref, pt_hbm, out_ref, src_buf, sem,
                 *, eps2, guard_zero, leaf_size):
    """One grid step per target leaf. idx_ref: (8, B) SMEM block of source
    leaf ids for leaves (t//8)*8..(t//8)*8+7; cnt_ref: (8, 1) SMEM block with
    the list lengths. Loops over exactly count sources with double-buffered
    DMA of each source leaf's (4, G) slice from HBM."""
    row = pl.program_id(0) % 8
    count = cnt_ref[row, 0]

    def get_dma(slot, k):
        src_leaf = idx_ref[row, k]
        return pltpu.make_async_copy(
            pt_hbm.at[:, pl.ds(src_leaf * leaf_size, leaf_size)],
            src_buf.at[slot],
            sem.at[slot],
        )

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    xi = tgt_ref[:, 0:1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]

    def body(k, acc):
        slot = k % 2

        @pl.when(k + 1 < count)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        src = src_buf[slot]  # (4, G)
        xj = src[0:1, :]
        yj = src[1:2, :]
        zj = src[2:3, :]
        mj = src[3:4, :]

        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0.0, u, 0.0)
        mu = mj * u
        w = mu * (u * u)
        return acc + jnp.concatenate(
            [
                jnp.sum(w * dx, axis=1, keepdims=True),
                jnp.sum(w * dy, axis=1, keepdims=True),
                jnp.sum(w * dz, axis=1, keepdims=True),
                jnp.sum(mu, axis=1, keepdims=True),
            ],
            axis=1,
        )

    acc0 = jnp.zeros_like(out_ref)
    out_ref[:] = jax.lax.fori_loop(0, count, body, acc0)


@functools.partial(
    jax.jit,
    static_argnames=("leaf_size", "g", "softening", "guard_zero", "interpret"),
)
def near_field_pallas(pos_s, mass_s, tgt_leaves, idx, valid, leaf_size, g,
                      softening, guard_zero, interpret=False):
    """Exact leaf-leaf interactions via per-target-leaf gathered source lists.

    pos_s/mass_s: (Npad, 3)/(Npad,) curve-sorted GLOBAL sources;
    tgt_leaves: (Ls, G, 3) target-leaf slice (Ls <= n_leaves, multi-chip
    target partition); idx/valid: (Ls, B) from ops.bh.near_lists (valid
    entries are front-packed, so only the first count_t entries are looped —
    padding costs nothing). Returns (acc (Ls*G, 3), pot (Ls*G,))."""
    n_slice = tgt_leaves.shape[0]
    n_out = n_slice * leaf_size
    budget = idx.shape[1]
    dtype = pos_s.dtype
    p4 = jnp.concatenate([pos_s, mass_s[:, None]], axis=1)
    pt4 = p4.T  # (4, Npad) — source-side layout for lane broadcasting
    tgt4 = jnp.concatenate(
        [tgt_leaves.reshape(n_out, 3), jnp.zeros((n_out, 1), dtype)], axis=1)

    idx_p = idx.astype(jnp.int32)
    cnt = jnp.sum(valid.astype(jnp.int32), axis=1)[:, None]

    out = pl.pallas_call(
        functools.partial(_near_kernel, eps2=float(softening) ** 2,
                          guard_zero=guard_zero, leaf_size=leaf_size),
        out_shape=jax.ShapeDtypeStruct((n_out, 4), dtype),
        grid=(n_slice,),
        in_specs=[
            pl.BlockSpec((leaf_size, 4), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, budget), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # pt4 stays in HBM
        ],
        out_specs=pl.BlockSpec((leaf_size, 4), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, leaf_size), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=15 * n_out * budget * leaf_size,
            bytes_accessed=n_out * 16 * (1 + budget),
            transcendentals=n_out * budget * leaf_size,
        ),
        interpret=interpret,
    )(tgt4, idx_p, cnt, pt4)
    return g * out[:, :3], -g * out[:, 3]
