"""Morton (Z-order) encoding — the vectorized generalization of the
reference's octant bit trick.

The reference picks one octant per tree level by comparing a point against the
node origin per axis and packing sign bits (X->bit2, Y->bit1, Z->bit0,
OctreeSearch.h:50-56). A Morton key is exactly that decision made for *all*
levels at once: quantize each coordinate to `bits` levels and interleave the
bits, so the key's 3-bit groups are the reference's octant indices from root
to leaf, and sorting by key linearizes the whole octree (SURVEY.md §7 stage 5).

Keys are 3*bits <= 30 bits in int32 (TPU-friendly; no uint64 required).
"""

from __future__ import annotations

import jax.numpy as jnp

MORTON_BITS = 10  # 10 bits/axis -> 30-bit keys, tree depth 10


def _spread_bits_3(v):
    """Insert two zero bits between each of the low 10 bits of v (int32)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_encode(pos, center, half_extent, bits: int = MORTON_BITS):
    """Morton keys for (N, 3) positions inside the cube
    [center - half_extent, center + half_extent]^3. Points outside are clamped
    (the reference tolerates out-of-box particles the same way — its GetOctant
    never bounds-checks, SURVEY.md C10 note).

    Axis bit order matches the reference octant convention: X is the most
    significant bit of each 3-bit group (OctreeSearch.h:52-54).
    """
    n_cells = 1 << bits
    scale = n_cells / (2.0 * half_extent)
    q = jnp.floor((pos - (center - half_extent)) * scale).astype(jnp.int32)
    q = jnp.clip(q, 0, n_cells - 1)
    ex = _spread_bits_3(q[:, 0])
    ey = _spread_bits_3(q[:, 1])
    ez = _spread_bits_3(q[:, 2])
    return (ex << 2) | (ey << 1) | ez


def morton_decode(key, bits: int = MORTON_BITS):
    """Inverse of the bit interleave: (N,) keys -> (N, 3) integer cells."""
    def compact(v):
        v = v & 0x09249249
        v = (v | (v >> 2)) & 0x030C30C3
        v = (v | (v >> 4)) & 0x0300F00F
        v = (v | (v >> 8)) & 0x030000FF
        v = (v | (v >> 16)) & 0x3FF
        return v

    return jnp.stack(
        [compact(key >> 2), compact(key >> 1), compact(key)], axis=-1
    )
