"""Hilbert-curve encoding (Skilling's algorithm, vectorized in jnp).

Barnes-Hut leaf groups are consecutive runs of curve-sorted particles, so
group compactness depends on the curve's locality. Z-order (Morton) has
octant-boundary jumps that give a fat tail of group bounding radii — measured
on a 262k Plummer sphere, the p99 leaf radius is ~28x the median and near
lists blow up ~3x versus Hilbert ordering, which has no jumps (consecutive
cells are always face-adjacent). BH uses Hilbert by default; Morton remains
for key-prefix/octant semantics (ops/morton.py).

Algorithm: J. Skilling, "Programming the Hilbert curve" (AIP Conf. Proc. 707,
2004): an in-place bit transform of the quantized coordinates followed by the
same bit interleave as Morton. All loops are static (bits x axes), so the
whole encode jits to straight-line VPU code.
"""

from __future__ import annotations

import jax.numpy as jnp

from parallelnbody_tpu.ops.morton import _spread_bits_3, MORTON_BITS


def hilbert_encode(pos, center, half_extent, bits: int = MORTON_BITS):
    """Hilbert keys for (N, 3) positions in the cube
    [center - half_extent, center + half_extent]^3; out-of-box points clamp.
    Returns int32 keys in [0, 8^bits)."""
    n_cells = 1 << bits
    scale = n_cells / (2.0 * half_extent)
    q = jnp.floor((pos - (center - half_extent)) * scale).astype(jnp.int32)
    q = jnp.clip(q, 0, n_cells - 1)
    x0, x1, x2 = q[:, 0], q[:, 1], q[:, 2]

    # --- Skilling transform: coords -> transposed Hilbert bits ---
    # Inverse undo excess work
    qbit = 1 << (bits - 1)
    while qbit > 1:
        x0, x1, x2 = _skilling_round(x0, x1, x2, qbit, qbit - 1)
        qbit >>= 1

    # Gray encode
    x1 = x1 ^ x0
    x2 = x2 ^ x1
    t = jnp.zeros_like(x0)
    qbit = 1 << (bits - 1)
    while qbit > 1:
        t = jnp.where((x2 & qbit) != 0, t ^ (qbit - 1), t)
        qbit >>= 1
    x0, x1, x2 = x0 ^ t, x1 ^ t, x2 ^ t

    # Interleave transposed bits: axis 0 is the most significant of each group.
    return (_spread_bits_3(x0) << 2) | (_spread_bits_3(x1) << 1) | _spread_bits_3(x2)


def _skilling_round(x0, x1, x2, qbit, p):
    """One Q-round of Skilling's inverse-undo, without in-place aliasing."""
    # axis 0 (exchange with itself is a no-op, so only the invert branch acts)
    hi = (x0 & qbit) != 0
    x0 = jnp.where(hi, x0 ^ p, x0)
    # axis 1
    hi = (x1 & qbit) != 0
    t = (x0 ^ x1) & p
    x0n = jnp.where(hi, x0 ^ p, x0 ^ t)
    x1n = jnp.where(hi, x1, x1 ^ t)
    x0, x1 = x0n, x1n
    # axis 2
    hi = (x2 & qbit) != 0
    t = (x0 ^ x2) & p
    x0n = jnp.where(hi, x0 ^ p, x0 ^ t)
    x2n = jnp.where(hi, x2, x2 ^ t)
    return x0n, x1n, x2n
