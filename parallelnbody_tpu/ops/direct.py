"""Direct-sum O(N^2) gravity in pure jnp.

This is the TPU-native equivalent of the all-pairs force law the reference
applies per accepted octree node (`a += G*M/d^3 * (CoM - x)`,
OctreeSearch.h:104) evaluated exactly over every pair — i.e. the theta -> 0
limit of the reference's Barnes-Hut, and the CPU oracle for small N
(SURVEY.md §7 stage 1).

Two softening regimes:

  * softening > 0 (default profile): Plummer-softened force
        a_i = G * sum_j m_j (x_j - x_i) / (|x_j - x_i|^2 + eps^2)^{3/2}
    The i == j term vanishes naturally (numerator is zero, denominator > 0).

  * softening == 0 (reference-compat profile): exact Newtonian force with the
    reference's exact-overlap guard `d == 0 -> skip` (OctreeSearch.h:102),
    which also removes the self-interaction.

Potential is returned alongside acceleration (phi_i = -G sum_j m_j / r_soft),
so energy diagnostics are free byproducts of the force pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pairwise_tile(pos_i, pos_j, mass_j, g, eps2, guard_zero):
    """Accel+potential on an (I, J) tile of the interaction matrix.

    pos_i: (I, 3), pos_j: (J, 3), mass_j: (J,). Returns ((I, 3) accel, (I,) pot).
    """
    # d_ij = x_j - x_i  -> (I, J, 3)
    d = pos_j[None, :, :] - pos_i[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + eps2  # (I, J)
    inv_r = jax.lax.rsqrt(r2)
    if guard_zero:
        # Reference-compat: skip exact overlaps (OctreeSearch.h:102). Also
        # protects the unsoftened rsqrt(0) = inf from producing NaNs.
        inv_r = jnp.where(r2 > 0.0, inv_r, 0.0)
    w = mass_j[None, :] * inv_r * inv_r * inv_r  # (I, J) = m_j / r^3
    acc = g * jnp.einsum("ij,ijc->ic", w, d)
    pot = -g * jnp.sum(mass_j[None, :] * inv_r, axis=1)
    return acc, pot


def direct_accel_tile(pos_i, pos_j, mass_j, *, g, softening):
    """Public tile primitive: interactions of targets `pos_i` with sources
    (`pos_j`, `mass_j`). Used by the multi-chip ring schedule (each ring pass
    feeds one remote tile of sources) and by tests."""
    eps2 = jnp.asarray(softening, pos_i.dtype) ** 2
    return _pairwise_tile(pos_i, pos_j, mass_j, g, eps2, guard_zero=(softening == 0.0))


@functools.partial(jax.jit, static_argnames=("g", "softening", "tile"))
def direct_accel(pos, mass, *, g=1.0, softening=0.0, tile=0):
    """Full O(N^2) accelerations and potentials.

    tile=0 materializes the (N, N, 3) displacement tensor (fine for small N,
    exact oracle). tile>0 streams row blocks with lax.map to bound memory to
    O(tile * N) — use for medium N in plain jnp (the Pallas kernel supersedes
    this on TPU).
    """
    n = pos.shape[0]
    if tile and n % tile == 0 and n > tile:
        def row_block(i0):
            pi = jax.lax.dynamic_slice_in_dim(pos, i0, tile, axis=0)
            return direct_accel_tile(pi, pos, mass, g=g, softening=softening)

        starts = jnp.arange(0, n, tile)
        acc, pot = jax.lax.map(row_block, starts)
        return acc.reshape(n, 3), pot.reshape(n)
    return direct_accel_tile(pos, pos, mass, g=g, softening=softening)


def direct_energy(pos, vel, mass, *, g=1.0, softening=0.0):
    """(KE, PE) via the direct pairwise sum. PE counts each pair once."""
    _, pot = direct_accel(pos, mass, g=g, softening=softening)
    ke = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))
    pe = 0.5 * jnp.sum(mass * pot)
    return ke, pe
