"""Ring all-pairs force schedule (runs inside shard_map).

Each of P devices owns N/P bodies. Source (position, mass) tiles rotate
around the ring with jax.lax.ppermute; every pass each device accumulates the
partial accelerations of its resident targets against the visiting source
tile. After P passes every target has seen every source — the ring-attention
schedule with gravity instead of attention (SURVEY.md §2: the SP/CP analogue).

The per-pass tile interaction is the same primitive the single-chip kernels
use (`direct_accel_tile` in jnp, or the Pallas kernel on TPU), so sharded and
single-device results agree to reassociation-level fp error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parallelnbody_tpu.ops.direct import direct_accel_tile

RING_AXIS = "ring"


def ring_accel(pos, mass, *, g, softening, axis=RING_AXIS, tile_fn=None):
    """Accelerations/potentials of local targets against all global sources.

    Must be called inside shard_map (or pmap) with `axis` a mesh axis name.
    pos: (n_local, 3), mass: (n_local,). Returns ((n_local, 3), (n_local,)).

    tile_fn(pos_i, pos_j, mass_j) -> (acc, pot) overrides the per-pass tile
    kernel (e.g. the Pallas kernel on TPU).
    """
    p = jax.lax.axis_size(axis)
    perm = [(j, (j + 1) % p) for j in range(p)]
    if tile_fn is None:
        def tile_fn(pi, pj, mj):
            return direct_accel_tile(pi, pj, mj, g=g, softening=softening)

    def body(_, carry):
        acc, pot, src_pos, src_mass = carry
        # Double-buffered overlap: issue the rotation of the NEXT source tile
        # BEFORE computing on the current one. The collective-permute-start
        # has no data dependence on the tile compute, so XLA's latency-hiding
        # scheduler can run the ICI transfer under the compute; the matching
        # -done is only awaited at the next iteration's use. (Single-chip rig:
        # structurally enabled here, measurable only on a real multi-chip
        # mesh.) After the final pass the tile returns home, keeping the loop
        # carry shape-invariant.
        nxt_pos = jax.lax.ppermute(src_pos, axis, perm)
        nxt_mass = jax.lax.ppermute(src_mass, axis, perm)
        a, ph = tile_fn(pos, src_pos, src_mass)
        return acc + a, pot + ph, nxt_pos, nxt_mass

    acc0 = jnp.zeros_like(pos)
    pot0 = jnp.zeros_like(mass)
    acc, pot, _, _ = jax.lax.fori_loop(0, p, body, (acc0, pot0, pos, mass))
    return acc, pot
