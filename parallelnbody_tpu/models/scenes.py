"""Composite scenes — the BASELINE.md galaxy-collision config.

`galaxy_collision`: two Plummer spheres (mass ratio 1:1) on an approaching
parabolic-ish orbit with an impact parameter, the N=2M flagship scene for
trajectory-snapshot export (BASELINE.json config 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parallelnbody_tpu.models.registry import register_ic
from parallelnbody_tpu.models.spheres import plummer


@register_ic("galaxy_collision")
def galaxy_collision(key, cfg, n=None, dtype=None):
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    n1 = n // 2
    n2 = n - n1
    k1, k2 = jax.random.split(key)

    pos1, vel1, m1 = plummer(k1, cfg, n=n1, dtype=dtype)
    pos2, vel2, m2 = plummer(k2, cfg, n=n2, dtype=dtype)

    sep = 10.0 * cfg.ic_size       # initial separation along x
    b = 2.0 * cfg.ic_size          # impact parameter along y
    # Relative speed ~ parabolic encounter of two unit-mass galaxies at r=sep.
    v_rel = jnp.sqrt(2.0 * cfg.g * (1.0 + 1.0) / sep).astype(dtype)

    off = jnp.asarray([sep / 2.0, b / 2.0, 0.0], dtype)
    voff = jnp.asarray([v_rel / 2.0, 0.0, 0.0], dtype)

    pos = jnp.concatenate([pos1 - off, pos2 + off], axis=0)
    vel = jnp.concatenate([vel1 + voff, vel2 - voff], axis=0)
    # Each half keeps total mass 1 (masses 1/n_half) so each galaxy is an
    # equilibrium Plummer model of unit mass; total system mass = 2.
    mass = jnp.concatenate([m1, m2], axis=0)
    return pos, vel, mass
