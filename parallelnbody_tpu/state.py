"""Simulation state: SoA jnp arrays, registered as a pytree.

TPU-native replacement for the reference's AoS particle storage
(`TArray<FParticle> Particles`, OctreeSearch.h:118, FParticle h:8-18):
positions/velocities/accelerations are (N, 3) arrays, masses (N,).
The state also carries potential-energy-per-particle (a free byproduct of the
force kernels), the integration time/step counter, and the PRNG key so a
checkpoint fully determines the future of the run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SimState(NamedTuple):
    """One snapshot of the simulation. A NamedTuple is automatically a pytree."""

    pos: jax.Array   # (N, 3) positions
    vel: jax.Array   # (N, 3) velocities
    mass: jax.Array  # (N,)   masses
    acc: jax.Array   # (N, 3) accelerations at `time` (for KDK leapfrog reuse)
    pot: jax.Array   # (N,)   potential per unit mass at each particle (phi_i)
    time: jax.Array  # ()     simulation time
    step: jax.Array  # ()     int32 step counter
    key: jax.Array   # PRNG key (for stochastic subsystems / restarts)

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dtype(self):
        return self.pos.dtype


def make_state(pos, vel, mass, key=None, dtype=jnp.float32) -> SimState:
    """Build a SimState from raw arrays; acc/pot start zeroed (filled by init)."""
    pos = jnp.asarray(pos, dtype)
    vel = jnp.asarray(vel, dtype)
    mass = jnp.asarray(mass, dtype)
    if pos.ndim != 2 or pos.shape[1] != 3:
        raise ValueError(f"pos must be (N, 3), got {pos.shape}")
    n = pos.shape[0]
    if vel.shape != (n, 3):
        raise ValueError(f"vel must be ({n}, 3), got {vel.shape}")
    if mass.shape != (n,):
        raise ValueError(f"mass must be ({n},), got {mass.shape}")
    if key is None:
        key = jax.random.key(0)
    return SimState(
        pos=pos,
        vel=vel,
        mass=mass,
        acc=jnp.zeros_like(pos),
        pot=jnp.zeros_like(mass),
        time=jnp.zeros((), dtype),
        step=jnp.zeros((), jnp.int32),
        key=key,
    )


def domain_half_extent(state: SimState) -> jax.Array:
    """Root-cube half extent: max |coordinate| over all particles.

    Semantics match the reference's ComputeCubeSize (OctreeSearch.cpp:47-56):
    `Size = max_i GetAbsMax(Particles[i].Position)`.
    """
    return jnp.max(jnp.abs(state.pos))


def center_of_mass(state: SimState) -> jax.Array:
    m = state.mass[:, None]
    return jnp.sum(m * state.pos, axis=0) / jnp.sum(state.mass)
