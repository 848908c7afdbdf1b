"""Conserved-quantity diagnostics: energy, momentum, angular momentum.

The reference has no diagnostics at all (SURVEY.md §5 — its only readout is
the UI FPS text); these are the observability layer the TPU build adds, and
the basis of the oracle-parity tests (energy drift < 1e-4 over 1000 steps,
BASELINE.md).

All reductions are psum-friendly: on a sharded state they are used inside
shard_map with a trailing `jax.lax.psum` (see parallel/sharded.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def kinetic_energy(vel, mass):
    return 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))


def potential_energy(pot, mass):
    """Total PE from per-particle potentials phi_i = -G sum_j m_j / r_ij.
    The 1/2 corrects double counting of pairs.

    With softening > 0 every force method (direct, Pallas, Barnes-Hut, and
    the C++ oracle) consistently includes the constant self-term
    -G m_i / eps in phi_i, so absolute PE carries a fixed self-energy offset
    while drifts and differences are unaffected."""
    return 0.5 * jnp.sum(mass * pot)


def total_energy(vel, mass, pot):
    return kinetic_energy(vel, mass) + potential_energy(pot, mass)


def momentum(vel, mass):
    return jnp.sum(mass[:, None] * vel, axis=0)


def angular_momentum(pos, vel, mass):
    return jnp.sum(mass[:, None] * jnp.cross(pos, vel), axis=0)


def diagnostics(state) -> dict:
    """Scalar diagnostics dict for one state (device arrays; caller converts)."""
    ke = kinetic_energy(state.vel, state.mass)
    pe = potential_energy(state.pot, state.mass)
    p = momentum(state.vel, state.mass)
    L = angular_momentum(state.pos, state.vel, state.mass)
    return {
        "time": state.time,
        "step": state.step,
        "kinetic": ke,
        "potential": pe,
        "energy": ke + pe,
        "momentum_norm": jnp.linalg.norm(p),
        "angular_momentum_norm": jnp.linalg.norm(L),
        "max_accel": jnp.max(jnp.linalg.norm(state.acc, axis=-1)),
        "max_radius": jnp.max(jnp.linalg.norm(state.pos, axis=-1)),
    }
