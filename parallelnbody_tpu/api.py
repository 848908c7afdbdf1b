"""Simulation API — the TPU-native equivalent of the reference's actor layer.

Reference (L3, SURVEY.md §1): `AOctreeSearch` owns the particle array and
exposes CreateSpacePoints / CreateOctree / CleanParticles plus a per-frame
Tick (OctreeSearch.h:111-149, .cpp:21-97). Here the equivalents are pure
functions over a SimState pytree:

    init_simulation(cfg)        ~ CreateSpacePoints  (.cpp:58-72)
    make_step(cfg)              ~ Tick's physics body (.cpp:25-31), jitted
    make_run(cfg, k)            ~ k Ticks fused into one lax.scan
    Simulation.reset()          ~ CleanParticles + CreateSpacePoints (.cpp:91-97)

Pausing (`PhDeltaTime <= 0` gate, .cpp:25) is a host-loop concern: you simply
do not call step().
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.state import SimState, make_state
from parallelnbody_tpu.models import get_ic
from parallelnbody_tpu.ops.integrators import get_integrator
from parallelnbody_tpu.ops import energy as energy_ops


# --------------------------------------------------------------------- forces
def make_accel_fn(cfg: SimConfig, mass: jax.Array) -> Callable:
    """Return accel_fn(pos) -> (acc, pot) for the configured force method."""
    method = cfg.resolve_force()
    if method == "direct":
        from parallelnbody_tpu.ops.direct import direct_accel

        n = mass.shape[0]
        # Bound memory for medium N in plain jnp: stream row tiles (largest
        # power-of-two divisor of N up to 1024; N <= 2048 fits unblocked).
        tile = 0
        if n > 2048:
            tile = 1
            for t in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2):
                if n % t == 0:
                    tile = t
                    break
        return lambda pos: direct_accel(pos, mass, g=cfg.g, softening=cfg.softening, tile=tile)
    if method == "direct_pallas":
        from parallelnbody_tpu.ops.pallas_direct import make_pallas_accel

        return make_pallas_accel(cfg, mass)
    if method == "barnes_hut":
        from parallelnbody_tpu.ops.bh import make_bh_accel

        return make_bh_accel(cfg, mass)
    raise ValueError(f"unknown force method {method!r}")


# ----------------------------------------------------------------------- init
def init_simulation(cfg: SimConfig, key: jax.Array | None = None) -> SimState:
    """Generate ICs and evaluate initial forces (so leapfrog can start)."""
    if key is None:
        key = jax.random.key(cfg.seed)
    k_ic, k_state = jax.random.split(key)
    pos, vel, mass = get_ic(cfg.ic)(k_ic, cfg)
    state = make_state(pos, vel, mass, key=k_state, dtype=jnp.dtype(cfg.dtype))
    accel_fn = make_accel_fn(cfg, state.mass)
    acc, pot = accel_fn(state.pos)
    if cfg.virialize:
        # Rescale speeds so 2K = -W using the just-computed potential —
        # turns approximately-sampled models (hernquist/king/nfw/...) into
        # virial equilibria without per-model distribution functions.
        ke = 0.5 * jnp.sum(state.mass * jnp.sum(vel * vel, axis=-1))
        w = 0.5 * jnp.sum(state.mass * pot)
        scale = jnp.sqrt(jnp.maximum(-w, 1e-30) / jnp.maximum(2.0 * ke, 1e-30))
        state = state._replace(vel=vel * scale)
    return state._replace(acc=acc, pot=pot)


# ----------------------------------------------------------------------- step
def make_step(cfg: SimConfig) -> Callable[[SimState], SimState]:
    """One fused, jitted integration step: force + integrate, no host sync."""
    integrator = get_integrator(cfg.integrator)

    @jax.jit
    def step(state: SimState) -> SimState:
        accel_fn = make_accel_fn(cfg, state.mass)
        dt = jnp.asarray(cfg.dt, state.pos.dtype)
        pos, vel, acc, pot = integrator(
            accel_fn, state.pos, state.vel, state.acc, state.pot, dt
        )
        return state._replace(
            pos=pos, vel=vel, acc=acc, pot=pot,
            time=state.time + dt, step=state.step + 1,
        )

    return step


def make_run(cfg: SimConfig, n_steps: int) -> Callable[[SimState], SimState]:
    """n_steps fused into a single jitted lax.scan (zero host round-trips)."""
    integrator = get_integrator(cfg.integrator)

    @jax.jit
    def run(state: SimState) -> SimState:
        accel_fn = make_accel_fn(cfg, state.mass)
        dt = jnp.asarray(cfg.dt, state.pos.dtype)

        def body(s, _):
            pos, vel, acc, pot = integrator(accel_fn, s.pos, s.vel, s.acc, s.pot, dt)
            return (
                s._replace(pos=pos, vel=vel, acc=acc, pot=pot,
                           time=s.time + dt, step=s.step + 1),
                None,
            )

        state, _ = jax.lax.scan(body, state, length=n_steps)
        return state

    return run


# ----------------------------------------------------------------- host shell
class Simulation:
    """Thin host-side shell: owns cfg + state, drives jitted steps.

    Mirrors the reference actor's lifecycle (spawn -> CreateSpacePoints ->
    Tick loop -> CleanParticles) without any engine dependency.
    """

    def __init__(self, cfg: SimConfig, key: jax.Array | None = None):
        self.cfg = cfg
        self.state = init_simulation(cfg, key)
        self._step = make_step(cfg)
        self._runs: dict[int, Callable] = {}

    def step(self, n: int = 1) -> SimState:
        if n == 1:
            self.state = self._step(self.state)
        else:
            if n not in self._runs:
                self._runs[n] = make_run(self.cfg, n)
            self.state = self._runs[n](self.state)
        return self.state

    def reset(self, seed: int | None = None) -> SimState:
        """CleanParticles + CreateSpacePoints analogue (OctreeSearch.cpp:91-97)."""
        cfg = self.cfg if seed is None else self.cfg.replace(seed=seed)
        self.cfg = cfg
        self.state = init_simulation(cfg)
        return self.state

    def diagnostics(self) -> dict:
        state = self.state
        if not self.cfg.track_potential:
            # Hot steps skipped the potential; recompute it for diagnostics.
            accel_fn = make_accel_fn(self.cfg.replace(track_potential=True),
                                     state.mass)
            _, pot = accel_fn(state.pos)
            state = state._replace(pot=pot)
        vals = energy_ops.diagnostics(state)
        return {k: float(v) for k, v in vals.items()}
