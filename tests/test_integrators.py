"""Integrator tests: exact two-body orbit, energy conservation, order checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import Simulation, init_simulation, make_run


def _binary_cfg(integrator, dt, steps=0):
    return SimConfig(
        n=2, ic="two_body", ic_size=1.0, g=1.0, softening=0.0,
        integrator=integrator, dt=dt, force="direct", dtype="float64",
    )


def _orbit_period():
    # Two masses 0.5 at radius 1 -> omega^2 r = G m_other / (2r)^2
    # omega = sqrt(0.5/4) = sqrt(0.125)
    return 2 * np.pi / np.sqrt(0.125)


@pytest.mark.parametrize("integrator,tol", [
    ("leapfrog", 1e-5),
    ("dkd", 1e-5),
    ("yoshida4", 1e-9),
    ("euler_semi_implicit", 5e-2),
    ("rk4", 1e-9),
])
def test_two_body_energy_conservation(integrator, tol):
    cfg = _binary_cfg(integrator, dt=1e-3)
    sim = Simulation(cfg)
    e0 = sim.diagnostics()["energy"]
    sim.step(2000)
    e1 = sim.diagnostics()["energy"]
    drift = abs((e1 - e0) / e0)
    assert drift < tol, f"{integrator}: energy drift {drift}"


def test_two_body_circular_orbit_returns():
    """After one period the binary returns to its start (leapfrog, small dt)."""
    period = _orbit_period()
    steps = 4000
    cfg = _binary_cfg("leapfrog", dt=period / steps)
    sim = Simulation(cfg)
    x0 = np.asarray(sim.state.pos)
    sim.step(steps)
    x1 = np.asarray(sim.state.pos)
    assert np.max(np.abs(x1 - x0)) < 5e-3


def test_leapfrog_second_order_convergence():
    """Halving dt reduces the position error after one period ~4x (2nd order)."""
    period = _orbit_period()

    def pos_error(steps):
        cfg = _binary_cfg("leapfrog", dt=period / steps)
        sim = Simulation(cfg)
        x0 = np.asarray(sim.state.pos)
        sim.step(steps)
        return np.max(np.abs(np.asarray(sim.state.pos) - x0))

    e1 = pos_error(256)
    e2 = pos_error(512)
    ratio = e1 / max(e2, 1e-300)
    assert 3.0 < ratio < 6.0, f"convergence ratio {ratio}"


def test_momentum_conserved_plummer():
    cfg = SimConfig(n=512, ic="plummer", integrator="leapfrog", dt=1e-3,
                    softening=0.02, force="direct", dtype="float64")
    sim = Simulation(cfg)
    p0 = sim.diagnostics()["momentum_norm"]
    sim.step(200)
    p1 = sim.diagnostics()["momentum_norm"]
    assert p1 < 1e-10 + 10 * max(p0, 1e-12)


def test_run_scan_matches_stepwise():
    """make_run(k) (lax.scan) must equal k sequential make_step calls."""
    cfg = SimConfig(n=128, ic="plummer", dt=1e-3, softening=0.02,
                    force="direct", dtype="float64")
    s_a = init_simulation(cfg)
    s_b = init_simulation(cfg)
    from parallelnbody_tpu.api import make_step

    step = make_step(cfg)
    for _ in range(10):
        s_a = step(s_a)
    s_b = make_run(cfg, 10)(s_b)
    np.testing.assert_allclose(np.asarray(s_a.pos), np.asarray(s_b.pos), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_a.vel), np.asarray(s_b.vel), rtol=1e-12)
    assert int(s_b.step) == 10


def test_reference_compat_profile_steps():
    """The compat profile (G=1e4, slab ICs, semi-implicit Euler) runs and
    matches a hand-rolled numpy reference step (Tick physics,
    OctreeSearch.cpp:25-31, with exact forces)."""
    from parallelnbody_tpu.config import reference_compat_config
    from parallelnbody_tpu.ops.direct import direct_accel

    cfg = reference_compat_config(n=64).replace(dtype="float64")
    state = init_simulation(cfg)
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    mass = np.asarray(state.mass)

    # One reference Tick: a = F(x); v += dt*a; x += dt*v
    acc = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass),
                                  g=1e4, softening=0.0)[0])
    vel_ref = vel + cfg.dt * acc
    pos_ref = pos + cfg.dt * vel_ref

    from parallelnbody_tpu.api import make_step

    state = make_step(cfg)(state)
    np.testing.assert_allclose(np.asarray(state.pos), pos_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(state.vel), vel_ref, rtol=1e-9)
