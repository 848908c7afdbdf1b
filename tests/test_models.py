"""IC model-family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.models import get_ic, IC_REGISTRY


ALL_ICS = sorted(IC_REGISTRY)


@pytest.mark.parametrize("name", ALL_ICS)
def test_shapes_and_finiteness(name):
    cfg = SimConfig(n=256, ic=name)
    pos, vel, mass = get_ic(name)(jax.random.key(0), cfg)
    assert pos.shape == (256, 3)
    assert vel.shape == (256, 3)
    assert mass.shape == (256,)
    for a in (pos, vel, mass):
        assert np.all(np.isfinite(np.asarray(a)))
    assert np.all(np.asarray(mass) >= 0)


@pytest.mark.parametrize("name", ALL_ICS)
def test_deterministic_under_key(name):
    cfg = SimConfig(n=128, ic=name)
    a = get_ic(name)(jax.random.key(7), cfg)
    b = get_ic(name)(jax.random.key(7), cfg)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_plummer_mass_profile():
    """Half-mass radius of a Plummer sphere: r_h = a / sqrt(2^{2/3} - 1) ~ 1.30 a."""
    cfg = SimConfig(n=65536, ic="plummer", ic_size=1.0)
    pos, _, mass = get_ic("plummer")(jax.random.key(0), cfg)
    a = 3 * np.pi / 16
    r = np.sort(np.linalg.norm(np.asarray(pos), axis=1))
    r_half = r[len(r) // 2]
    expected = a / np.sqrt(2 ** (2.0 / 3.0) - 1.0)
    assert abs(r_half - expected) / expected < 0.05
    np.testing.assert_allclose(float(jnp.sum(mass)), 1.0, rtol=1e-5)


def test_reference_slab_semantics():
    """Slab bounds, speed range, mass range, central body — OctreeSearch.cpp:58-72."""
    cfg = SimConfig(n=4096, ic="reference_slab", ic_size=200.0)
    pos, vel, mass = get_ic("reference_slab")(jax.random.key(0), cfg)
    pos, vel, mass = map(np.asarray, (pos, vel, mass))
    assert np.all(np.abs(pos[:, 0]) <= 200.0) and np.all(np.abs(pos[:, 1]) <= 200.0)
    assert np.all(np.abs(pos[:, 2]) <= 20.0)
    speeds = np.linalg.norm(vel[1:], axis=1)
    assert speeds.min() >= 250.0 - 1e-3 and speeds.max() <= 500.0 + 1e-3
    assert mass[1:].min() >= 1.0 and mass[1:].max() <= 5000.0
    # Central body (cpp:68-70)
    np.testing.assert_array_equal(pos[0], 0.0)
    np.testing.assert_array_equal(vel[0], 0.0)
    assert mass[0] == 5000.0


def test_two_body_is_circular():
    cfg = SimConfig(n=2, ic="two_body", g=1.0)
    pos, vel, mass = get_ic("two_body")(jax.random.key(0), cfg)
    v = float(jnp.linalg.norm(vel[0]))
    np.testing.assert_allclose(v, np.sqrt(0.5 / 4.0), rtol=1e-6)


def test_galaxy_collision_two_clumps():
    cfg = SimConfig(n=2048, ic="galaxy_collision", ic_size=1.0)
    pos, vel, mass = get_ic("galaxy_collision")(jax.random.key(0), cfg)
    x = np.asarray(pos)[:, 0]
    # Two clumps separated along x, approaching each other.
    assert np.mean(x[:1024]) < -2.0 and np.mean(x[1024:]) > 2.0
    vx = np.asarray(vel)[:, 0]
    assert np.mean(vx[:1024]) > 0 and np.mean(vx[1024:]) < 0
    np.testing.assert_allclose(float(jnp.sum(mass)), 2.0, rtol=1e-5)


def test_disk_rotates():
    cfg = SimConfig(n=4096, ic="disk", ic_size=1.0)
    pos, vel, mass = get_ic("disk")(jax.random.key(0), cfg)
    lz = np.asarray(jnp.sum(mass * (pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0])))
    assert lz > 0.1  # net angular momentum about z


def test_virialize_option():
    """virialize=True rescales speeds so 2K + W = 0 at t=0."""
    from parallelnbody_tpu.api import init_simulation
    from parallelnbody_tpu.ops.energy import kinetic_energy, potential_energy

    cfg = SimConfig(n=2048, ic="nfw", softening=0.02, force="direct",
                    dtype="float64", virialize=True)
    state = init_simulation(cfg)
    ke = float(kinetic_energy(state.vel, state.mass))
    w = float(potential_energy(state.pot, state.mass))
    assert abs(2 * ke + w) / abs(w) < 1e-6


def test_virialize_with_untracked_potential():
    """virialize=True must use the REAL potential even when the run's own
    track_potential=False (the BH path returns pot=0 then — an unguarded
    rescale would crush velocities to ~sqrt(1e-30/2K)). Regression for the
    init-path fix: init_simulation forces potential on for its one t=0
    evaluation."""
    from parallelnbody_tpu.api import init_simulation
    from parallelnbody_tpu.ops.direct import direct_accel
    from parallelnbody_tpu.ops.energy import kinetic_energy, potential_energy

    cfg = SimConfig(n=2048, ic="plummer", softening=0.02,
                    force="barnes_hut", theta=0.6, virialize=True,
                    track_potential=False)
    state = init_simulation(cfg)
    ke = float(kinetic_energy(state.vel, state.mass))
    assert ke > 1e-6  # velocities survived the rescale
    # 2K + W ~ 0 against an exact direct-sum potential (BH pot itself is
    # approximate at theta=0.6, so allow the MAC error class).
    _, pot = direct_accel(state.pos, state.mass, g=cfg.g,
                          softening=cfg.softening)
    w = float(potential_energy(pot, state.mass))
    assert abs(2 * ke + w) / abs(w) < 1e-2
