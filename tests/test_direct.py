"""Direct-sum force tests: Newton's laws, reference force-law parity, tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.ops.direct import direct_accel, direct_accel_tile, direct_energy


def _numpy_direct(pos, mass, g, eps):
    """Trivially-correct numpy oracle of the reference force law
    a += G*M/d^3 * (x_j - x_i) (OctreeSearch.h:104), optionally softened."""
    n = pos.shape[0]
    acc = np.zeros_like(pos)
    pot = np.zeros(n, dtype=pos.dtype)
    for i in range(n):
        d = pos - pos[i]
        r2 = np.sum(d * d, axis=1) + eps * eps
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_r = np.where(r2 > 0, 1.0 / np.sqrt(r2), 0.0)
        w = mass * inv_r**3
        acc[i] = g * (w[:, None] * d).sum(axis=0)
        pot[i] = -g * np.sum(mass * inv_r)
    return acc, pot


@pytest.mark.parametrize("softening", [0.0, 0.05])
def test_matches_numpy_oracle(softening):
    rng = np.random.default_rng(0)
    n = 64
    pos = rng.standard_normal((n, 3)).astype(np.float64)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float64)
    acc, pot = direct_accel(jnp.asarray(pos), jnp.asarray(mass), g=2.5, softening=softening)
    acc_np, pot_np = _numpy_direct(pos, mass, 2.5, softening)
    np.testing.assert_allclose(np.asarray(acc), acc_np, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pot), pot_np, rtol=1e-12, atol=1e-12)


def test_momentum_conservation_antisymmetry():
    """Sum_i m_i a_i = 0 exactly up to fp error (forces are antisymmetric)."""
    rng = np.random.default_rng(1)
    n = 128
    pos = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float64)
    acc, _ = direct_accel(pos, mass, g=1.0, softening=0.01)
    f_total = jnp.sum(mass[:, None] * acc, axis=0)
    np.testing.assert_allclose(np.asarray(f_total), 0.0, atol=1e-10)


def test_two_body_inverse_square():
    """Exact two-body force magnitude G*m/r^2."""
    pos = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mass = jnp.asarray([3.0, 5.0])
    acc, pot = direct_accel(pos, mass, g=1.0, softening=0.0)
    # a_0 = G*m_1/r^2 toward particle 1
    np.testing.assert_allclose(float(acc[0, 0]), 5.0 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(float(acc[1, 0]), -3.0 / 4.0, rtol=1e-6)
    np.testing.assert_allclose(float(pot[0]), -5.0 / 2.0, rtol=1e-6)


def test_self_interaction_is_zero_unsoftened():
    """The d == 0 guard (OctreeSearch.h:102): a single particle feels nothing;
    coincident particles do not produce NaNs."""
    pos = jnp.zeros((2, 3))
    mass = jnp.ones(2)
    acc, pot = direct_accel(pos, mass, g=1.0, softening=0.0)
    assert np.all(np.isfinite(np.asarray(acc)))
    np.testing.assert_allclose(np.asarray(acc), 0.0)


def test_tiled_matches_untiled():
    rng = np.random.default_rng(2)
    n = 1024
    pos = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    a0, p0 = direct_accel(pos, mass, g=1.0, softening=0.01, tile=0)
    a1, p1 = direct_accel(pos, mass, g=1.0, softening=0.01, tile=256)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), rtol=2e-5, atol=2e-5)


def test_tile_primitive_composes():
    """Summing tile contributions over source chunks == full result
    (the invariant the multi-chip ring schedule relies on)."""
    rng = np.random.default_rng(3)
    n = 96
    pos = jnp.asarray(rng.standard_normal((n, 3)), jnp.float64)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float64)
    full_acc, full_pot = direct_accel(pos, mass, g=1.0, softening=0.02)
    acc = jnp.zeros_like(pos)
    pot = jnp.zeros_like(mass)
    for c in range(4):
        sl = slice(c * 24, (c + 1) * 24)
        a, p = direct_accel_tile(pos, pos[sl], mass[sl], g=1.0, softening=0.02)
        acc, pot = acc + a, pot + p
    np.testing.assert_allclose(np.asarray(acc), np.asarray(full_acc), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(full_pot), rtol=1e-12)


def test_direct_energy_virial_sanity():
    """Plummer sphere should be near virial equilibrium: 2K + W ~ 0."""
    from parallelnbody_tpu.config import SimConfig
    from parallelnbody_tpu.models import get_ic

    cfg = SimConfig(n=4096, softening=0.01)
    pos, vel, mass = get_ic("plummer")(jax.random.key(0), cfg)
    ke, pe = direct_energy(pos, vel, mass, g=1.0, softening=0.01)
    virial = float((2 * ke + pe) / abs(pe))
    assert abs(virial) < 0.1, f"virial ratio off: {virial}"


def test_rms_force_error_sampler():
    """The benchmark accuracy sampler (utils/accuracy.py, VERDICT r3 weak
    #2): exact forces sample to ~zero error; a known relative perturbation
    is recovered; non-divisible N exercises the source padding."""
    from parallelnbody_tpu.utils.accuracy import rms_force_error_sample
    from parallelnbody_tpu.config import SimConfig
    from parallelnbody_tpu.models import get_ic

    cfg = SimConfig(n=3000, softening=0.01)  # pads 3000 -> chunk multiple
    pos, _, mass = get_ic("plummer")(jax.random.key(0), cfg)
    acc, _ = direct_accel(pos, mass, g=1.0, softening=0.01)
    r0 = rms_force_error_sample(pos, mass, acc, g=1.0, softening=0.01,
                                k=512)
    assert r0 < 1e-5, r0
    r1 = rms_force_error_sample(pos, mass, acc * 1.001, g=1.0,
                                softening=0.01, k=512)
    np.testing.assert_allclose(r1, 1e-3, rtol=0.1)
