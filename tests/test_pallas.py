"""Pallas all-pairs kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.ops.direct import direct_accel, direct_accel_tile
from parallelnbody_tpu.ops.pallas_direct import pallas_accel_tile


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    return pos, mass


@pytest.mark.parametrize("softening", [0.0, 0.05])
@pytest.mark.parametrize("n", [64, 300, 512])
def test_matches_direct(n, softening):
    pos, mass = _rand(n)
    acc_ref, pot_ref = direct_accel(pos, mass, g=1.5, softening=softening)
    acc, pot = pallas_accel_tile(pos, pos, mass, g=1.5, softening=softening,
                                 tile_i=64, tile_j=128)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(pot_ref),
                               rtol=2e-4, atol=2e-4)


def test_rectangular_tiles():
    """Targets != sources (the ring-pass shape)."""
    pos_i, _ = _rand(96, seed=1)
    pos_j, mass_j = _rand(160, seed=2)
    acc_ref, pot_ref = direct_accel_tile(pos_i, pos_j, mass_j, g=1.0, softening=0.02)
    acc, pot = pallas_accel_tile(pos_i, pos_j, mass_j, g=1.0, softening=0.02,
                                 tile_i=32, tile_j=128)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(pot_ref),
                               rtol=2e-4, atol=2e-4)


def test_padding_contributes_nothing():
    """n not divisible by tiles: zero-mass padding must not change results."""
    pos, mass = _rand(130, seed=3)
    acc_ref, _ = direct_accel(pos, mass, g=1.0, softening=0.01)
    acc, _ = pallas_accel_tile(pos, pos, mass, g=1.0, softening=0.01,
                               tile_i=64, tile_j=128)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               rtol=2e-4, atol=2e-4)


def test_coincident_particles_no_nan():
    pos = jnp.zeros((16, 3), jnp.float32)
    mass = jnp.ones((16,), jnp.float32)
    acc, pot = pallas_accel_tile(pos, pos, mass, g=1.0, softening=0.0,
                                 tile_i=16, tile_j=128)
    assert np.all(np.isfinite(np.asarray(acc)))
    np.testing.assert_allclose(np.asarray(acc), 0.0)
