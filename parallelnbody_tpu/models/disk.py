"""Rotating-disk IC family (exponential disk on near-circular orbits)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parallelnbody_tpu.models.registry import register_ic


@register_ic("disk")
def exponential_disk(key, cfg, n=None, dtype=None, center=None, velocity=None, spin=None):
    """Cold-ish exponential disk: surface density ~ exp(-R/Rd), thin Gaussian
    vertical profile, circular velocity from the enclosed disk mass (monopole
    approximation) plus small velocity dispersion.

    Optional center/velocity/spin let scene builders place and orient disks.
    """
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    rd = cfg.ic_size
    k_r, k_phi, k_z, k_sig = jax.random.split(key, 4)

    # Sample R from the exponential-disk cumulative mass profile
    # M(<R)/M = 1 - (1 + R/Rd) exp(-R/Rd), inverted by bisection on a table.
    u = jax.random.uniform(k_r, (n,), dtype, minval=1e-6, maxval=1.0 - 1e-6)
    r_grid = jnp.linspace(0.0, 12.0, 4096).astype(dtype)
    cdf = 1.0 - (1.0 + r_grid) * jnp.exp(-r_grid)
    x = jnp.interp(u, cdf / cdf[-1], r_grid)  # R / Rd
    r = rd * x

    phi = jax.random.uniform(k_phi, (n,), dtype, maxval=2.0 * jnp.pi)
    z = 0.05 * rd * jax.random.normal(k_z, (n,), dtype)
    pos = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)

    # Circular speed from enclosed mass (spherical monopole approx).
    m_enc = 1.0 - (1.0 + x) * jnp.exp(-x)
    v_c = jnp.sqrt(cfg.g * m_enc / jnp.maximum(r, 0.05 * rd))
    tangent = jnp.stack([-jnp.sin(phi), jnp.cos(phi), jnp.zeros_like(phi)], axis=-1)
    vel = v_c[:, None] * tangent
    vel = vel + 0.05 * v_c[:, None] * jax.random.normal(k_sig, (n, 3), dtype)

    if spin is not None and spin < 0:
        vel = -vel
    mass = jnp.full((n,), 1.0 / n, dtype)
    if center is not None:
        pos = pos + jnp.asarray(center, dtype)
    if velocity is not None:
        vel = vel + jnp.asarray(velocity, dtype)
    return pos, vel, mass
