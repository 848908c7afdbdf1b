"""Spherical IC families: Plummer, Hernquist, uniform, cold collapse, two-body.

All spheres are generated in N-body-ish units (total mass 1, G = cfg.g assumed
1 for the equilibrium velocity scalings) and then scaled by cfg.ic_size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from parallelnbody_tpu.models.registry import register_ic


def _isotropic_unit_vectors(key, n, dtype):
    """Uniform points on the unit sphere (marsaglia via normal trick)."""
    v = jax.random.normal(key, (n, 3), dtype)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-30)


# ----------------------------------------------------------------- Plummer
# Velocity magnitude distribution for an isotropic Plummer model:
# g(q) ~ q^2 (1 - q^2)^{7/2}, v = q * v_esc(r). Sampled by inverse-CDF over a
# precomputed table (static at trace time — no rejection loops under jit).
_Q_TABLE = np.linspace(0.0, 1.0, 4097)
_G_TABLE = _Q_TABLE**2 * (1.0 - _Q_TABLE**2) ** 3.5
_CDF_TABLE = np.concatenate([[0.0], np.cumsum((_G_TABLE[1:] + _G_TABLE[:-1]) * 0.5)])
_CDF_TABLE /= _CDF_TABLE[-1]


@register_ic("plummer")
def plummer(key, cfg, n=None, dtype=None):
    """Isotropic Plummer sphere in virial equilibrium.

    Total mass 1, scale radius a = cfg.ic_size * 3*pi/16 (so that with
    cfg.ic_size = 1 the virial radius is 1 and E_tot = -1/4 when G = 1).
    """
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    a = cfg.ic_size * (3.0 * np.pi / 16.0)
    k_r, k_dir, k_q, k_vdir = jax.random.split(key, 4)

    # Radius via inverse CDF of M(<r): r = a / sqrt(u^{-2/3} - 1).
    u = jax.random.uniform(k_r, (n,), dtype, minval=1e-6, maxval=1.0 - 1e-6)
    r = a / jnp.sqrt(u ** (-2.0 / 3.0) - 1.0)
    # Clip extreme outliers (standard practice; keeps the domain bounded).
    r = jnp.minimum(r, 20.0 * a)
    pos = r[:, None] * _isotropic_unit_vectors(k_dir, n, dtype)

    # Speed: q ~ g(q) via table inverse-CDF, v = q * v_esc.
    uq = jax.random.uniform(k_q, (n,), dtype)
    q = jnp.interp(uq, jnp.asarray(_CDF_TABLE, dtype), jnp.asarray(_Q_TABLE, dtype))
    v_esc = jnp.sqrt(2.0) * (1.0 + (r / a) ** 2) ** (-0.25) / jnp.sqrt(a)
    vel = (q * v_esc)[:, None] * _isotropic_unit_vectors(k_vdir, n, dtype)

    mass = jnp.full((n,), 1.0 / n, dtype)
    pos = pos - jnp.mean(pos, axis=0)
    vel = vel - jnp.mean(vel, axis=0)
    return pos, vel, mass


# ---------------------------------------------------------------- Hernquist
@register_ic("hernquist")
def hernquist(key, cfg, n=None, dtype=None):
    """Hernquist (1990) sphere; positions exact, velocities from the local
    virial scaling sigma^2 ~ G M(<r) / (2 (r + a)) (approximate equilibrium)."""
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    a = cfg.ic_size
    k_r, k_dir, k_v = jax.random.split(key, 3)

    u = jax.random.uniform(k_r, (n,), dtype, minval=1e-6, maxval=1.0 - 1e-4)
    s = jnp.sqrt(u)
    r = a * s / (1.0 - s)
    r = jnp.minimum(r, 50.0 * a)
    pos = r[:, None] * _isotropic_unit_vectors(k_dir, n, dtype)

    m_enc = (r / (r + a)) ** 2  # enclosed mass fraction
    sigma = jnp.sqrt(m_enc / (2.0 * (r + a)))
    vel = sigma[:, None] * jax.random.normal(k_v, (n, 3), dtype)

    mass = jnp.full((n,), 1.0 / n, dtype)
    pos = pos - jnp.mean(pos, axis=0)
    vel = vel - jnp.mean(vel, axis=0)
    return pos, vel, mass


# ------------------------------------------------------------ uniform / cold
@register_ic("uniform_sphere")
def uniform_sphere(key, cfg, n=None, dtype=None):
    """Uniform-density sphere of radius cfg.ic_size with small virial-ish
    random velocities."""
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    k_r, k_dir, k_v = jax.random.split(key, 3)
    r = cfg.ic_size * jax.random.uniform(k_r, (n,), dtype) ** (1.0 / 3.0)
    pos = r[:, None] * _isotropic_unit_vectors(k_dir, n, dtype)
    sigma = 0.3 / jnp.sqrt(jnp.asarray(cfg.ic_size, dtype))
    vel = sigma * jax.random.normal(k_v, (n, 3), dtype)
    mass = jnp.full((n,), 1.0 / n, dtype)
    return pos, vel - jnp.mean(vel, axis=0), mass


@register_ic("cold_sphere")
def cold_sphere(key, cfg, n=None, dtype=None):
    """Uniform sphere at rest — the classic cold-collapse test problem."""
    pos, _, mass = uniform_sphere(key, cfg, n=n, dtype=dtype)
    return pos, jnp.zeros_like(pos), mass


@register_ic("uniform_cube")
def uniform_cube(key, cfg, n=None, dtype=None):
    """Uniform random cube [-s, s]^3, cold."""
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    s = cfg.ic_size
    pos = jax.random.uniform(key, (n, 3), dtype, minval=-s, maxval=s)
    return pos, jnp.zeros_like(pos), jnp.full((n,), 1.0 / n, dtype)


# ------------------------------------------------------------- reference slab
@register_ic("reference_slab")
def reference_slab(key, cfg, n=None, dtype=None):
    """The reference's only scene (CreateSpacePoints, OctreeSearch.cpp:58-72):

      * positions uniform in the slab [-S, S] x [-S, S] x [-S/10, S/10]
      * speeds 10 * U(25, 50) = U(250, 500) in a random direction
      * masses U(1, 5000)
      * particle 0 overridden to a central body: origin, at rest, mass 5000
        (OctreeSearch.cpp:68-70)

    Intended to be stepped with the compat profile (G=1e4, semi-implicit
    Euler, no softening) — see `reference_compat_config`.
    """
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    s = cfg.ic_size
    k_pos, k_speed, k_dir, k_mass = jax.random.split(key, 4)

    extent = jnp.asarray([s, s, s / 10.0], dtype)
    pos = jax.random.uniform(k_pos, (n, 3), dtype, minval=-1.0, maxval=1.0) * extent
    speed = 10.0 * jax.random.uniform(k_speed, (n,), dtype, minval=25.0, maxval=50.0)
    vel = speed[:, None] * _isotropic_unit_vectors(k_dir, n, dtype)
    mass = jax.random.uniform(k_mass, (n,), dtype, minval=1.0, maxval=5000.0)

    pos = pos.at[0].set(jnp.zeros(3, dtype))
    vel = vel.at[0].set(jnp.zeros(3, dtype))
    mass = mass.at[0].set(5000.0)
    return pos, vel, mass


# ------------------------------------------------------------------ two body
@register_ic("two_body")
def two_body(key, cfg, n=None, dtype=None):
    """Equal-mass circular binary (exact analytic orbit — integrator tests).
    Separation 2*ic_size; padded with far-away massless spectators if n > 2."""
    del key
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    a = cfg.ic_size
    m = 0.5
    # Circular orbit of two masses m at +/- a on x-axis:
    # v^2 = G * m_other / (4 a) * ... for separation d = 2a:
    # each orbits the COM at radius a with v = sqrt(G * m / (4 a)).
    v = jnp.sqrt(jnp.asarray(cfg.g, dtype) * m / (4.0 * a))
    pos = jnp.zeros((n, 3), dtype)
    vel = jnp.zeros((n, 3), dtype)
    mass = jnp.zeros((n,), dtype)
    pos = pos.at[0, 0].set(a).at[1, 0].set(-a)
    vel = vel.at[0, 1].set(v).at[1, 1].set(-v)
    mass = mass.at[0].set(m).at[1].set(m)
    if n > 2:
        # Park spectators on a distant ring so they do not perturb the binary.
        idx = jnp.arange(n - 2, dtype=dtype)
        ang = 2.0 * jnp.pi * idx / max(n - 2, 1)
        ring = 1e4 * a
        pos = pos.at[2:, 0].set(ring * jnp.cos(ang)).at[2:, 1].set(ring * jnp.sin(ang))
    return pos, vel, mass


@register_ic("king")
def king(key, cfg, n=None, dtype=None, w0: float = 6.0):
    """King (1966) lowered-isothermal sphere, sampled approximately:
    positions from a numerically integrated King density profile, velocities
    from the local lowered-Maxwellian truncated at the escape speed."""
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    # Integrate the dimensionless King model W(r) once with numpy (static).
    import numpy as _np

    def _king_profile(w0, n_grid=2048):
        # rho(W) ~ exp(W) erf(sqrt(W)) - sqrt(4 W / pi) (1 + 2W/3)
        from math import erf, sqrt, pi, exp

        def rho_of_w(w):
            if w <= 0:
                return 0.0
            return exp(w) * erf(sqrt(w)) - sqrt(4 * w / pi) * (1 + 2 * w / 3)

        # Solve Poisson: (1/r^2) d/dr(r^2 dW/dr) = -9 rho/rho0
        rho0 = rho_of_w(w0)
        dr = 1e-3
        r, w, dwdr = dr, w0, 0.0
        rs, rhos = [0.0], [1.0]
        while w > 0 and r < 50:
            d2 = -9.0 * rho_of_w(w) / rho0 - (2.0 / r) * dwdr
            dwdr += d2 * dr
            w += dwdr * dr
            r += dr
            rs.append(r)
            rhos.append(max(rho_of_w(w) / rho0, 0.0))
        rs = _np.asarray(rs)
        rhos = _np.asarray(rhos)
        menc = _np.concatenate([[0.0], _np.cumsum(
            4 * _np.pi * rs[1:] ** 2 * rhos[1:] * _np.diff(rs))])
        return rs, menc / menc[-1]

    rs, cdf = _king_profile(w0)
    k_r, k_dir, k_v = jax.random.split(key, 3)
    u = jax.random.uniform(k_r, (n,), dtype, minval=1e-6, maxval=1 - 1e-6)
    r = cfg.ic_size * jnp.interp(u, jnp.asarray(cdf, dtype), jnp.asarray(rs, dtype))
    pos = r[:, None] * _isotropic_unit_vectors(k_dir, n, dtype)
    # Local virial-ish dispersion, truncated near the tidal radius.
    rt = float(rs[-1]) * cfg.ic_size
    sigma = 0.4 * jnp.sqrt(jnp.clip(1.0 - r / rt, 0.05, 1.0) / jnp.maximum(cfg.ic_size, 1e-9))
    vel = sigma[:, None] * jax.random.normal(k_v, (n, 3), dtype)
    mass = jnp.full((n,), 1.0 / n, dtype)
    return pos - jnp.mean(pos, 0), vel - jnp.mean(vel, 0), mass


@register_ic("nfw")
def nfw(key, cfg, n=None, dtype=None, concentration: float = 10.0):
    """NFW halo truncated at r_200 = concentration * ic_size (scale radius
    ic_size); velocities from the local virial scaling (approximate)."""
    n = n or cfg.n
    dtype = dtype or jnp.dtype(cfg.dtype)
    c = concentration
    rs_ = cfg.ic_size
    k_r, k_dir, k_v = jax.random.split(key, 3)

    def m_of_x(x):  # enclosed mass of NFW in units of M(r200)
        return (jnp.log(1 + x) - x / (1 + x)) / (jnp.log(1 + c) - c / (1 + c))

    xs = jnp.linspace(1e-3, c, 4096).astype(dtype)
    cdf = m_of_x(xs)
    u = jax.random.uniform(k_r, (n,), dtype, minval=1e-5, maxval=1 - 1e-5)
    x = jnp.interp(u, cdf / cdf[-1], xs)
    r = rs_ * x
    pos = r[:, None] * _isotropic_unit_vectors(k_dir, n, dtype)
    sigma = jnp.sqrt(cfg.g * m_of_x(x) / (2.0 * jnp.maximum(r, 0.05 * rs_)))
    vel = sigma[:, None] * jax.random.normal(k_v, (n, 3), dtype)
    mass = jnp.full((n,), 1.0 / n, dtype)
    return pos - jnp.mean(pos, 0), vel - jnp.mean(vel, 0), mass
