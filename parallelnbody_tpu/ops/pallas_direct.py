"""VMEM-tiled Pallas all-pairs gravity kernel.

The TPU-native equivalent of the CUDA shared-memory tiled all-pairs kernel the
reference *describes* but never implements (README.md:16-17,22; SURVEY.md §2
checklist). Design:

  * Particles are packed as (N, 4) float32 [x, y, z, m] plus a (4, N)
    transpose so i-tiles broadcast along sublanes and j-tiles along lanes.
  * Grid = (i_tiles, j_tiles), j innermost. The i-tile and the output
    accumulator stay resident in VMEM across the whole j sweep (the Pallas
    analogue of CUDA's per-block shared-memory staging); j-tiles stream
    through VMEM with pipelined DMAs.
  * Per (i, j) cell the (TILE_I, TILE_J) interaction block is pure VPU work:
    ~14 flops/pair (3 sub, 3 fma, rsqrt, 3 mul, 3 fma-reduce, 1 add-reduce).
  * Output is (N, 4): [sum w*dx, sum w*dy, sum w*dz, sum m_j*u] with
    w = m_j * u^3, u = rsqrt(r^2 + eps^2). The caller scales by G and
    negates column 3 into the potential, so energy diagnostics are free.

Self-interactions vanish naturally (dx = 0) when softened; the unsoftened
reference-compat profile uses the r2 > 0 guard, matching the reference's
exact-overlap skip (OctreeSearch.h:102). Zero-mass padding rows contribute
nothing, so N is padded to tile multiples without masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_I = 256
DEFAULT_TILE_J = 2048


def _allpairs_kernel(pi_ref, ptj_ref, out_ref, *, eps2, guard_zero, compute_pot):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pi_ref[:, 0:1]  # (TI, 1)
    yi = pi_ref[:, 1:2]
    zi = pi_ref[:, 2:3]
    xj = ptj_ref[0:1, :]  # (1, TJ)
    yj = ptj_ref[1:2, :]
    zj = ptj_ref[2:3, :]
    mj = ptj_ref[3:4, :]

    dx = xj - xi  # (TI, TJ)
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2
    u = jax.lax.rsqrt(r2)
    if guard_zero:
        u = jnp.where(r2 > 0.0, u, 0.0)
    mu = mj * u          # m_j / r
    w = mu * (u * u)     # m_j / r^3

    sx = jnp.sum(w * dx, axis=1, keepdims=True)  # (TI, 1)
    sy = jnp.sum(w * dy, axis=1, keepdims=True)
    sz = jnp.sum(w * dz, axis=1, keepdims=True)
    if compute_pot:
        sp = jnp.sum(mu, axis=1, keepdims=True)
    else:
        # ~7% faster hot step; diagnostics recompute the potential on demand.
        sp = jnp.zeros_like(sx)
    out_ref[:] += jnp.concatenate([sx, sy, sz, sp], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("eps2", "guard_zero", "tile_i", "tile_j", "interpret",
                     "compute_pot"),
)
def allpairs_raw(pi, ptj, *, eps2, guard_zero, tile_i, tile_j, interpret=False,
                 compute_pot=True):
    """Raw tile sums. pi: (Ni, 4) targets, ptj: (4, Nj) sources (transposed).
    Ni % tile_i == 0 and Nj % tile_j == 0 (pad upstream). Returns (Ni, 4)."""
    ni, nj = pi.shape[0], ptj.shape[1]
    assert ni % tile_i == 0 and nj % tile_j == 0, (ni, nj, tile_i, tile_j)
    grid = (ni // tile_i, nj // tile_j)

    kernel = functools.partial(_allpairs_kernel, eps2=eps2, guard_zero=guard_zero,
                               compute_pot=compute_pot)
    flops_per_pair = 14
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ni, 4), pi.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * ni * nj,
            bytes_accessed=ni * 16 + (ni // tile_i) * nj * 16 + ni * 16,
            transcendentals=ni * nj,
        ),
        interpret=interpret,
    )(pi, ptj)


def _pad_to(x, multiple, axis):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pallas_accel_tile(pos_i, pos_j, mass_j, *, g, softening,
                      tile_i=DEFAULT_TILE_I, tile_j=DEFAULT_TILE_J,
                      interpret=None, compute_pot=True):
    """Pallas analogue of ops.direct.direct_accel_tile: accelerations and
    potentials of targets pos_i against sources (pos_j, mass_j)."""
    if interpret is None:
        interpret = _should_interpret()
    dtype = pos_i.dtype
    n_i = pos_i.shape[0]
    n_j = pos_j.shape[0]
    tile_i = min(tile_i, max(8, n_i))
    tile_j = min(tile_j, max(128, n_j))

    pi = _pad_to(jnp.concatenate([pos_i, jnp.ones((n_i, 1), dtype)], axis=1), tile_i, 0)
    pj = _pad_to(jnp.concatenate([pos_j, mass_j[:, None]], axis=1), tile_j, 0)
    out = allpairs_raw(
        pi, pj.T,
        eps2=float(softening) ** 2,
        guard_zero=(softening == 0.0),
        tile_i=tile_i, tile_j=tile_j,
        interpret=interpret, compute_pot=compute_pot,
    )[:n_i]
    acc = g * out[:, :3]
    pot = -g * out[:, 3]
    return acc, pot


def make_pallas_accel(cfg, mass):
    """accel_fn(pos) -> (acc, pot) via the Pallas kernel (self-gravity).

    With cfg.track_potential=False the per-step potential column is skipped
    (the returned pot is zeros); diagnostics recompute it on demand."""
    compute_pot = getattr(cfg, "track_potential", True)

    def accel_fn(pos):
        return pallas_accel_tile(
            pos, pos, mass,
            g=cfg.g, softening=cfg.softening,
            tile_i=cfg.tile_i, tile_j=cfg.tile_j,
            compute_pot=compute_pot,
        )

    return accel_fn


def make_pallas_tile_fn(cfg):
    """Per-ring-pass tile kernel for the multi-chip schedule."""
    def tile_fn(pos_i, pos_j, mass_j):
        return pallas_accel_tile(
            pos_i, pos_j, mass_j,
            g=cfg.g, softening=cfg.softening,
            tile_i=cfg.tile_i, tile_j=cfg.tile_j,
        )

    return tile_fn
