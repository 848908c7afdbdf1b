"""MXU-hybrid all-pairs experiments (VERDICT r1 weak #2 / next #3).

Variants, all producing (acc, rowsum) per i-tile:

  V0  current VPU kernel (ops/pallas_direct.py): dx on VPU, reduce on VPU.
  V3  half-hybrid: dx/r2/w on VPU, the accumulation sum_j w_ij*(xj - xi)
      = (W @ S)[:, :3] - (W @ S)[:, 3] * xi moved to the MXU
      (S = [xj, yj, zj, 1]), at DEFAULT (bf16) and HIGHEST (f32) precision.
  V1  full hybrid: r2 via the |xi|^2 + |xj|^2 - 2 xi.xj cross-term matmul
      too (both matmuls on MXU). Known risk: difference-of-squares
      cancellation for close pairs.

Measures pairs/s at N=262144 on TPU and max/rms relative force error vs a
float64 CPU direct sum at N=16384 (same positions).
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation
from parallelnbody_tpu.ops.pallas_direct import allpairs_raw
from parallelnbody_tpu.utils.profiling import force_sync

TI, TJ = 256, 2048
EPS = 0.01


def _kern_v3(pi_ref, ptj_ref, sj_ref, out_ref, *, eps2, precision):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pi_ref[:, 0:1]
    yi = pi_ref[:, 1:2]
    zi = pi_ref[:, 2:3]
    xj = ptj_ref[0:1, :]
    yj = ptj_ref[1:2, :]
    zj = ptj_ref[2:3, :]
    mj = ptj_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2
    u = jax.lax.rsqrt(r2)
    w = (mj * u) * (u * u)                       # (TI, TJ)
    out_ref[:] += jnp.dot(w, sj_ref[:], precision=precision,
                          preferred_element_type=jnp.float32)


def _kern_v1(pi_ref, ptj_ref, sj_ref, out_ref, *, eps2, precision):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi3 = pi_ref[:, 0:3]                         # (TI, 3)
    ni = pi_ref[:, 3:4]                          # |xi|^2
    xj3 = ptj_ref[0:3, :]                        # (3, TJ)
    nj = ptj_ref[3:4, :]                         # |xj|^2
    mj = ptj_ref[4:5, :]
    cross = jnp.dot(xi3, xj3, precision=precision,
                    preferred_element_type=jnp.float32)   # (TI, TJ) MXU
    r2 = jnp.maximum(ni + nj - 2.0 * cross, 0.0) + eps2
    u = jax.lax.rsqrt(r2)
    w = (mj * u) * (u * u)
    out_ref[:] += jnp.dot(w, sj_ref[:], precision=precision,
                          preferred_element_type=jnp.float32)


def _kern_v4(pi_ref, ptj_ref, sj_ref, cj_ref, out_ref, *, eps2, precision,
             band_tiles):
    """V4 (VERDICT r2 #5): per-j-tile re-centering + VPU near-diagonal band.

    Positions are HILBERT-SORTED, so a TJ j-tile is spatially local; sj
    arrives pre-centered on its tile centroid c_j (shrinking the MXU
    reduce's operand magnitude from the domain radius R to the tile
    radius), and the identity
        acc_i = (W @ [xj - c, 1])[:, :3] + rowsum(W) * (c - x_i)
    restores the result. Tiles within `band_tiles` j-tiles of the diagonal
    (where d -> eps and re-centering cannot help) are evaluated entirely on
    the VPU in f32 — their contribution enters out[:, :3] complete, with no
    rowsum term."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pi_ref[:, 0:1]
    yi = pi_ref[:, 1:2]
    zi = pi_ref[:, 2:3]
    xj = ptj_ref[0:1, :]
    yj = ptj_ref[1:2, :]
    zj = ptj_ref[2:3, :]
    mj = ptj_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2
    u = jax.lax.rsqrt(r2)
    w = (mj * u) * (u * u)                       # (TI, TJ)

    row_mid = i * TI + TI // 2
    in_band = jnp.abs(row_mid - (j * TJ + TJ // 2)) < (
        TJ // 2 + TI // 2 + band_tiles * TJ)

    @pl.when(in_band)
    def _():
        ax = jnp.sum(w * dx, axis=1, keepdims=True)
        ay = jnp.sum(w * dy, axis=1, keepdims=True)
        az = jnp.sum(w * dz, axis=1, keepdims=True)
        out_ref[:, 0:1] += ax
        out_ref[:, 1:2] += ay
        out_ref[:, 2:3] += az

    @pl.when(jnp.logical_not(in_band))
    def _():
        m = jnp.dot(w, sj_ref[:], precision=precision,
                    preferred_element_type=jnp.float32)   # (TI, 4)
        rs = m[:, 3:4]
        out_ref[:, 0:1] += m[:, 0:1] + rs * cj_ref[j % 8, 0]
        out_ref[:, 1:2] += m[:, 1:2] + rs * cj_ref[j % 8, 1]
        out_ref[:, 2:3] += m[:, 2:3] + rs * cj_ref[j % 8, 2]
        out_ref[:, 3:4] += rs


def run_v4(pos, mass, *, precision, band_tiles=1, iters=10):
    """pos must be Hilbert-sorted for the tile-locality premise to hold."""
    n = pos.shape[0]
    dtype = pos.dtype
    pi = jnp.concatenate([pos, jnp.zeros((n, 1), dtype)], axis=1)
    ptj = jnp.concatenate([pos, mass[:, None]], axis=1).T
    cj = jnp.mean(pos.reshape(n // TJ, TJ, 3), axis=1)          # (n/TJ, 3)
    cj4 = jnp.concatenate([cj, jnp.zeros((n // TJ, 1), dtype)], axis=1)
    sj = jnp.concatenate(
        [pos - jnp.repeat(cj, TJ, axis=0), jnp.ones((n, 1), dtype)], axis=1)

    @jax.jit
    def f(pi, ptj, sj, cj4):
        out = pl.pallas_call(
            functools.partial(_kern_v4, eps2=EPS * EPS, precision=precision,
                              band_tiles=band_tiles),
            out_shape=jax.ShapeDtypeStruct((n, 4), dtype),
            grid=(n // TI, n // TJ),
            in_specs=[
                pl.BlockSpec((TI, 4), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TJ, 4), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 4), lambda i, j: (j // 8, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((TI, 4), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=(10 + 256) * n * n, bytes_accessed=n * 64,
                transcendentals=n * n),
        )(pi, ptj, sj, cj4)
        acc = out[:, :3] - out[:, 3:4] * pos
        return acc

    acc = f(pi, ptj, sj, cj4)
    force_sync(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = f(pi, ptj, sj, cj4)
    force_sync(acc)
    dt = (time.perf_counter() - t0) / iters
    return acc, n * n / dt


def run_variant(kern, pos, mass, *, n_pi_cols, precision, iters=10):
    n = pos.shape[0]
    dtype = pos.dtype
    if n_pi_cols == 4:   # V3: pi [x,y,z,0], ptj [x,y,z,m]
        pi = jnp.concatenate([pos, jnp.zeros((n, 1), dtype)], axis=1)
        ptj = jnp.concatenate([pos, mass[:, None]], axis=1).T
    else:                # V1: pi [x,y,z,|x|^2], ptj [x,y,z,|x|^2,m]
        n2 = jnp.sum(pos * pos, axis=1, keepdims=True)
        pi = jnp.concatenate([pos, n2], axis=1)
        ptj = jnp.concatenate([pos, n2, mass[:, None]], axis=1).T
    sj = jnp.concatenate([pos, jnp.ones((n, 1), dtype)], axis=1)  # (N, 4)
    n_c = ptj.shape[0]

    @jax.jit
    def f(pi, ptj, sj):
        out = pl.pallas_call(
            functools.partial(kern, eps2=EPS * EPS, precision=precision),
            out_shape=jax.ShapeDtypeStruct((n, 4), dtype),
            grid=(n // TI, n // TJ),
            in_specs=[
                pl.BlockSpec((TI, 4), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_c, TJ), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TJ, 4), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TI, 4), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=(10 + 256) * n * n, bytes_accessed=n * 64,
                transcendentals=n * n),
        )(pi, ptj, sj)
        acc = out[:, :3] - out[:, 3:4] * pos
        return acc

    acc = f(pi, ptj, sj)
    force_sync(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = f(pi, ptj, sj)
    force_sync(acc)
    dt = (time.perf_counter() - t0) / iters
    return acc, n * n / dt


def run_v0(pos, mass, iters=10):
    n = pos.shape[0]
    pi = jnp.concatenate([pos, jnp.ones((n, 1), pos.dtype)], axis=1)
    ptj = jnp.concatenate([pos, mass[:, None]], axis=1).T

    @jax.jit
    def f(pi, ptj):
        out = allpairs_raw(pi, ptj, eps2=EPS * EPS, guard_zero=False,
                           tile_i=TI, tile_j=TJ, compute_pot=False)
        return out[:, :3]

    acc = f(pi, ptj)
    force_sync(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = f(pi, ptj)
    force_sync(acc)
    return acc, n * n / ((time.perf_counter() - t0) / iters)


def ref_f64(pos, mass):
    p = np.asarray(pos, np.float64)
    m = np.asarray(mass, np.float64)
    acc = np.zeros_like(p)
    for i0 in range(0, len(p), 2048):
        # acc_i = sum_j w_ij (x_j - x_i), blocked over i
        d = p[None, :, :] - p[i0:i0 + 2048, None, :]   # (B, N, 3)
        r2 = np.sum(d * d, axis=-1) + EPS * EPS
        w = m[None, :] * r2 ** -1.5
        acc[i0:i0 + 2048] = np.einsum("bj,bjc->bc", w, d)
    return acc


def errs(acc, ref):
    a = np.asarray(acc, np.float64)
    scale = np.linalg.norm(ref, axis=1)
    e = np.linalg.norm(a - ref, axis=1) / np.maximum(scale, 1e-300)
    return float(np.sqrt(np.mean(e * e))), float(np.max(e))


def hsort(pos, mass):
    """Hilbert-sort (V4's tile-locality premise; harmless for the others)."""
    from parallelnbody_tpu.ops.hilbert import hilbert_encode
    from parallelnbody_tpu.ops.bh import domain_cube

    c, h, _ = domain_cube(jnp.min(pos, 0), jnp.max(pos, 0))
    o = jnp.argsort(hilbert_encode(pos, c, h))
    return pos[o], mass[o]


def main():
    H, D = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    variants = [
        ("V0 vpu", None, None, None),
        ("V3 mxu-reduce HIGHEST", _kern_v3, 4, H),
        ("V3 mxu-reduce DEFAULT", _kern_v3, 4, D),
        ("V1 full-hybrid HIGHEST", _kern_v1, 5, H),
        ("V1 full-hybrid DEFAULT", _kern_v1, 5, D),
        ("V4 recenter+band HIGHEST", "v4", None, H),
        ("V4 recenter+band DEFAULT", "v4", None, D),
    ]

    # Accuracy at N=16384 vs f64 CPU (Hilbert-sorted order for all).
    st = init_simulation(SimConfig(n=16384, ic="plummer", softening=EPS,
                                   force="direct"))
    pos_s, mass_s = hsort(st.pos, st.mass)
    ref = ref_f64(pos_s, mass_s)
    accs = {}
    for name, kern, cols, prec in variants:
        if kern is None:
            acc, _ = run_v0(pos_s, mass_s, iters=2)
        elif kern == "v4":
            acc, _ = run_v4(pos_s, mass_s, precision=prec, iters=2)
        else:
            acc, _ = run_variant(kern, pos_s, mass_s, n_pi_cols=cols,
                                 precision=prec, iters=2)
        accs[name] = errs(acc, ref)

    # Throughput at N=262144.
    stb = init_simulation(SimConfig(n=262144, ic="plummer", softening=EPS,
                                    force="direct_pallas",
                                    track_potential=False))
    pos_b, mass_b = hsort(stb.pos, stb.mass)
    for name, kern, cols, prec in variants:
        if kern is None:
            _, rate = run_v0(pos_b, mass_b)
        elif kern == "v4":
            _, rate = run_v4(pos_b, mass_b, precision=prec)
        else:
            _, rate = run_variant(kern, pos_b, mass_b, n_pi_cols=cols,
                                  precision=prec)
        rms, mx = accs[name]
        print(f"{name:26s} {rate:.3e} pairs/s   rms_err={rms:.2e} "
              f"max_err={mx:.2e}", flush=True)


if __name__ == "__main__":
    main()
