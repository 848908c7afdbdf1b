"""Tune the flat-CSR near kernel: step size x output strategy.

Variants:
  * STEP_PACKS in {4, 8, 16}: packs (4 subs each) per grid step. Bigger
    steps amortize per-step overhead but pad per-row counts more.
  * out = "rmw": accumulate into the (Ls, 4, G) out block (data-dependent
    out index, zero-on-row-change) — the prototype.
  * out = "steps": write one (4, G) partial per STEP, segment-sum outside
    with XLA (no RMW, no pl.when, no data-dependent out index).
"""

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

from parallelnbody_tpu.utils.profiling import force_sync


def make_kernel(step_packs, out_mode, compute_pot=True, eps2=1e-2):
    def kernel(rows_ref, tgt_ref, src_ref, out_ref):
        c = pl.program_id(0)
        if out_mode == "rmw":
            row = rows_ref[c]
            prev = rows_ref[jnp.maximum(c, 1) - 1]

            @pl.when((c == 0) | (row != prev))
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

        tgt = tgt_ref[0]
        xi = jnp.transpose(tgt[0:1, :])
        yi = jnp.transpose(tgt[1:2, :])
        zi = jnp.transpose(tgt[2:3, :])
        g_t = xi.shape[0]
        ax = jnp.zeros((g_t, 1), xi.dtype)
        ay = jnp.zeros((g_t, 1), xi.dtype)
        az = jnp.zeros((g_t, 1), xi.dtype)
        sp = jnp.zeros((g_t, 1), xi.dtype)
        for j in range(step_packs):
            src = src_ref[0, j]
            xj = src[0:1, :]
            yj = src[1:2, :]
            zj = src[2:3, :]
            mj = src[3:4, :]
            dx = xj - xi
            dy = yj - yi
            dz = zj - zi
            r2 = dx * dx + dy * dy + dz * dz + eps2
            u = jax.lax.rsqrt(r2)
            mu = mj * u
            w = mu * (u * u)
            ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
            ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
            az = az + jnp.sum(w * dz, axis=1, keepdims=True)
            if compute_pot:
                sp = sp + jnp.sum(mu, axis=1, keepdims=True)
        acc = jnp.concatenate([jnp.transpose(ax), jnp.transpose(ay),
                               jnp.transpose(az), jnp.transpose(sp)], axis=0)
        if out_mode == "rmw":
            out_ref[0] = out_ref[0] + acc
        else:
            out_ref[0] = acc
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("step_packs", "out_mode", "n_rows"))
def run(rows, tgt_t, src, *, step_packs, out_mode, n_rows):
    n_steps = rows.shape[0]
    g = tgt_t.shape[2]
    if out_mode == "rmw":
        out_spec = pl.BlockSpec((1, 4, g), lambda c, rows: (rows[c], 0, 0))
        out_shape = jax.ShapeDtypeStruct((n_rows, 4, g), tgt_t.dtype)
    else:
        out_spec = pl.BlockSpec((1, 4, g), lambda c, rows: (c, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n_steps, 4, g), tgt_t.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 4, g), lambda c, rows: (rows[c], 0, 0)),
            pl.BlockSpec((1, step_packs, 4, 128),
                         lambda c, rows: (c, 0, 0, 0)),
        ],
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        make_kernel(step_packs, out_mode),
        out_shape=out_shape,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=15 * n_steps * step_packs * 128 * g,
            bytes_accessed=n_steps * step_packs * 4 * 128 * 4,
            transcendentals=n_steps * step_packs * 128 * g,
        ),
    )(rows, tgt_t, src)
    if out_mode == "steps":
        out = jax.ops.segment_sum(out, rows, num_segments=n_rows)
    return out


def main():
    rng = np.random.default_rng(0)
    n_rows, g = 4096, 256
    total_subs = 835_000  # N=1M measured near-sub total
    for step_packs in (4, 8, 16):
        subs_per_step = step_packs * 4
        # per-row counts ~ lognormal-ish around mean 204, padded per row
        counts = np.maximum(1, rng.poisson(204, n_rows))
        steps_per_row = -(-counts // subs_per_step)
        n_steps = int(steps_per_row.sum())
        rows = np.repeat(np.arange(n_rows), steps_per_row).astype(np.int32)
        tgt_t = rng.normal(size=(n_rows, 4, g)).astype(np.float32)
        src = rng.normal(
            size=(n_steps, step_packs, 4, 128)).astype(np.float32)
        a_rows, a_tgt, a_src = jnp.array(rows), jnp.array(tgt_t), jnp.array(src)
        for out_mode in ("rmw", "steps"):
            fn = functools.partial(run, step_packs=step_packs,
                                   out_mode=out_mode, n_rows=n_rows)
            out = fn(a_rows, a_tgt, a_src)
            force_sync(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(a_rows, a_tgt, a_src)
            force_sync(out)
            dt = (time.perf_counter() - t0) / 5
            pairs = n_steps * subs_per_step * 32 * g
            print(f"packs/step {step_packs:3d} out={out_mode:5s}: "
                  f"{dt*1e3:6.1f} ms  {n_steps:6d} steps  "
                  f"{dt/n_steps*1e9:6.0f} ns/step  {pairs/dt:.2e} pairs/s",
                  flush=True)


if __name__ == "__main__":
    main()
