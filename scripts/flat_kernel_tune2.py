"""Flat-CSR near kernel, round 2: wide accumulators.

The round-1 prototype spent ~60% of each pack on 4 lane-reductions
((256,128)->(256,1) is 7 shuffle steps each). Here the accumulators stay
(G, 128)-wide and are reduced once:
  * "step":  reduce at the end of each grid step (simple, keeps RMW out).
  * "row":   accumulate in VMEM scratch across steps; on the row's LAST
             step (lookahead on the prefetched rows), reduce + write the
             out block once per row.
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


def make_kernel(step_packs, mode, g, compute_pot=True, eps2=1e-2):
    def body(tgt, src_ref, ax, ay, az, sp):
        xi = jnp.transpose(tgt[0:1, :])
        yi = jnp.transpose(tgt[1:2, :])
        zi = jnp.transpose(tgt[2:3, :])
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
            ax = ax + w * dx
            ay = ay + w * dy
            az = az + w * dz
            if compute_pot:
                sp = sp + mu
        return ax, ay, az, sp

    def reduce_out(ax, ay, az, sp):
        return jnp.concatenate(
            [jnp.transpose(jnp.sum(ax, 1, keepdims=True)),
             jnp.transpose(jnp.sum(ay, 1, keepdims=True)),
             jnp.transpose(jnp.sum(az, 1, keepdims=True)),
             jnp.transpose(jnp.sum(sp, 1, keepdims=True))], axis=0)

    if mode == "step":
        def kernel(rows_ref, tgt_ref, src_ref, out_ref):
            c = pl.program_id(0)
            row = rows_ref[c]
            prev = rows_ref[jnp.maximum(c, 1) - 1]

            @pl.when((c == 0) | (row != prev))
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            z = jnp.zeros((g, 128), jnp.float32)
            ax, ay, az, sp = body(tgt_ref[0], src_ref, z, z, z, z)
            out_ref[0] = out_ref[0] + reduce_out(ax, ay, az, sp)
        return kernel, None

    def kernel(rows_ref, tgt_ref, src_ref, out_ref, acc_ref):
        c = pl.program_id(0)
        row = rows_ref[c]
        prev = rows_ref[jnp.maximum(c, 1) - 1]
        n = pl.num_programs(0)
        nxt = rows_ref[jnp.minimum(c + 1, n - 1)]

        @pl.when((c == 0) | (row != prev))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        ax, ay, az, sp = body(tgt_ref[0], src_ref, acc_ref[0], acc_ref[1],
                              acc_ref[2], acc_ref[3])
        last = (c == n - 1) | (row != nxt)

        @pl.when(last)
        def _():
            out_ref[0] = reduce_out(ax, ay, az, sp)

        @pl.when(~last)
        def _():
            acc_ref[0] = ax
            acc_ref[1] = ay
            acc_ref[2] = az
            acc_ref[3] = sp

    scratch = [pltpu.VMEM((4, g, 128), jnp.float32)]
    return kernel, scratch


@functools.partial(jax.jit, static_argnames=("step_packs", "mode", "n_rows"))
def run(rows, tgt_t, src, *, step_packs, mode, n_rows):
    n_steps = rows.shape[0]
    g = tgt_t.shape[2]
    kernel, scratch = make_kernel(step_packs, mode, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 4, g), lambda c, rows: (rows[c], 0, 0)),
            pl.BlockSpec((1, step_packs, 4, 128),
                         lambda c, rows: (c, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, g), lambda c, rows: (rows[c], 0, 0)),
        scratch_shapes=scratch or [],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, 4, g), tgt_t.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=15 * n_steps * step_packs * 128 * g,
            bytes_accessed=n_steps * step_packs * 4 * 128 * 4,
            transcendentals=n_steps * step_packs * 128 * g,
        ),
    )(rows, tgt_t, src)


def main():
    rng = np.random.default_rng(0)
    n_rows, g = 4096, 256

    # correctness vs the step-reduced rmw variant at tiny size (on-device)
    counts = np.maximum(1, rng.poisson(6, 64))
    for step_packs in (4, 8, 16):
        spr = -(-counts // (step_packs * 4))
        rows = np.repeat(np.arange(64), spr).astype(np.int32)
        tgt = rng.normal(size=(64, 4, g)).astype(np.float32)
        src = rng.normal(
            size=(rows.shape[0], step_packs, 4, 128)).astype(np.float32)
        outs = {m: run(jnp.array(rows), jnp.array(tgt), jnp.array(src),
                       step_packs=step_packs, mode=m, n_rows=64)
                for m in ("step", "row")}
        err = float(jnp.max(jnp.abs(outs["step"] - outs["row"])))
        print(f"packs {step_packs}: step-vs-row max diff {err:.2e}",
              flush=True)
        assert err < 1e-3

    for step_packs in (8, 16):
        subs_per_step = step_packs * 4
        counts = np.maximum(1, rng.poisson(204, n_rows))
        steps_per_row = -(-counts // subs_per_step)
        n_steps = int(steps_per_row.sum())
        rows = np.repeat(np.arange(n_rows), steps_per_row).astype(np.int32)
        tgt_t = rng.normal(size=(n_rows, 4, g)).astype(np.float32)
        src = rng.normal(
            size=(n_steps, step_packs, 4, 128)).astype(np.float32)
        a = (jnp.array(rows), jnp.array(tgt_t), jnp.array(src))
        for mode in ("step", "row"):
            fn = functools.partial(run, step_packs=step_packs, mode=mode,
                                   n_rows=n_rows)
            out = fn(*a)
            force_sync(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(*a)
            force_sync(out)
            dt = (time.perf_counter() - t0) / 5
            pairs = n_steps * subs_per_step * 32 * g
            print(f"packs/step {step_packs:3d} mode={mode:4s}: "
                  f"{dt*1e3:6.1f} ms  {n_steps:6d} steps  "
                  f"{dt/n_steps*1e9:6.0f} ns/step  {pairs/dt:.2e} pairs/s",
                  flush=True)


if __name__ == "__main__":
    main()
