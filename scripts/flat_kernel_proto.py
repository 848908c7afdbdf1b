"""Prototype: flat-CSR packed near-field Pallas kernel.

Work list formulation: the near field is a flat list of (target row, source
pack) work items, CSR-grouped by target row. Each grid step processes
STEP_PACKS packs of 4 sub-tiles (each sub-tile = 32 particles packed as one
(4, 128) component block) against its row's (4, G) target tile. The row id
per step is scalar-prefetched, so the target/out block index maps are
data-dependent; rows must be ascending and every row must own >= 1 step.

Checks interpret-mode correctness vs a jnp reference, then (on TPU) times
the kernel at the N=1M work-list scale.
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

SUB = 32            # particles per sub-tile
PACK = 4            # subs per (4, 128) block
STEP_PACKS = 4      # packs per grid step


def kernel(rows_ref, tgt_ref, src_ref, out_ref, *, eps2, guard_zero,
           compute_pot):
    c = pl.program_id(0)
    row = rows_ref[c]
    prev = rows_ref[jnp.maximum(c, 1) - 1]

    @pl.when((c == 0) | (row != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tgt = tgt_ref[0]                      # (4, G)
    xi = jnp.transpose(tgt[0:1, :])       # (G, 1)
    yi = jnp.transpose(tgt[1:2, :])
    zi = jnp.transpose(tgt[2:3, :])
    g_t = xi.shape[0]
    ax = jnp.zeros((g_t, 1), xi.dtype)
    ay = jnp.zeros((g_t, 1), xi.dtype)
    az = jnp.zeros((g_t, 1), xi.dtype)
    sp = jnp.zeros((g_t, 1), xi.dtype)
    for j in range(STEP_PACKS):
        src = src_ref[0, j]               # (4, 128)
        xj = src[0:1, :]
        yj = src[1:2, :]
        zj = src[2:3, :]
        mj = src[3:4, :]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2
        u = jax.lax.rsqrt(r2)
        if guard_zero:
            u = jnp.where(r2 > 0.0, u, 0.0)
        mu = mj * u
        w = mu * (u * u)
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        if compute_pot:
            sp = sp + jnp.sum(mu, axis=1, keepdims=True)
    acc = jnp.concatenate([jnp.transpose(ax), jnp.transpose(ay),
                           jnp.transpose(az), jnp.transpose(sp)], axis=0)
    out_ref[0] = out_ref[0] + acc


@functools.partial(jax.jit, static_argnames=("eps2", "guard_zero",
                                             "compute_pot", "interpret"))
def flat_near(rows, tgt_t, src, *, eps2, guard_zero=False, compute_pot=True,
              interpret=False):
    """rows: (n_steps,) int32 ascending, covering every row; tgt_t: (Ls,4,G);
    src: (n_steps, STEP_PACKS, 4, 128) -> (Ls, 4, G) accumulated sums."""
    n_steps = rows.shape[0]
    n_rows, _, g = tgt_t.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 4, g), lambda c, rows: (rows[c], 0, 0)),
            pl.BlockSpec((1, STEP_PACKS, 4, 128), lambda c, rows: (c, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, g), lambda c, rows: (rows[c], 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(kernel, eps2=eps2, guard_zero=guard_zero,
                          compute_pot=compute_pot),
        out_shape=jax.ShapeDtypeStruct((n_rows, 4, g), tgt_t.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=15 * n_steps * STEP_PACKS * 128 * g,
            bytes_accessed=n_steps * STEP_PACKS * 4 * 128 * 4,
            transcendentals=n_steps * STEP_PACKS * 128 * g,
        ),
        interpret=interpret,
    )(rows, tgt_t, src)


def reference(rows, tgt_t, src, eps2):
    """jnp reference of the same work list."""
    n_steps = rows.shape[0]
    out = jnp.zeros_like(tgt_t)
    tgt = jnp.swapaxes(tgt_t, 1, 2)  # (Ls, G, 4)
    for c in range(n_steps):
        t = int(rows[c])
        xi = tgt[t, :, :3]                        # (G, 3)
        blk = src[c].reshape(4, 4 * 128)          # wrong orientation fix below
        # src[c]: (PACKS, 4, 128) -> components stacked per pack
        acc = jnp.zeros((xi.shape[0], 3))
        pot = jnp.zeros((xi.shape[0],))
        for j in range(STEP_PACKS):
            comp = src[c, j]                      # (4, 128)
            pj = comp[:3].T                       # (128, 3)
            mj = comp[3]
            d = pj[None] - xi[:, None]            # (G, 128, 3)
            r2 = jnp.sum(d * d, -1) + eps2
            u = jax.lax.rsqrt(r2)
            w = mj[None] * u * u * u
            acc = acc + jnp.sum(w[..., None] * d, axis=1)
            pot = pot + jnp.sum(mj[None] * u, axis=1)
        out = out.at[t, :3].add(acc.T)
        out = out.at[t, 3].add(pot)
    return out


def correctness():
    rng = np.random.default_rng(0)
    n_rows, g = 5, 256
    steps_per_row = [1, 3, 2, 1, 4]
    rows = np.repeat(np.arange(n_rows), steps_per_row).astype(np.int32)
    n_steps = rows.shape[0]
    tgt_t = rng.normal(size=(n_rows, 4, g)).astype(np.float32)
    src = rng.normal(size=(n_steps, STEP_PACKS, 4, 128)).astype(np.float32)
    src[:, :, 3] = np.abs(src[:, :, 3])  # masses positive
    out = flat_near(jnp.array(rows), jnp.array(tgt_t), jnp.array(src),
                    eps2=1e-2, interpret=True)
    ref = reference(jnp.array(rows), jnp.array(tgt_t), jnp.array(src), 1e-2)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f"interpret correctness: rel err {err:.2e}", flush=True)
    assert err < 1e-5, err


def bench():
    if jax.default_backend() != "tpu":
        print("no TPU; skipping bench", flush=True)
        return
    from parallelnbody_tpu.utils.profiling import force_sync

    # N=1M scale: 8.35e5 subs -> ~2.1e5 packs -> ~5.5e4 steps (padded)
    rng = np.random.default_rng(0)
    n_rows, g = 4096, 256
    n_steps = 56320
    # ascending rows covering all rows, ~13.75 steps/row
    rows = np.sort(rng.integers(0, n_rows, n_steps - n_rows)).astype(np.int32)
    rows = np.sort(np.concatenate([rows, np.arange(n_rows, dtype=np.int32)]))
    tgt_t = rng.normal(size=(n_rows, 4, g)).astype(np.float32)
    src = rng.normal(size=(n_steps, STEP_PACKS, 4, 128)).astype(np.float32)
    args = (jnp.array(rows), jnp.array(tgt_t), jnp.array(src))
    fn = functools.partial(flat_near, eps2=1e-2)
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    dt = (time.perf_counter() - t0) / iters
    pairs = n_steps * STEP_PACKS * 128 * g
    print(f"TPU flat kernel: {dt*1e3:.1f} ms for {pairs:.2e} pairs "
          f"= {pairs/dt:.2e} pairs/s", flush=True)


if __name__ == "__main__":
    correctness()
    bench()
