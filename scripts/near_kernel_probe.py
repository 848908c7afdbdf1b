"""Isolate the near kernel's per-entry overhead on TPU.

Variants of the segmented VMEM-table kernel, all fed the SAME workload
(N=1M, leaf=256, theta=0.72 lists):

  A  shipped kernel (dynamic SMEM-indexed table reads, unroll 4)
  B  sequential table reads (row = k % rows) — isolates the dynamic-index
     and SMEM-read cost (keeps the loop + math)
  C  static row 0 — isolates the table-read entirely
  D  unroll 8
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation
from parallelnbody_tpu.ops import bh
from parallelnbody_tpu.utils.profiling import force_sync

LEAF, NB, FB, THETA = 256, 3584, 1536, 0.72


def make_kernel(mode, unroll):
    def kern(bnd_ref, idx_ref, tgt_ref, table_ref, out_ref, *, eps2):
        t = pl.program_id(0)
        lo = bnd_ref[t % 8, 0]
        hi = bnd_ref[t % 8, 1]
        rows = table_ref.shape[0]
        tgt = tgt_ref[0]
        xi = jnp.transpose(tgt[0:1, :])
        yi = jnp.transpose(tgt[1:2, :])
        zi = jnp.transpose(tgt[2:3, :])
        zeros = jnp.zeros((xi.shape[0], 1), xi.dtype)

        def one(k, carry):
            ax, ay, az = carry
            if mode == "A":
                row = idx_ref[t % 8, jnp.minimum(k, hi - 1)]
            elif mode == "B":
                row = jax.lax.rem(k, rows)
            else:
                row = 0
            src = table_ref[row]
            mj = src[3:4, :] * (k < hi).astype(src.dtype)
            dx = src[0:1, :] - xi
            dy = src[1:2, :] - yi
            dz = src[2:3, :] - zi
            r2 = dx * dx + dy * dy + dz * dz + eps2
            u = jax.lax.rsqrt(r2)
            w = (mj * u) * (u * u)
            return (ax + jnp.sum(w * dx, axis=1, keepdims=True),
                    ay + jnp.sum(w * dy, axis=1, keepdims=True),
                    az + jnp.sum(w * dz, axis=1, keepdims=True))

        def math(src, k, carry):
            ax, ay, az = carry
            mj = src[3:4, :] * (k < hi).astype(src.dtype)
            dx = src[0:1, :] - xi
            dy = src[1:2, :] - yi
            dz = src[2:3, :] - zi
            r2 = dx * dx + dy * dy + dz * dz + eps2
            u = jax.lax.rsqrt(r2)
            w = (mj * u) * (u * u)
            return (ax + jnp.sum(w * dx, axis=1, keepdims=True),
                    ay + jnp.sum(w * dy, axis=1, keepdims=True),
                    az + jnp.sum(w * dz, axis=1, keepdims=True))

        def body(c, carry):
            k0 = lo + c * unroll
            if mode == "E":
                srcs = [table_ref[idx_ref[t % 8, jnp.minimum(k0 + u, hi - 1)]]
                        for u in range(unroll)]
                for u in range(unroll):
                    carry = math(srcs[u], k0 + u, carry)
                return carry
            for u in range(unroll):
                carry = one(k0 + u, carry)
            return carry

        n_trips = (hi - lo + unroll - 1) // unroll
        ax, ay, az = jax.lax.fori_loop(0, n_trips, body, (zeros,) * 3)
        out_ref[0] = jnp.concatenate(
            [jnp.transpose(ax), jnp.transpose(ay), jnp.transpose(az),
             jnp.transpose(zeros)], axis=0)
    return kern


def main():
    st = init_simulation(SimConfig(
        n=1048576, ic="plummer", softening=0.01, force="barnes_hut",
        bh_leaf_size=LEAF, theta=THETA, bh_near_budget=NB, bh_far_budget=FB))
    prep = jax.jit(lambda p, m: bh._prepare(p, m, leaf_size=LEAF,
                                            curve="hilbert"))
    pos_s, mass_s, _, tree, _, _ = prep(st.pos, st.mass)
    n_leaves = int(pos_s.shape[0]) // LEAF
    _, rej = jax.jit(functools.partial(bh.traverse, theta=THETA))(tree)
    idx, valid, _, _, _ = jax.jit(functools.partial(
        bh.leaf_interactions, theta=THETA, start_leaf=0, n_slice=n_leaves,
        near_budget=NB, far0_budget=FB))(tree, rej)
    total_entries = int(jnp.sum(valid))
    print(f"entries: {total_entries} ({total_entries/n_leaves:.1f}/target)",
          flush=True)

    p4 = jnp.concatenate([pos_s, mass_s[:, None]], axis=1)
    p_t4_base = jnp.swapaxes(p4.reshape(n_leaves, LEAF, 4), 1, 2)
    counts = jnp.sum(valid, axis=1, dtype=jnp.int32)

    def make_bnd(rows_per_seg):
        bnds = [jnp.zeros((n_leaves,), jnp.int32)]
        for s in range(1, n_leaves // rows_per_seg):
            bnds.append(jnp.sum(valid & (idx < s * rows_per_seg), axis=1,
                                dtype=jnp.int32))
        bnds.append(counts)
        return jnp.stack(bnds, axis=1)

    tgt_t = jnp.swapaxes(
        jnp.concatenate([pos_s.reshape(n_leaves, LEAF, 3),
                         jnp.zeros((n_leaves, LEAF, 1))], -1), 1, 2)
    idx = idx.astype(jnp.int32)

    for name, mode, unroll in (("A dyn-idx u4", "A", 4),
                               ("F 8-row-aligned u4", "F", 4)):
        if mode == "F":
            # (L, 8, G) table: rows padded to a full native sublane tile.
            p_t4 = jnp.concatenate(
                [p_t4_base, jnp.zeros((n_leaves, 4, LEAF), jnp.float32)],
                axis=1)
            rows_per_seg = 512
        else:
            p_t4 = p_t4_base
            rows_per_seg = 1024
        bnd = make_bnd(rows_per_seg)
        n_comp = p_t4.shape[1]
        kern = make_kernel(mode if mode != "F" else "A", unroll)

        @jax.jit
        def f(bnd, idx, tgt_t, p_t4, rows_per_seg=rows_per_seg,
              n_comp=n_comp, kern=kern):
            out = jnp.zeros_like(tgt_t)
            for s in range(n_leaves // rows_per_seg):
                table = jax.lax.slice_in_dim(p_t4, s * rows_per_seg,
                                             (s + 1) * rows_per_seg, axis=0)
                pair = jax.lax.slice_in_dim(bnd, s, s + 2, axis=1)
                out = out + pl.pallas_call(
                    functools.partial(kern, eps2=1e-4),
                    out_shape=jax.ShapeDtypeStruct((n_leaves, 4, LEAF),
                                                   jnp.float32),
                    grid=(n_leaves,),
                    in_specs=[
                        pl.BlockSpec((8, 2), lambda t: (t // 8, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((8, NB), lambda t: (t // 8, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((1, 4, LEAF), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((rows_per_seg, n_comp, LEAF),
                                     lambda t: (0, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, 4, LEAF), lambda t: (t, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(pair, idx, tgt_t, table)
            return out

        out = f(bnd, idx, tgt_t, p_t4)
        force_sync(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(bnd, idx, tgt_t, p_t4)
        force_sync(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"{name}: {dt*1e3:.1f} ms  ({dt/total_entries*1e9:.0f} ns/entry,"
              f" {total_entries*LEAF*LEAF/dt:.2e} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
