"""Micro-profile the internals of leaf_interactions at N=1M shapes on TPU."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation
from parallelnbody_tpu.ops import bh
from parallelnbody_tpu.utils.profiling import force_sync

LEAF, NEAR_B, FAR_B, THETA = 256, 512, 2048, 0.7


def timeit(fn, *args, iters=5):
    out = fn(*args)
    force_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = SimConfig(n=1048576, ic="plummer", softening=0.01, dt=1e-4,
                    force="barnes_hut", theta=THETA, bh_leaf_size=LEAF,
                    bh_near_budget=NEAR_B, bh_far_budget=FAR_B, bh_multipole=2)
    state = init_simulation(cfg)
    prep = jax.jit(lambda p, m: bh._prepare(p, m, leaf_size=LEAF,
                                            curve="hilbert", multipole_order=2))
    pos_s, mass_s, perm, tree, n, n_pad = prep(state.pos, state.mass)
    n_pad = int(pos_s.shape[0])
    far_masks, rejects_l1 = jax.jit(
        functools.partial(bh.traverse, theta=THETA))(tree)
    n_leaves = n_pad // LEAF
    branch = n_leaves // tree.com[1].shape[0]
    l1_budget = -(-(NEAR_B + FAR_B) // branch)

    # ---- stage A: l1 compact
    cols_shape = rejects_l1.shape

    @jax.jit
    def stage_a(rej):
        cols = jax.lax.broadcasted_iota(jnp.int32, cols_shape, 1)
        return bh._row_compact(rej, cols, l1_budget)

    t_a = timeit(stage_a, rejects_l1)
    idx1, valid1, of1 = stage_a(rejects_l1)
    print(f"A l1-compact {rejects_l1.shape}->{l1_budget}: {t_a*1e3:.1f} ms",
          flush=True)

    # ---- stage B: expand to candidates
    @jax.jit
    def stage_b(idx1, valid1):
        cand = (idx1[:, :, None] * branch
                + jnp.arange(branch, dtype=jnp.int32)[None, None, :]
                ).reshape(n_leaves, -1)
        cand_valid = jnp.repeat(valid1, branch, axis=1)
        return cand, cand_valid

    t_b = timeit(stage_b, idx1, valid1)
    cand, cand_valid = stage_b(idx1, valid1)
    print(f"B expand -> {cand.shape}: {t_b*1e3:.1f} ms", flush=True)

    # ---- stage C: leaf MAC over candidates (gathers from (3, n_leaves))
    leaf_com, leaf_r = tree.com[0], tree.radius[0]

    @jax.jit
    def stage_c(cand):
        leaf_com_t = leaf_com.T
        d2 = jnp.zeros(cand.shape, leaf_com.dtype)
        for c in range(3):
            dc = leaf_com_t[c][cand] - leaf_com[:, c][:, None]
            d2 = d2 + dc * dc
        c_r = leaf_r[cand]
        d = jnp.sqrt(d2)
        return (bh.MAC_SIZE_SCALE * c_r) < (THETA * (d - leaf_r[:, None]))

    t_c = timeit(stage_c, cand)
    mac0 = stage_c(cand)
    print(f"C mac gathers {cand.shape}: {t_c*1e3:.1f} ms", flush=True)

    # ---- stage D: near compact
    @jax.jit
    def stage_d(cand, cand_valid, mac0):
        return bh._row_compact(cand_valid & ~mac0, cand, NEAR_B)

    t_d = timeit(stage_d, cand, cand_valid, mac0)
    print(f"D near-compact {cand.shape}->{NEAR_B}: {t_d*1e3:.1f} ms", flush=True)

    # ---- stage E: far compact
    @jax.jit
    def stage_e(cand, cand_valid, mac0):
        return bh._row_compact(cand_valid & mac0, cand, FAR_B)

    t_e = timeit(stage_e, cand, cand_valid, mac0)
    print(f"E far-compact {cand.shape}->{FAR_B}: {t_e*1e3:.1f} ms", flush=True)

    # ---- raw row-sort reference
    @jax.jit
    def raw_sort(x):
        return jax.lax.sort(x, dimension=1)

    keys = jnp.where(cand_valid, cand, jnp.iinfo(jnp.int32).max)
    t_s = timeit(raw_sort, keys)
    print(f"raw row sort {keys.shape} int32: {t_s*1e3:.1f} ms", flush=True)

    # ---- whole leaf_interactions for reference
    li = jax.jit(functools.partial(
        bh.leaf_interactions, theta=THETA, start_leaf=0, n_slice=n_leaves,
        near_budget=NEAR_B, far0_budget=FAR_B))
    t_li = timeit(li, tree, rejects_l1)
    print(f"TOTAL leaf_interactions: {t_li*1e3:.1f} ms "
          f"(A+B+C+D+E = {(t_a+t_b+t_c+t_d+t_e)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
