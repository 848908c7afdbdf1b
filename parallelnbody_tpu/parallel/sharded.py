"""Sharded simulation step: the full integrator under shard_map over a mesh.

This is the multi-chip training-step equivalent: particle state sharded along
the ring axis, forces via the ppermute ring (parallel/ring.py), integration
elementwise on local shards, diagnostics via psum. One jit compiles the whole
step; XLA lowers the ppermutes to ICI collective-permutes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.state import SimState
from parallelnbody_tpu.ops.integrators import get_integrator
from parallelnbody_tpu.parallel.mesh import state_pspecs, RING_AXIS
from parallelnbody_tpu.parallel.ring import ring_accel


def _make_tile_fn(cfg: SimConfig, n_local: int):
    """Per-ring-pass tile kernel: Pallas on TPU, jnp elsewhere."""
    method = cfg.resolve_force()
    if method == "direct_pallas":
        from parallelnbody_tpu.ops.pallas_direct import make_pallas_tile_fn

        return make_pallas_tile_fn(cfg)
    return None  # ring_accel defaults to the jnp tile


def _bh_sharded_accel(pos_local, mass_local, cfg: SimConfig, axis: str,
                      with_overflow: bool = False):
    """Multi-chip Barnes-Hut: replicated tree, partitioned target leaves
    (SURVEY.md §7 stage 6).

    Every chip all-gathers (pos, mass) over ICI, redundantly sorts and builds
    the monopole pyramid (compute is cheap and replicated => zero comm), then
    evaluates far+near kernels only for its ~1/P slice of target leaves (any
    rank count: trailing windows clamp and overlap; slice_row_of_sorted maps
    each sorted index to its canonical slice row). The slice results are
    all-gathered back and each chip picks the rows of its own particles via
    the (replicated) sort permutation. Comm per force evaluation: two
    all_gathers of ~N*16 bytes.

    with_overflow=True additionally returns the psum'd list-budget overflow
    counter (clipped entries are degraded forces — see ops/bh.py)."""
    from parallelnbody_tpu.ops.bh import (
        bh_accel_target_slice, plan_tree, slice_row_of_sorted, use_pallas_bh)

    n_ranks = jax.lax.axis_size(axis)
    rank = jax.lax.axis_index(axis)
    n_local = pos_local.shape[0]

    pos_all = jax.lax.all_gather(pos_local, axis, axis=0, tiled=True)
    mass_all = jax.lax.all_gather(mass_local, axis, axis=0, tiled=True)

    acc_sl, pot_sl, perm, overflow = bh_accel_target_slice(
        pos_all, mass_all, rank, n_ranks,
        leaf_size=cfg.resolve_bh_leaf_size(), theta=cfg.theta, g=cfg.g,
        softening=cfg.softening, near_budget=cfg.resolve_bh_near_budget(),
        far0_budget=cfg.resolve_bh_far_budget(),
        use_pallas=use_pallas_bh(), curve=cfg.bh_curve,
        multipole=cfg.bh_multipole, max_levels=cfg.bh_max_levels,
        refine=cfg.resolve_bh_refine(),
        cand_budgets=(cfg.bh_cand2_budget, cfg.bh_cand_budget),
        far_mode=getattr(cfg, "bh_far_mode", "auto"),
    )
    acc_g = jax.lax.all_gather(acc_sl, axis, axis=0, tiled=True)
    pot_g = jax.lax.all_gather(pot_sl, axis, axis=0, tiled=True)

    n_leaves, _, _ = plan_tree(pos_all.shape[0],
                               cfg.resolve_bh_leaf_size(), cfg.bh_max_levels)
    inv_perm = jnp.argsort(perm)  # replicated: sorted position of each orig id
    my_ids = rank * n_local + jnp.arange(n_local)
    rows = slice_row_of_sorted(inv_perm[my_ids], n_leaves, n_ranks,
                               cfg.resolve_bh_leaf_size())
    if with_overflow:
        total_overflow = jax.lax.psum(overflow, axis)
        return acc_g[rows], pot_g[rows], total_overflow
    return acc_g[rows], pot_g[rows]


def make_sharded_step(cfg: SimConfig, mesh: Mesh, axis: str = RING_AXIS,
                      report_overflow: bool = False) -> Callable:
    """Jitted step(state)->state for a particle-sharded state on `mesh`.

    report_overflow=True: step(state) -> (state, overflow) with the psum'd
    Barnes-Hut budget/exchange clip counter summed over the step's force
    evaluations (always zero for the ring all-pairs path, which has no
    budgets) — so mid-run clipping on the sharded paths is surfaced, not
    just the t=0 audit (VERDICT r2 #4, ADVICE r2 #2)."""
    integrator = get_integrator(cfg.integrator)
    specs = state_pspecs(axis)

    def local_step(state: SimState):
        of_cell = [jnp.zeros((), jnp.int32)]
        if cfg.resolve_force() == "barnes_hut" and cfg.bh_distributed:
            from parallelnbody_tpu.parallel.distributed import dist_bh_accel

            def accel_fn(pos):
                acc, pot, of = dist_bh_accel(pos, state.mass, cfg, axis)
                of_cell[0] = of_cell[0] + of  # dist_bh_accel already psums
                return acc, pot
        elif cfg.resolve_force() == "barnes_hut":
            def accel_fn(pos):
                acc, pot, of = _bh_sharded_accel(pos, state.mass, cfg, axis,
                                                 with_overflow=True)
                of_cell[0] = of_cell[0] + of
                return acc, pot
        else:
            tile_fn = _make_tile_fn(cfg, state.n)

            def accel_fn(pos):
                return ring_accel(
                    pos, state.mass, g=cfg.g, softening=cfg.softening,
                    axis=axis, tile_fn=tile_fn,
                )

        dt = jnp.asarray(cfg.dt, state.pos.dtype)
        pos, vel, acc, pot = integrator(
            accel_fn, state.pos, state.vel, state.acc, state.pot, dt
        )
        out = state._replace(
            pos=pos, vel=vel, acc=acc, pot=pot,
            time=state.time + dt, step=state.step + 1,
        )
        return (out, of_cell[0]) if report_overflow else out

    out_specs = (specs, P()) if report_overflow else specs
    sharded = shard_map(
        local_step, mesh=mesh, in_specs=(specs,), out_specs=out_specs,
        check_vma=False,
    )
    # cfg.donate_state: same capacity lever as the single-chip paths
    # (api._state_jit) — each chip's N/P shard of the input state is handed
    # to XLA instead of staying live across the call. Callers rebind.
    if cfg.donate_state:
        return jax.jit(sharded, donate_argnums=0)
    return jax.jit(sharded)


def make_sharded_run(cfg: SimConfig, mesh: Mesh, n_steps: int, axis: str = RING_AXIS):
    """n_steps sharded steps fused into one jitted lax.scan."""
    # Donation belongs on the OUTER jit only: inside the scan the step sees
    # traced values, where an inner donate_argnums is meaningless noise.
    step = make_sharded_step(cfg.replace(donate_state=False), mesh, axis)

    # Scan over the already-shard_mapped step: state shardings are preserved
    # by jit, so the collectives stay inside one compiled program.
    def run(state: SimState) -> SimState:
        def body(s, _):
            return step(s), None

        state, _ = jax.lax.scan(body, state, length=n_steps)
        return state

    if cfg.donate_state:
        return jax.jit(run, donate_argnums=0)
    return jax.jit(run)


def sharded_bh_overflow(cfg: SimConfig, mesh: Mesh, state: SimState,
                        axis: str = RING_AXIS) -> int:
    """Total BH list-budget overflow across the mesh for a sharded state.

    The budget-audit side channel for multi-chip Barnes-Hut runs: clipped
    interaction-list entries silently degrade forces (ops/bh.py's contract is
    that overflow is reported, never dropped), so call this before a long
    sharded run. Overlapping trailing rank windows may double-count a clipped
    leaf; the counter is a warning signal, zero means exactly zero."""
    specs = state_pspecs(axis)

    def local(state: SimState):
        if cfg.bh_distributed:
            from parallelnbody_tpu.parallel.distributed import dist_bh_accel

            _, _, overflow = dist_bh_accel(state.pos, state.mass, cfg, axis)
        else:
            _, _, overflow = _bh_sharded_accel(state.pos, state.mass, cfg,
                                               axis, with_overflow=True)
        return overflow

    fn = shard_map(local, mesh=mesh, in_specs=(specs,), out_specs=P(),
                   check_vma=False)
    return int(jax.device_get(jax.jit(fn)(state)))


def sharded_init_accel(cfg: SimConfig, mesh: Mesh, state: SimState, axis: str = RING_AXIS) -> SimState:
    """Fill acc/pot of a freshly sharded state (before the first step).

    Also applies cfg.virialize to a fresh (step 0) state: every sharded
    init path computes the real potential here (the slice/distributed
    accels ignore track_potential), and centralizing the rescale keeps
    bench/probe callers from silently dropping the flag the way only
    cmd_run used to apply it."""
    specs = state_pspecs(axis)

    def local_init(state: SimState) -> SimState:
        if cfg.resolve_force() == "barnes_hut" and cfg.bh_distributed:
            from parallelnbody_tpu.parallel.distributed import dist_bh_accel

            acc, pot, _ = dist_bh_accel(state.pos, state.mass, cfg, axis)
        elif cfg.resolve_force() == "barnes_hut":
            acc, pot = _bh_sharded_accel(state.pos, state.mass, cfg, axis)
        else:
            tile_fn = _make_tile_fn(cfg, state.n)
            acc, pot = ring_accel(
                state.pos, state.mass, g=cfg.g, softening=cfg.softening,
                axis=axis, tile_fn=tile_fn,
            )
        return state._replace(acc=acc, pot=pot)

    fn = shard_map(local_init, mesh=mesh, in_specs=(specs,), out_specs=specs,
                   check_vma=False)
    out = jax.jit(fn)(state)
    if cfg.virialize and int(jax.device_get(state.step)) == 0:
        from parallelnbody_tpu.api import virialize_state

        # Pure elementwise + global reductions: runs on the sharded global
        # arrays directly (XLA inserts the psums under jit).
        out = jax.jit(virialize_state)(out)
    return out
