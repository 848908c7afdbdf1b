"""Simulation API — the TPU-native equivalent of the reference's actor layer.

Reference (L3, SURVEY.md §1): `AOctreeSearch` owns the particle array and
exposes CreateSpacePoints / CreateOctree / CleanParticles plus a per-frame
Tick (OctreeSearch.h:111-149, .cpp:21-97). Here the equivalents are pure
functions over a SimState pytree:

    init_simulation(cfg)        ~ CreateSpacePoints  (.cpp:58-72)
    make_step(cfg)              ~ Tick's physics body (.cpp:25-31), jitted
    make_run(cfg, k)            ~ k Ticks fused into one lax.scan
    Simulation.reset()          ~ CleanParticles + CreateSpacePoints (.cpp:91-97)

Pausing (`PhDeltaTime <= 0` gate, .cpp:25) is a host-loop concern: you simply
do not call step().
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.state import SimState, make_state
from parallelnbody_tpu.models import get_ic
from parallelnbody_tpu.ops.integrators import get_integrator
from parallelnbody_tpu.ops import energy as energy_ops
from parallelnbody_tpu.utils.cache import enable_compile_cache


# --------------------------------------------------------------------- forces
def make_accel_fn(cfg: SimConfig, mass: jax.Array,
                  overflow_cell: list | None = None) -> Callable:
    """Return accel_fn(pos) -> (acc, pot) for the configured force method.

    overflow_cell: optional one-element list accumulating the Barnes-Hut
    list-budget overflow counter of every evaluation (ops/bh.py
    make_bh_accel). The direct methods have no budgets and leave it at zero.
    """
    method = cfg.resolve_force()
    if method == "direct":
        from parallelnbody_tpu.ops.direct import direct_accel

        n = mass.shape[0]
        # Bound memory for medium N in plain jnp: stream row tiles (largest
        # power-of-two divisor of N up to 1024; N <= 2048 fits unblocked).
        tile = 0
        if n > 2048:
            tile = 1
            for t in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2):
                if n % t == 0:
                    tile = t
                    break
        return lambda pos: direct_accel(pos, mass, g=cfg.g, softening=cfg.softening, tile=tile)
    if method == "direct_pallas":
        from parallelnbody_tpu.ops.pallas_direct import make_pallas_accel

        return make_pallas_accel(cfg, mass)
    if method == "barnes_hut":
        from parallelnbody_tpu.ops.bh import make_bh_accel

        return make_bh_accel(cfg, mass, overflow_cell=overflow_cell)
    raise ValueError(f"unknown force method {method!r}")


# ----------------------------------------------------------------------- init
def virialize_state(state: SimState) -> SimState:
    """Rescale speeds so 2K = -W using state.pot — turns approximately-
    sampled models (hernquist/king/nfw/...) into virial equilibria without
    per-model distribution functions. Pure elementwise + reductions, so it
    works on sharded global arrays too (the sharded init path calls it
    AFTER sharded_init_accel fills pot)."""
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel * state.vel, axis=-1))
    w = 0.5 * jnp.sum(state.mass * state.pot)
    scale = jnp.sqrt(jnp.maximum(-w, 1e-30) / jnp.maximum(2.0 * ke, 1e-30))
    return state._replace(vel=state.vel * scale)


def init_simulation(cfg: SimConfig, key: jax.Array | None = None,
                    compute_forces: bool = True) -> SimState:
    """Generate ICs and evaluate initial forces (so leapfrog can start).

    compute_forces=False skips the SINGLE-CHIP force evaluation (acc/pot
    stay zero) — required for sharded runs, whose whole point can be N
    beyond one chip's memory: the caller shards the fresh state and fills
    acc/pot with parallel.sharded.sharded_init_accel instead (then
    virialize_state if cfg.virialize). cli.cmd_run does exactly this."""
    enable_compile_cache(cfg.compile_cache_dir)
    if key is None:
        key = jax.random.key(cfg.seed)
    k_ic, k_state = jax.random.split(key)
    pos, vel, mass = get_ic(cfg.ic)(k_ic, cfg)
    state = make_state(pos, vel, mass, key=k_state, dtype=jnp.dtype(cfg.dtype))
    if not compute_forces:
        return state
    return _fill_initial_forces(cfg, state)


def _fill_initial_forces(cfg: SimConfig, state: SimState) -> SimState:
    """t=0 single-chip force evaluation (+ virialization) for a fresh state."""
    accel_cfg = cfg
    if cfg.virialize and not cfg.track_potential:
        # virialize_state needs the REAL potential: with the run's own
        # track_potential=False the BH/Pallas paths return pot=0, and the
        # rescale would silently crush velocities to ~sqrt(1e-30/2K).
        # Force it on for this one t=0 evaluation only (make_step keeps
        # the run's setting).
        accel_cfg = cfg.replace(track_potential=True)
    accel_fn = make_accel_fn(accel_cfg, state.mass)
    acc, pot = accel_fn(state.pos)
    state = state._replace(acc=acc, pot=pot)
    if cfg.virialize:
        state = virialize_state(state)
    return state


def calibrate_budgets(cfg: SimConfig, state: SimState,
                      headroom: float = 1.25,
                      n_ranks: int | None = None) -> SimConfig:
    """Resolve bh_*_budget = 0 (auto) fields by MEASURING this state's exact
    per-target interaction-list requirements (ops/bh.py
    measure_budget_requirements) and adding `headroom` for evolution, so a
    fresh IC at an untuned N runs overflow-free without hand-tuned budgets
    (VERDICT r4 #2 — the auto-cand2 clip at 4M shipped a 0.197-rms bench
    row for a round; budgets derived from the actual t=0 geometry kill that
    bug class). Explicitly-set (nonzero) budgets are respected untouched.

    The measurement is single-chip (one traversal-shaped compile); callers
    whose N exceeds one chip's memory (the sharded/distributed CLI paths)
    skip calibration and fall back to the conservative static defaults
    (SimConfig.resolve_bh_*_budget) or explicit values. t=0 maxima can grow
    as the system evolves (a collapsing merger packs more near leaves per
    target) — the headroom covers the measured drift on the shipped
    configs, and the per-step/per-segment overflow counter remains the
    loud guard either way.

    n_ranks: stating the distributed rank count additionally calibrates
    the LET import budget (bh_distributed + bh_comm="let" +
    bh_import_budget=0): the measured per-owner-pair essential-leaf
    maximum replaces the runtime full-width auto, restoring O(halo)/rank
    import memory/comm on ICs whose essential set is local
    (ops/bh.py measure_import_requirement). Leave n_ranks unset to keep
    the always-overflow-free full neighbor width.

    Returns cfg with concrete budgets (a no-op for non-Barnes-Hut forces
    or when every auto field was explicit)."""
    if cfg.resolve_force() != "barnes_hut":
        return cfg
    from parallelnbody_tpu.ops.bh import measure_budget_requirements

    want_near = cfg.bh_near_budget == 0
    want_far = cfg.bh_far_budget == 0
    staged = cfg.resolve_bh_refine() == "staged"
    want_c2 = staged and cfg.bh_cand2_budget == 0
    want_c1 = staged and cfg.bh_cand_budget == 0
    # LET import budget (distributed near-field exchange): only measurable
    # when the caller states the rank count — the runtime auto (0) stays
    # the always-overflow-free full neighbor width (parallel/distributed.py
    # module docs: the memory-honest default).
    want_imp = (n_ranks is not None and n_ranks > 1 and cfg.bh_distributed
                and cfg.bh_comm == "let" and cfg.bh_import_budget == 0)
    want_lists = want_near or want_far or want_c2 or want_c1
    if not (want_lists or want_imp):
        return cfg
    if want_lists:
        req = measure_budget_requirements(state.pos, state.mass, cfg)

    def pad(x, mult):
        # Relative headroom AND one full lane of absolute slack: 1.25x
        # alone can land exactly on a multiple (8M r5: near_max 205 ->
        # 256 exactly, and a +0.4% geometry drift clipped 29 entries six
        # steps into the bench), leaving zero real margin after rounding.
        target = max(int(x * headroom), int(x) + mult)
        return max(mult, -(-target // mult) * mult)

    kw = {}
    if want_lists:
        if want_near:
            kw["bh_near_budget"] = min(pad(req["near_max"], 128),
                                       req["n_leaves"])
        if want_far:
            kw["bh_far_budget"] = pad(req["far_max"], 128)
        # Only meaningful when the measurement actually ran the staged
        # pipeline (resolve_refine can fall back to dense on shallow trees).
        if req["refine"] == "staged":
            if want_c2:
                kw["bh_cand2_budget"] = pad(req["cand2_max"], 64)
            if want_c1:
                kw["bh_cand_budget"] = pad(req["cand1_max"], 64)
    if want_imp:
        # Measure with the just-calibrated (concrete) list budgets so the
        # probe lists cannot clip; the import count is a per-owner-pair
        # DISTINCT-leaf maximum over a sample-sort partition proxy
        # (measure_import_requirement docs). The proxy tiles exactly
        # n_leaves/P leaves per rank, but the real run's local leaf table
        # is own_slack-padded (parallel/distributed.py _plan: n_leaf_loc =
        # ceil(n_loc*(1+own_slack)/G)) AND leaf boundaries re-tile at every
        # rank edge — so scale the measured count to the actual geometry
        # before padding (measured: the proxy's full width 8 vs actual
        # n_leaf_loc 10 at n=2048/P=8/G=32 clipped 53 imports unscaled).
        # Splitters also resample every repartition; the relative+absolute
        # pad covers drift and the plan-time overflow counter stays the
        # loud guard.
        from parallelnbody_tpu.ops.bh import measure_import_requirement
        from parallelnbody_tpu.parallel.distributed import _plan_cfg
        imp = measure_import_requirement(state.pos, state.mass,
                                         cfg.replace(**kw), n_ranks)
        n_local = -(-cfg.n // n_ranks)
        _, _, n_leaf_loc = _plan_cfg(cfg, n_local, n_ranks,
                                     cfg.resolve_bh_leaf_size())
        scaled = -(-imp["import_max"] * n_leaf_loc) // imp["n_leaf_loc_proxy"]
        kw["bh_import_budget"] = min(pad(scaled, 8), n_leaf_loc)
    return cfg.replace(**kw)


def prepare_simulation(cfg: SimConfig, key: jax.Array | None = None
                       ) -> tuple[SimConfig, SimState]:
    """ICs + budget auto-calibration + t=0 forces in the right order:
    generate the state, measure and fix the auto (0) Barnes-Hut budgets
    against its actual geometry, THEN evaluate initial forces with the
    calibrated config. Returns (calibrated cfg, initialized state) — the
    single-chip entry point for Simulation, the CLI, and the bench suite
    (the returned cfg is what make_step/make_run must be built from)."""
    state = init_simulation(cfg, key, compute_forces=False)
    cfg = calibrate_budgets(cfg, state)
    return cfg, _fill_initial_forces(cfg, state)


def _state_jit(cfg: SimConfig):
    """jax.jit for a state -> state function, honoring cfg.donate_state:
    donating argument 0 lets XLA alias the input SimState's buffers into
    outputs/temporaries instead of holding both copies live across the call
    (~0.7 GB at N=16M — the capacity edge the fused-reuse row gate sits
    on). Callers of donated functions must rebind: `state = fn(state)`."""
    if cfg.donate_state:
        return functools.partial(jax.jit, donate_argnums=0)
    return jax.jit


# ----------------------------------------------------------------------- step
def make_step(cfg: SimConfig, report_overflow: bool = False) -> Callable:
    """One fused, jitted integration step: force + integrate, no host sync.

    report_overflow=True: step(state) -> (state, overflow), overflow the
    int32 Barnes-Hut budget-clip counter summed over this step's force
    evaluations (zero for the direct methods). A state can start clipping at
    any step as the system evolves (e.g. a collapsing galaxy merger), so the
    t=0 budget audit alone is not a contract — this is (VERDICT r2 #4)."""
    enable_compile_cache(cfg.compile_cache_dir)
    integrator = get_integrator(cfg.integrator)

    @_state_jit(cfg)
    def step(state: SimState):
        of_cell = [jnp.zeros((), jnp.int32)]
        accel_fn = make_accel_fn(cfg, state.mass,
                                 overflow_cell=of_cell if report_overflow else None)
        dt = jnp.asarray(cfg.dt, state.pos.dtype)
        pos, vel, acc, pot = integrator(
            accel_fn, state.pos, state.vel, state.acc, state.pot, dt
        )
        out = state._replace(
            pos=pos, vel=vel, acc=acc, pot=pot,
            time=state.time + dt, step=state.step + 1,
        )
        return (out, of_cell[0]) if report_overflow else out

    return step


# Measured v5e reuse capacity boundary: N=8M (8388608 padded rows) is the
# largest scale whose rebuild-interval block reproduces reliably (-9% vs
# per-step, overflow 0, re-measured across sessions). N=16M measured -8%
# ONCE, then faulted (TPU device error) on IDENTICAL code in a later
# session — unsectioned AND with a 4-section plan; N=32M faulted in the
# r7 sessions too.
#
# The compiled-memory ledger (scripts/donate_mem.py AOT memory_analysis,
# r5 — the r4-documented 16M rows were the PER-STEP program due to the
# since-fixed eligibility gate in the script) says the faults are NOT
# application OOM: every reuse program fits the 15.75 GB HBM with margin.
#
#   rows (k=8, shipped budgets)   peak GB   peak GB (donate_state)
#   8M  reuse (unsectioned)          3.99      3.57   <- gate (runs)
#   16M reuse (unsectioned)         12.72     11.89   <- faults anyway
#   32M reuse (8 sections)          11.92     10.26   <- faults anyway
#   32M per-step (8 sections)        9.83      8.16   <- runs fine
#
# A ledger-derived gate (peak vs HBM) was considered and REJECTED: it
# would admit 16M/32M, which fault despite fitting — the failure is
# environment-level (the axon tunnel runtime), not a memory model this
# code can compute. The constant is therefore pinned to the largest
# empirically-reliable scale, the ledger rules out the app-OOM
# explanation, and PARALLELNBODY_REUSE_MAX_ROWS overrides the gate for
# deployments whose runtime handles the larger resident sets (beyond the
# gate, fused runs keep per-step rebuilds — perf-only fallback, physics
# unchanged).
_REUSE_MAX_ROWS = int(os.environ.get("PARALLELNBODY_REUSE_MAX_ROWS",
                                     8388608))


# Measured plan/eval cost ratio at the shipped 1M operating point
# (scripts/reuse_probe.py: sort+traverse+lists ~54 ms vs eval ~196 ms):
# used to pick the rebuild-block size below.
_REUSE_PLAN_RATIO = 0.3


def _reuse_block_size(k_max: int, n_steps: int,
                      plan_ratio: float = _REUSE_PLAN_RATIO) -> int:
    """Pick the rebuild-block size k <= k_max minimizing total work for a
    run of n_steps. The tail (n_steps % k) is folded into a full k-step
    block as dt=0 masked evals (ONE traced pipeline instead of two
    compiles), so the evaluation count is ceil(n_steps/k)*k — naively
    using k_max on a short run wastes evals: 10 steps at k=8 would run
    16 evals (+60%), while k=5 runs exactly 10 with half the plans.
    Cost model: evals + blocks*plan_ratio. Never exceeds k_max, so the
    user's rebuild cadence (the accuracy contract: geometry at most k
    steps stale) is only ever tightened, never stretched."""
    best, best_cost = 1, float("inf")
    for k in range(1, min(k_max, n_steps) + 1):
        blocks = -(-n_steps // k)
        cost = blocks * k + blocks * plan_ratio
        if cost < best_cost:
            best, best_cost = k, cost
    return best


def _reuse_eligible(cfg: SimConfig, n_steps: int) -> bool:
    """bh_rebuild_every > 1 applies to the fused single-chip Barnes-Hut
    octet path (the shipped auto), sectioned configurations included up to
    the measured _REUSE_MAX_ROWS capacity boundary. Everything else —
    direct forces, far_mode=gather, >16M — rebuilds every step regardless
    (the knob is perf-only; falling back never changes physics)."""
    if cfg.bh_rebuild_every <= 1 or n_steps <= 1:
        return False
    if cfg.resolve_force() != "barnes_hut":
        return False
    from parallelnbody_tpu.ops import bh

    leaf = cfg.resolve_bh_leaf_size()
    _, n_pad, n_levels = bh.plan_tree(cfg.n, leaf, cfg.bh_max_levels)
    if n_pad > _REUSE_MAX_ROWS:
        return False
    refine, _ = bh.resolve_refine(
        cfg.resolve_bh_refine(), (cfg.bh_cand2_budget, cfg.bh_cand_budget),
        n_levels, cfg.resolve_bh_near_budget(), cfg.resolve_bh_far_budget())
    return bh.resolve_far_mode(cfg.bh_far_mode, refine) == "octet"


def _make_run_reuse(cfg: SimConfig, n_steps: int,
                    report_overflow: bool) -> Callable:
    """Fused run with a tree-rebuild interval (cfg.bh_rebuild_every = k):
    the state is carried in Hilbert-sorted order; each block of k steps
    pays ONE wide multi-operand sort + ONE traversal/list build, then k
    evaluations that refresh only the multipole pyramid against the frozen
    lists (ops/bh.py bh_plan_lists/bh_eval_lists); original particle order
    is restored by a single exit sort keyed by a carried original-index
    column. Measured v5e at k=8: -5% ms/step at N=1M, -9% at 4M/8M/2M-
    galaxy, with sampled rms force error vs the direct sum unchanged at
    the 1e-3 class (scripts/reuse_probe.py; docs/DESIGN.md r7).

    The classic tree-code analogue: the reference rebuilds its pointer
    octree every Tick (OctreeSearch.cpp:26-27) because a CPU rebuild is
    cheap next to its traversal; here the geometry (sort + traversal +
    lists) is ~5-10% of a step and particles move ~1e-3 leaf radii per
    step, so freezing membership for k steps trades measured-negligible
    accuracy for that slice."""
    from parallelnbody_tpu.ops import bh
    from parallelnbody_tpu.ops.hilbert import hilbert_encode
    from parallelnbody_tpu.ops.morton import morton_encode

    enable_compile_cache(cfg.compile_cache_dir)
    integrator = get_integrator(cfg.integrator)
    leaf = cfg.resolve_bh_leaf_size()
    n = cfg.n
    n_leaves, n_pad, n_levels = bh.plan_tree(n, leaf, cfg.bh_max_levels)
    refine, cands = bh.resolve_refine(
        cfg.resolve_bh_refine(), (cfg.bh_cand2_budget, cfg.bh_cand_budget),
        n_levels, cfg.resolve_bh_near_budget(), cfg.resolve_bh_far_budget())
    use_pallas = bh.use_pallas_bh()
    sections = bh.resolve_sections(cfg.bh_sections, n_leaves, refine)
    encode = hilbert_encode if cfg.bh_curve == "hilbert" else morton_encode
    k = _reuse_block_size(cfg.bh_rebuild_every, n_steps)
    n_blocks, tail = divmod(n_steps, k)
    compute_pot = cfg.track_potential
    big = jnp.iinfo(jnp.int32).max

    def sort_block(pos, vel, acc, mass, orig):
        """Wide multi-operand re-sort into current Hilbert order (pad rows
        — orig >= n — are excluded from the domain cube and keyed last)."""
        live = orig < n
        inf = jnp.asarray(jnp.inf, pos.dtype)
        lo = jnp.min(jnp.where(live[:, None], pos, inf), axis=0)
        hi = jnp.max(jnp.where(live[:, None], pos, -inf), axis=0)
        center, half, _ = bh.domain_cube(lo, hi)
        keys = jnp.where(live, encode(pos, center, half), big)
        iota = jnp.arange(n_pad, dtype=jnp.int32)
        (_, _, px, py, pz, vx, vy, vz, ax, ay, az, mass_s, orig_s) = \
            jax.lax.sort(
                (keys, iota, pos[:, 0], pos[:, 1], pos[:, 2],
                 vel[:, 0], vel[:, 1], vel[:, 2],
                 acc[:, 0], acc[:, 1], acc[:, 2], mass, orig),
                num_keys=2)
        return (jnp.stack([px, py, pz], 1), jnp.stack([vx, vy, vz], 1),
                jnp.stack([ax, ay, az], 1), mass_s, orig_s)

    def make_block():
        def block(carry, dt_mask):
            # dt_mask: (k,) per-step dt scale factors. Every block runs the
            # SAME traced body (k inner steps); a tail of t < k live steps
            # is a mask row [1]*t + [0]*(k-t) — a dt=0 step is an exact
            # no-op for pos/vel/time/step (forces recompute to the same
            # values against the frozen lists), so folding the tail here
            # avoids tracing+compiling a second full sort/traverse/eval
            # pipeline for it (~doubled XLA compile at N=1M) at the cost of
            # k-t wasted evals in the last block only.
            pos, vel, acc, pot, mass, orig, time, step, of = carry
            pos_s, vel_s, acc_s, mass_s, orig_s = sort_block(
                pos, vel, acc, mass, orig)
            lo = jnp.min(pos_s[:n], axis=0)
            hi = jnp.max(pos_s[:n], axis=0)
            _, _, sentinel = bh.domain_cube(lo, hi)
            tree = bh.build_tree(pos_s, mass_s, leaf, sentinel,
                                 multipole_order=cfg.bh_multipole,
                                 max_levels=cfg.bh_max_levels)
            plan = bh.bh_plan_lists(
                tree, theta=cfg.theta, near_budget=cfg.resolve_bh_near_budget(),
                far_budget=cfg.resolve_bh_far_budget(), refine=refine,
                cand_budgets=cands, dtype=pos.dtype, sections=sections)

            def accel_fn(p):
                return bh.bh_eval_lists(
                    p, mass_s, plan, leaf_size=leaf, g=cfg.g,
                    softening=cfg.softening, multipole=cfg.bh_multipole,
                    max_levels=cfg.bh_max_levels, use_pallas=use_pallas,
                    compute_pot=compute_pot, n_live=n, sections=sections)

            dt = jnp.asarray(cfg.dt, pos.dtype)

            def inner(c, m):
                ps, vs, as_, pots, t, st = c
                dt_eff = dt * m
                ps, vs, as_, pots = integrator(accel_fn, ps, vs, as_, pots,
                                               dt_eff)
                return (ps, vs, as_, pots, t + dt_eff,
                        st + (m > 0).astype(step.dtype)), None

            # pot enters as a carry placeholder only: every integrator
            # returns pot from its final accel_fn call, so the first inner
            # step overwrites it (blocks always have length >= 1).
            (ps, vs, as_, pots, time, step), _ = jax.lax.scan(
                inner, (pos_s, vel_s, acc_s, jnp.zeros(n_pad, pos.dtype),
                        time, step), dt_mask)
            return (ps, vs, as_, pots, mass_s, orig_s, time, step,
                    of + plan.overflow), None
        return block

    @_state_jit(cfg)
    def run(state: SimState):
        pad = n_pad - n
        z3 = jnp.zeros((pad, 3), state.pos.dtype)
        carry = (
            jnp.concatenate([state.pos, z3], 0),
            jnp.concatenate([state.vel, z3], 0),
            jnp.concatenate([state.acc, z3], 0),
            jnp.concatenate([state.pot, jnp.zeros(pad, state.pos.dtype)], 0),
            jnp.concatenate([state.mass, jnp.zeros(pad, state.mass.dtype)], 0),
            jnp.arange(n_pad, dtype=jnp.int32),
            state.time, state.step, jnp.zeros((), jnp.int32),
        )
        total = n_blocks + (1 if tail else 0)
        masks = np.ones((total, k), dtype=state.pos.dtype)
        if tail:
            masks[-1, tail:] = 0.0
        carry, _ = jax.lax.scan(make_block(), carry, jnp.asarray(masks))
        pos, vel, acc, pot, _, orig, time, step, overflow = carry
        # Exit unsort: orig is a permutation of [0, n_pad) so a single-key
        # multi-operand sort restores the caller's particle order exactly.
        (_, px, py, pz, vx, vy, vz, ax, ay, az, pot_o) = jax.lax.sort(
            (orig, pos[:, 0], pos[:, 1], pos[:, 2],
             vel[:, 0], vel[:, 1], vel[:, 2],
             acc[:, 0], acc[:, 1], acc[:, 2], pot), num_keys=1)
        out = state._replace(
            pos=jnp.stack([px, py, pz], 1)[:n],
            vel=jnp.stack([vx, vy, vz], 1)[:n],
            acc=jnp.stack([ax, ay, az], 1)[:n],
            pot=pot_o[:n], time=time, step=step)
        return (out, overflow) if report_overflow else out

    return run


def make_run(cfg: SimConfig, n_steps: int,
             report_overflow: bool = False) -> Callable:
    """n_steps fused into a single jitted lax.scan (zero host round-trips).

    report_overflow=True: run(state) -> (state, overflow), overflow summed
    over all steps (carried through the scan as an int32).

    cfg.bh_rebuild_every > 1 routes eligible Barnes-Hut configurations to
    the tree-rebuild-interval run (_make_run_reuse)."""
    if _reuse_eligible(cfg, n_steps):
        return _make_run_reuse(cfg, n_steps, report_overflow)
    integrator = get_integrator(cfg.integrator)

    @_state_jit(cfg)
    def run(state: SimState):
        of_cell = [jnp.zeros((), jnp.int32)]
        accel_fn = make_accel_fn(cfg, state.mass,
                                 overflow_cell=of_cell if report_overflow else None)
        dt = jnp.asarray(cfg.dt, state.pos.dtype)

        def body(carry, _):
            s, of = carry
            of_cell[0] = jnp.zeros((), jnp.int32)
            pos, vel, acc, pot = integrator(accel_fn, s.pos, s.vel, s.acc, s.pot, dt)
            return (
                s._replace(pos=pos, vel=vel, acc=acc, pot=pot,
                           time=s.time + dt, step=s.step + 1),
                of + of_cell[0],
            ), None

        (state, overflow), _ = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), length=n_steps)
        return (state, overflow) if report_overflow else state

    return run


# ----------------------------------------------------------------- host shell
class Simulation:
    """Thin host-side shell: owns cfg + state, drives jitted steps.

    Mirrors the reference actor's lifecycle (spawn -> CreateSpacePoints ->
    Tick loop -> CleanParticles) without any engine dependency.
    """

    def __init__(self, cfg: SimConfig, key: jax.Array | None = None):
        # prepare_simulation calibrates any auto (0) Barnes-Hut budgets
        # against the actual ICs before the first force evaluation; the
        # calibrated cfg is what every jitted function is built from.
        self.cfg, self.state = prepare_simulation(cfg, key)
        self._step = make_step(self.cfg)
        self._runs: dict[int, Callable] = {}

    def step(self, n: int = 1) -> SimState:
        if n == 1:
            self.state = self._step(self.state)
        else:
            if n not in self._runs:
                self._runs[n] = make_run(self.cfg, n)
            self.state = self._runs[n](self.state)
        return self.state

    def reset(self, seed: int | None = None) -> SimState:
        """CleanParticles + CreateSpacePoints analogue (OctreeSearch.cpp:91-97)."""
        cfg = self.cfg if seed is None else self.cfg.replace(seed=seed)
        self.cfg = cfg
        self.state = init_simulation(cfg)
        return self.state

    def diagnostics(self) -> dict:
        state = self.state
        if not self.cfg.track_potential:
            # Hot steps skipped the potential; recompute it for diagnostics.
            accel_fn = make_accel_fn(self.cfg.replace(track_potential=True),
                                     state.mass)
            _, pot = accel_fn(state.pos)
            state = state._replace(pot=pot)
        vals = energy_ops.diagnostics(state)
        return {k: float(v) for k, v in vals.items()}
