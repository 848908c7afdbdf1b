"""Multi-chip path tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation, make_step
from parallelnbody_tpu.parallel import (
    make_ring_mesh,
    shard_state,
    make_sharded_step,
    make_sharded_run,
)
from parallelnbody_tpu.parallel.sharded import sharded_init_accel


CFG = SimConfig(n=512, ic="plummer", dt=1e-3, softening=0.02,
                force="direct", dtype="float64")


def test_ring_accel_matches_single_device(eight_devices):
    """Sharded ring forces == single-device direct forces."""
    mesh = make_ring_mesh(8)
    state = init_simulation(CFG)
    ref_acc, ref_pot = np.asarray(state.acc), np.asarray(state.pot)

    sstate = shard_state(state._replace(acc=jnp.zeros_like(state.acc),
                                        pot=jnp.zeros_like(state.pot)), mesh)
    sstate = sharded_init_accel(CFG, mesh, sstate)
    np.testing.assert_allclose(np.asarray(sstate.acc), ref_acc, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sstate.pot), ref_pot, rtol=1e-10, atol=1e-10)


def test_sharded_step_matches_single_device(eight_devices):
    mesh = make_ring_mesh(8)
    state = init_simulation(CFG)

    step = make_step(CFG)
    ref = state
    for _ in range(5):
        ref = step(ref)

    sstate = shard_state(state, mesh)
    sstep = make_sharded_step(CFG, mesh)
    for _ in range(5):
        sstate = sstep(sstate)

    np.testing.assert_allclose(np.asarray(sstate.pos), np.asarray(ref.pos),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sstate.vel), np.asarray(ref.vel),
                               rtol=1e-9, atol=1e-12)
    assert int(sstate.step) == 5


def test_sharded_run_scan(eight_devices):
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(CFG), mesh)
    run = make_sharded_run(CFG, mesh, 10)
    out = run(state)
    assert int(out.step) == 10
    assert np.all(np.isfinite(np.asarray(out.pos)))


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_chip_count_invariance(eight_devices, n_dev):
    """Results are (near-)invariant to the number of chips (SURVEY.md §4)."""
    mesh = make_ring_mesh(n_dev)
    state = shard_state(init_simulation(CFG), mesh)
    out = make_sharded_step(CFG, mesh)(state)
    ref = make_step(CFG)(init_simulation(CFG))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-9, atol=1e-12)


def test_sharded_energy_conservation(eight_devices):
    mesh = make_ring_mesh(8)
    cfg = CFG.replace(integrator="leapfrog")
    state = shard_state(init_simulation(cfg), mesh)
    from parallelnbody_tpu.ops.energy import total_energy

    e0 = float(total_energy(state.vel, state.mass, state.pot))
    out = make_sharded_run(cfg, mesh, 100)(state)
    e1 = float(total_energy(out.vel, out.mass, out.pot))
    assert abs((e1 - e0) / e0) < 1e-4


def test_sharded_bh_matches_single_device(eight_devices):
    """Multi-chip Barnes-Hut (replicated tree, partitioned targets) must
    match the single-device BH bit-for-bit-ish."""
    cfg = SimConfig(n=2048, ic="plummer", dt=1e-3, softening=0.02,
                    force="barnes_hut", bh_leaf_size=32, bh_near_budget=256,
                    dtype="float64")
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)

    step = make_step(cfg)
    ref = step(state)

    sstate = shard_state(state, mesh)
    out = make_sharded_step(cfg, mesh)(sstate)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("n_dev", [3, 5, 7])
def test_sharded_bh_any_rank_count(eight_devices, n_dev):
    """BH target-leaf partitioning works for rank counts that do NOT divide
    the leaf count (trailing windows clamp and overlap)."""
    cfg = SimConfig(n=64 * n_dev, ic="plummer", dt=1e-3, softening=0.02,
                    force="barnes_hut", bh_leaf_size=8, bh_near_budget=64,
                    dtype="float64")
    mesh = make_ring_mesh(n_dev)
    state = init_simulation(cfg)
    ref = make_step(cfg)(state)
    out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=1e-7, atol=1e-10)


def test_multislice_ring_mesh(eight_devices):
    """ICI x DCN slice-major ring mesh (VERDICT r1 #10): on the virtual CPU
    pool the contiguous-partition fallback orders devices; the sharded step
    over it matches single-device."""
    from parallelnbody_tpu.parallel.mesh import make_multislice_ring_mesh

    mesh = make_multislice_ring_mesh(4, 2)
    assert mesh.devices.size == 8
    state = shard_state(init_simulation(CFG), mesh)
    out = make_sharded_step(CFG, mesh)(state)
    ref = make_step(CFG)(init_simulation(CFG))
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-9, atol=1e-12)


def test_cli_devices_spec_parsing():
    from parallelnbody_tpu.cli import _parse_devices

    assert _parse_devices("0") == ()
    assert _parse_devices("8") == (8,)
    assert _parse_devices("4x2") == (4, 2)


def test_sharded_bh_overflow_audit(eight_devices):
    """Under-budgeted sharded BH surfaces a nonzero psum'd overflow counter;
    a generous budget reports exactly zero (VERDICT r1 weak #4)."""
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    base = SimConfig(n=2048, ic="plummer", softening=0.02,
                     force="barnes_hut", bh_leaf_size=8, dtype="float64")
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(base.replace(force="direct")), mesh)

    tight = base.replace(bh_near_budget=2, bh_far_budget=8)
    assert sharded_bh_overflow(tight, mesh, state) > 0

    roomy = base.replace(bh_near_budget=256, bh_far_budget=1024)
    assert sharded_bh_overflow(roomy, mesh, state) == 0


def test_sharded_bh_init_accel(eight_devices):
    cfg = SimConfig(n=2048, ic="plummer", softening=0.02,
                    force="barnes_hut", bh_leaf_size=32, bh_near_budget=256,
                    dtype="float64")
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    ref_acc = np.asarray(state.acc)
    sstate = shard_state(state._replace(acc=jnp.zeros_like(state.acc),
                                        pot=jnp.zeros_like(state.pot)), mesh)
    sstate = sharded_init_accel(cfg, mesh, sstate)
    np.testing.assert_allclose(np.asarray(sstate.acc), ref_acc,
                               rtol=1e-7, atol=1e-10)


def test_ring_with_pallas_tile_interpret(eight_devices):
    """The ring schedule with the Pallas tile kernel (interpret mode on CPU)
    matches the jnp tile — validates the TPU multi-chip all-pairs path."""
    from parallelnbody_tpu.parallel.ring import ring_accel
    from parallelnbody_tpu.ops.pallas_direct import pallas_accel_tile

    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    cfg = SimConfig(n=512, ic="plummer", softening=0.02, dtype="float32")
    state = init_simulation(cfg)
    mesh = make_ring_mesh(8)

    def tile_fn(pi, pj, mj):
        return pallas_accel_tile(pi, pj, mj, g=1.0, softening=0.02,
                                 tile_i=32, tile_j=128, interpret=True)

    def local(pos, mass):
        return ring_accel(pos, mass, g=1.0, softening=0.02, tile_fn=tile_fn)

    fn = shard_map(local, mesh=mesh, in_specs=(P("ring"), P("ring")),
                   out_specs=(P("ring"), P("ring")), check_vma=False)
    acc, pot = jax.jit(fn)(state.pos, state.mass)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(state.acc),
                               rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------- distributed BH
def _dist_cfg(n):
    # bh_rebuild_every=1 = per-step rebuilds (the shipped default is 8; the
    # per-step-vs-reuse comparisons below need the explicit baseline).
    return SimConfig(n=n, ic="plummer", dt=1e-3, softening=0.02,
                     force="barnes_hut", bh_leaf_size=32, bh_near_budget=256,
                     dtype="float64", bh_distributed=True,
                     bh_rebuild_every=1)


def test_distributed_bh_accuracy(eight_devices):
    """Stage-6 distributed BH (sample-sort + local trees + ring near field)
    must match the direct sum at the same accuracy class as single-chip BH,
    with zero exchange/list overflow."""
    from parallelnbody_tpu.ops.direct import direct_accel
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    cfg = _dist_cfg(2048)
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    ref = make_step(cfg.replace(bh_distributed=False))(state)
    out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))

    acc_d, _ = direct_accel(state.pos, state.mass, g=cfg.g,
                            softening=cfg.softening)
    den = float(jnp.sqrt(jnp.mean(jnp.sum(jnp.asarray(acc_d) ** 2, 1))))
    rms_dist = float(jnp.sqrt(jnp.mean(jnp.sum((out.acc - acc_d) ** 2, 1)))) / den
    rms_ref = float(jnp.sqrt(jnp.mean(jnp.sum((ref.acc - acc_d) ** 2, 1)))) / den
    assert np.all(np.isfinite(np.asarray(out.acc)))
    # same accuracy class as the replicated-tree path (leaf grouping differs
    # by the per-rank padding, so bitwise equality is not expected)
    assert rms_dist < 1.5 * rms_ref + 1e-3, (rms_dist, rms_ref)
    assert sharded_bh_overflow(cfg, mesh, shard_state(state, mesh)) == 0


@pytest.mark.parametrize("n_dev", [3, 8])
def test_distributed_bh_any_rank_count(eight_devices, n_dev):
    cfg = _dist_cfg(256 * n_dev)
    mesh = make_ring_mesh(n_dev)
    state = init_simulation(cfg)
    ref = make_step(cfg.replace(bh_distributed=False))(state)
    out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    den = float(jnp.sqrt(jnp.mean(jnp.sum(ref.acc ** 2, 1))))
    diff = float(jnp.sqrt(jnp.mean(jnp.sum((out.acc - ref.acc) ** 2, 1)))) / den
    assert diff < 2e-3, diff


def test_distributed_bh_multi_step_migration(eight_devices):
    """Several fused steps: repeated repartition + reverse exchange stays
    conservative and finite (the caller's sharding is key-uncorrelated, so
    every step re-exchanges — see the module docstring)."""
    from parallelnbody_tpu.parallel import make_sharded_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(1024)
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    out = make_sharded_run(cfg, mesh, 5)(state)
    assert int(out.step) == 5
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    # momentum conservation (forces antisymmetric up to BH approximation)
    p0 = jnp.sum(state.mass[:, None] * state.vel, axis=0)
    p1 = jnp.sum(out.mass[:, None] * out.vel, axis=0)
    mv = float(jnp.sqrt(jnp.sum(state.mass[:, None] * state.vel ** 2)))
    assert float(jnp.linalg.norm(p1 - p0)) < 5e-3 * mv


def test_distributed_bh_exchange_overflow_reported(eight_devices):
    """An adversarially pre-partitioned state (every particle belongs to one
    key range) must REPORT exchange overflow, not drop silently."""
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    cfg = _dist_cfg(1024)
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    # order particles by descending x before sharding: each rank then holds
    # a contiguous slab of key space owned by OTHER ranks, so per-pair flows
    # approach n_local and must blow the static cap_pair (keys themselves
    # are scale-invariant — quantile splitters absorb any density change,
    # only placement correlation can overflow the exchange)
    order = jnp.argsort(-state.pos[:, 0])
    state = state._replace(pos=state.pos[order], vel=state.vel[order],
                           mass=state.mass[order], acc=state.acc[order],
                           pot=state.pot[order])
    assert sharded_bh_overflow(cfg, mesh, shard_state(state, mesh)) > 0


def test_distributed_run_persistent_sharding(eight_devices):
    """make_distributed_run: one entry exchange, key-sharded scan carry,
    one exit exchange. Must track the per-step distributed path closely
    (the only difference is the scan's pre-drift leaf grouping: one dt of
    staleness) and conserve momentum/energy at the same class."""
    from parallelnbody_tpu.parallel.distributed import make_distributed_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(2048)
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg), mesh)
    state = sharded_init_accel(cfg, mesh, state)

    # reference: 5 per-step distributed steps
    ref = state
    step = make_sharded_step(cfg, mesh)
    for _ in range(5):
        ref = step(ref)

    out, overflow = make_distributed_run(cfg, mesh, 5)(state)
    assert int(overflow) == 0
    assert int(out.step) == int(ref.step) == int(state.step) + 5
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    # same trajectory to within the grouping-staleness difference
    scale = float(jnp.sqrt(jnp.mean(jnp.sum(ref.vel ** 2, 1))))
    dv = float(jnp.sqrt(jnp.mean(jnp.sum((out.vel - ref.vel) ** 2, 1))))
    assert dv < 2e-3 * scale, (dv, scale)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=0, atol=1e-5)
    # every particle accounted for: mass field untouched, momentum conserved
    p0 = jnp.sum(state.mass[:, None] * state.vel, axis=0)
    p1 = jnp.sum(out.mass[:, None] * out.vel, axis=0)
    mv = float(jnp.sqrt(jnp.sum(state.mass[:, None] * state.vel ** 2)))
    assert float(jnp.linalg.norm(p1 - p0)) < 5e-3 * mv


def test_distributed_run_no_pot_rk4(eight_devices):
    """make_distributed_run with track_potential=False and a multi-eval
    integrator (rk4 calls accel_fn four times per step)."""
    from parallelnbody_tpu.parallel.distributed import make_distributed_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(1024).replace(track_potential=False, integrator="rk4")
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    out, overflow = make_distributed_run(cfg, mesh, 3)(state)
    assert int(overflow) == 0
    assert int(out.step) == int(state.step) + 3
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    assert bool(jnp.all(jnp.isfinite(out.vel)))


def test_distributed_run_small_shards_large_leaves(eight_devices):
    """Regression: with n_local << leaf_size the merged buffer is shorter
    than own_cap and invalid rows once inherited REAL particle ids from the
    sort — live zero-mass phantoms that overwrote their originals' state at
    exit (352/1024 particles relocated to the sentinel). _repartition must
    return id=-1 on invalid rows."""
    from parallelnbody_tpu.parallel.distributed import make_distributed_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(1024).replace(bh_leaf_size=512, bh_near_budget=16)
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    out, overflow = make_distributed_run(cfg, mesh, 3)(state)
    assert int(overflow) == 0
    # no particle may teleport: positions stay within the physical domain
    r0 = float(jnp.max(jnp.linalg.norm(state.pos, axis=1)))
    r1 = float(jnp.max(jnp.linalg.norm(out.pos, axis=1)))
    assert r1 < 2.0 * r0 + 1.0, (r0, r1)
    # masses in the output state are untouched and velocities finite
    assert bool(jnp.all(jnp.isfinite(out.vel)))


def test_distributed_reuse_eligibility():
    """The distributed rebuild interval applies to octet fused runs under
    BOTH near-comm modes (the LET request phase freezes with the lists);
    everything else falls back to per-step rebuilds (perf-only)."""
    from parallelnbody_tpu.parallel.distributed import _dist_reuse_eligible

    cfg = _dist_cfg(1024).replace(bh_rebuild_every=4)
    assert _dist_reuse_eligible(cfg, 8)
    assert _dist_reuse_eligible(cfg.replace(bh_comm="let"), 8)
    assert not _dist_reuse_eligible(cfg.replace(bh_rebuild_every=1), 8)
    assert not _dist_reuse_eligible(cfg, 1)
    assert not _dist_reuse_eligible(cfg.replace(force="direct"), 8)
    assert not _dist_reuse_eligible(cfg.replace(bh_far_mode="gather"), 8)


def test_distributed_run_rebuild_interval(eight_devices):
    """make_distributed_run with cfg.bh_rebuild_every=2 over 5 steps
    (2 blocks + a tail-fold block of 1 live + 1 masked dt=0 step): one
    repartition + one traverse/list build per block, forces refreshed
    against the frozen lists. Must track the per-step distributed run at
    the MAC-error class — NOT bitwise: each repartition draws fresh
    sample splitters from the current per-rank key distribution, so even
    at static positions the per-step path re-splits (entry vs steady
    arrangement) while the block path freezes its block's split; both are
    valid MAC geometries (measured median per-particle force gap 3.5e-4
    at theta=0.7, the MAC class)."""
    from parallelnbody_tpu.parallel.distributed import make_distributed_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(2048)
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg), mesh)
    state = sharded_init_accel(cfg, mesh, state)

    ref, of_ref = make_distributed_run(cfg, mesh, 5)(state)
    out, of = make_distributed_run(
        cfg.replace(bh_rebuild_every=2), mesh, 5)(state)
    assert int(of_ref) == 0 and int(of) == 0
    assert int(out.step) == int(ref.step) == int(state.step) + 5
    assert float(out.time) == pytest.approx(float(ref.time))
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    assert bool(jnp.all(out.mass == ref.mass))
    # same trajectory to within the frozen-geometry (MAC-class) difference
    scale = float(jnp.sqrt(jnp.mean(jnp.sum(ref.vel ** 2, 1))))
    dv = float(jnp.sqrt(jnp.mean(jnp.sum((out.vel - ref.vel) ** 2, 1))))
    assert dv < 2e-3 * scale, (dv, scale)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=0, atol=1e-5)
    # momentum conserved at the same class as the per-step run
    p0 = jnp.sum(state.mass[:, None] * state.vel, axis=0)
    p1 = jnp.sum(out.mass[:, None] * out.vel, axis=0)
    mv = float(jnp.sqrt(jnp.sum(state.mass[:, None] * state.vel ** 2)))
    assert float(jnp.linalg.norm(p1 - p0)) < 5e-3 * mv


def test_distributed_run_rebuild_interval_let(eight_devices):
    """The rebuild interval under bh_comm='let': the request all_to_all
    runs once per block (the import map is pure list geometry), each
    evaluation pays only the fixed-pattern response exchange. Must track
    the per-step LET run at the same MAC class as the ring variant."""
    from parallelnbody_tpu.parallel.distributed import make_distributed_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(2048).replace(bh_comm="let")
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg), mesh)
    state = sharded_init_accel(cfg, mesh, state)

    ref, of_ref = make_distributed_run(cfg, mesh, 4)(state)
    out, of = make_distributed_run(
        cfg.replace(bh_rebuild_every=2), mesh, 4)(state)
    assert int(of_ref) == 0 and int(of) == 0
    assert int(out.step) == int(ref.step) == int(state.step) + 4
    scale = float(jnp.sqrt(jnp.mean(jnp.sum(ref.vel ** 2, 1))))
    dv = float(jnp.sqrt(jnp.mean(jnp.sum((out.vel - ref.vel) ** 2, 1))))
    assert dv < 2e-3 * scale, (dv, scale)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=0, atol=1e-5)


def test_distributed_reuse_drift_100_steps(eight_devices):
    """Long-horizon accuracy certification of the DISTRIBUTED rebuild
    interval at the shipped default k=8 (VERDICT r4 #1): 104 steps = 13
    blocks of one repartition + one plan + 8 frozen-list evaluations on
    the 8-rank CPU mesh, energy-gated by the float64 C++ oracle like the
    single-chip 1000-step tests (tests/test_oracle.py). Measured drift
    1.12e-7 ring / 1.14e-7 LET (scripts era r5) — pinned ~90x above at
    1e-5. The per-step path at this slack clips exchange slots over 104
    repartitions (transient ownership imbalance); the block path's 13
    repartitions don't — reuse is the SAFER long-horizon operating point
    for the persistent run, not just the faster one."""
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from parallelnbody_tpu.native import Oracle
    from parallelnbody_tpu.parallel.distributed import (
        make_distributed_run, _dist_reuse_eligible)

    cfg = SimConfig(n=2048, ic="plummer", softening=0.05, dt=1e-3,
                    integrator="leapfrog", force="barnes_hut", theta=0.5,
                    bh_leaf_size=32, bh_near_budget=256, bh_far_budget=256,
                    bh_multipole=2, dtype="float32", bh_distributed=True,
                    bh_rebuild_every=8)
    assert _dist_reuse_eligible(cfg, 104)
    mesh = make_ring_mesh(8)
    state0 = init_simulation(cfg)
    mass = np.asarray(state0.mass)
    oracle = Oracle(g=1.0, softening=0.05)
    e0 = oracle.total_energy(np.asarray(state0.pos), np.asarray(state0.vel),
                             mass)
    state = sharded_init_accel(cfg, mesh, shard_state(state0, mesh))
    out, of = make_distributed_run(cfg, mesh, 104)(state)
    assert int(of) == 0
    assert int(out.step) == 104
    e1 = oracle.total_energy(np.asarray(out.pos), np.asarray(out.vel), mass)
    drift = abs((e1 - e0) / e0)
    assert drift < 1e-5, f"distributed reuse drift: {drift} (measured 1.1e-7)"


def test_exchange_slack_config(eight_devices):
    """bh_pair_slack is a SimConfig field (VERDICT r2 #6): the adversarial
    pre-partitioned state that overflows the exchange at the default slack
    is fixed by raising the config field — no source edit."""
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    cfg = _dist_cfg(1024)
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    order = jnp.argsort(-state.pos[:, 0])
    state = state._replace(pos=state.pos[order], vel=state.vel[order],
                           mass=state.mass[order], acc=state.acc[order],
                           pot=state.pot[order])
    sstate = shard_state(state, mesh)
    assert sharded_bh_overflow(cfg, mesh, sstate) > 0
    assert sharded_bh_overflow(cfg.replace(bh_pair_slack=16.0), mesh,
                               sstate) == 0


def test_sharded_step_reports_midrun_overflow(eight_devices):
    """make_sharded_step(report_overflow=True) returns the psum'd clip
    counter so the CLI can warn during a run, not only at t=0
    (VERDICT r2 #3, ADVICE r2 #2)."""
    cfg = SimConfig(n=2048, ic="plummer", softening=0.02,
                    force="barnes_hut", bh_leaf_size=8, bh_near_budget=2,
                    bh_far_budget=8, dtype="float64")
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg.replace(force="direct")), mesh)
    out, of = make_sharded_step(cfg, mesh, report_overflow=True)(state)
    assert int(of) > 0
    assert int(out.step) == int(state.step) + 1

    roomy = cfg.replace(bh_near_budget=256, bh_far_budget=1024)
    _, of0 = make_sharded_step(roomy, mesh, report_overflow=True)(state)
    assert int(of0) == 0


def test_distributed_bh_staged_refine(eight_devices):
    """The distributed path honors bh_refine=staged (its per-rank dense
    plane is O(n_leaf_loc x n_leaves_global) — the same large-N wall):
    accuracy must match the dense distributed path."""
    cfg = _dist_cfg(2048).replace(bh_refine="staged")
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg.replace(bh_refine="dense"))
    ref = make_sharded_step(cfg.replace(bh_refine="dense"), mesh)(
        shard_state(state, mesh))
    out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=1e-9, atol=1e-12)
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    assert sharded_bh_overflow(cfg, mesh, shard_state(state, mesh)) == 0


# --------------------------------------------------- LET near-field import
def test_distributed_bh_let_matches_ring(eight_devices):
    """bh_comm='let' (one all_to_all import of the referenced leaf tiles +
    one near-kernel pass) must match the ring near field to summation-order
    fp noise: both evaluate exactly the same near list against the same
    source tiles, LET in list order, the ring in P owner-pass partial
    sums."""
    cfg = _dist_cfg(2048)
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    ref = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    out = make_sharded_step(cfg.replace(bh_comm="let"), mesh)(
        shard_state(state, mesh))
    den = float(jnp.sqrt(jnp.mean(jnp.sum(ref.acc ** 2, 1))))
    diff = float(jnp.sqrt(jnp.mean(jnp.sum((out.acc - ref.acc) ** 2, 1)))) / den
    assert diff < 1e-6, diff

    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    assert sharded_bh_overflow(cfg.replace(bh_comm="let"), mesh,
                               shard_state(state, mesh)) == 0


def test_distributed_bh_let_staged_any_rank_count(eight_devices):
    """LET under staged refinement and a non-power-of-two rank count: the
    dense slot remap must stay exact for any list construction and P."""
    for n_dev in (3, 8):
        cfg = _dist_cfg(256 * n_dev).replace(bh_comm="let",
                                             bh_refine="staged")
        mesh = make_ring_mesh(n_dev)
        state = init_simulation(cfg)
        ref = make_step(cfg.replace(bh_distributed=False,
                                    bh_refine="dense"))(state)
        out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
        den = float(jnp.sqrt(jnp.mean(jnp.sum(ref.acc ** 2, 1))))
        diff = float(jnp.sqrt(jnp.mean(
            jnp.sum((out.acc - ref.acc) ** 2, 1)))) / den
        assert diff < 2e-3, (n_dev, diff)


def test_distributed_bh_let_import_overflow_reported(eight_devices):
    """A starved bh_import_budget must COUNT the missing source leaves into
    overflow (degraded forces are never silent) and still return finite
    results — the un-imported tiles are inert zero-mass rows."""
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    cfg = _dist_cfg(2048).replace(bh_comm="let", bh_import_budget=1)
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    out, of = make_sharded_step(cfg, mesh, report_overflow=True)(
        shard_state(state, mesh))
    assert int(of) > 0
    assert bool(jnp.all(jnp.isfinite(out.acc)))
    assert sharded_bh_overflow(cfg, mesh, shard_state(state, mesh)) > 0


def test_distributed_run_persistent_let(eight_devices):
    """The persistent key-sharded run composes with bh_comm='let' (the
    in-scan force evaluation imports through the same _forces_owned
    branch); must track the ring persistent run to fp noise."""
    from parallelnbody_tpu.parallel.distributed import make_distributed_run
    from parallelnbody_tpu.parallel.sharded import sharded_init_accel

    cfg = _dist_cfg(1024)
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg, compute_forces=False), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    ref, of_r = make_distributed_run(cfg, mesh, 5)(state)
    out, of_l = make_distributed_run(cfg.replace(bh_comm="let"), mesh,
                                     5)(state)
    assert int(of_r) == 0 and int(of_l) == 0
    den = float(jnp.sqrt(jnp.mean(jnp.sum(ref.pos ** 2, 1))))
    diff = float(jnp.sqrt(jnp.mean(jnp.sum((out.pos - ref.pos) ** 2, 1)))) / den
    assert diff < 1e-5, diff


def test_let_import_budget_calibration(eight_devices):
    """calibrate_budgets(n_ranks=P) measures the LET import requirement
    from the t=0 geometry and replaces the full-width runtime auto with a
    concrete per-owner-pair budget (VERDICT r4 weak #4: the O(N)/rank
    LET-auto memory tension, now closable by measurement). The calibrated
    run must be BITWISE equal to the full-width auto — same near lists,
    same dense-slot numbering, same summation order; only the import table
    capacity changes — with zero overflow."""
    from parallelnbody_tpu.api import calibrate_budgets
    from parallelnbody_tpu.parallel.sharded import sharded_bh_overflow

    cfg = _dist_cfg(2048).replace(bh_comm="let")
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    cal = calibrate_budgets(cfg, state, n_ranks=8)
    assert cal.bh_import_budget > 0
    ref = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    out, of = make_sharded_step(cal, mesh, report_overflow=True)(
        shard_state(state, mesh))
    assert int(of) == 0
    np.testing.assert_array_equal(np.asarray(out.acc), np.asarray(ref.acc))
    assert sharded_bh_overflow(cal, mesh, shard_state(state, mesh)) == 0


def test_measure_import_requirement_locality():
    """Two well-separated clusters split across 2 ranks: the measured
    essential import must be a small fraction of the full neighbor width
    (the remote cluster is entirely far-field), demonstrating the
    O(halo)/rank restoration a calibrated bh_import_budget buys on
    locality-friendly ICs."""
    from parallelnbody_tpu.ops.bh import measure_import_requirement

    rng = np.random.default_rng(0)
    a = rng.normal(size=(1024, 3)) * 0.5
    b = rng.normal(size=(1024, 3)) * 0.5 + np.array([100.0, 0.0, 0.0])
    pos = jnp.asarray(np.concatenate([a, b]), jnp.float64)
    mass = jnp.ones((2048,), jnp.float64)
    cfg = SimConfig(n=2048, force="barnes_hut", bh_leaf_size=32,
                    theta=0.72, dtype="float64")
    req = measure_import_requirement(pos, mass, cfg, 2)
    assert req["import_max"] < req["n_leaf_loc_proxy"] // 2, req


def test_sharded_init_virializes(eight_devices):
    """cfg.virialize is applied INSIDE sharded_init_accel for fresh states
    (regression: only cmd_run used to re-apply it after sharded init, so
    bench/probe callers silently dropped the flag). 2K + W ~ 0 on the
    sharded state, matching the single-chip init."""
    from parallelnbody_tpu.ops.energy import kinetic_energy, potential_energy

    cfg = CFG.replace(virialize=True)
    mesh = make_ring_mesh(8)
    state = shard_state(init_simulation(cfg, compute_forces=False), mesh)
    state = sharded_init_accel(cfg, mesh, state)
    ke = float(kinetic_energy(state.vel, state.mass))
    w = float(potential_energy(state.pot, state.mass))
    assert abs(2 * ke + w) / abs(w) < 1e-6
    # Resumed (step > 0) states must NOT be re-rescaled.
    stepped = state._replace(step=state.step + 1, vel=state.vel * 2.0)
    out = sharded_init_accel(cfg, mesh, stepped)
    np.testing.assert_allclose(np.asarray(out.vel),
                               np.asarray(stepped.vel), rtol=0, atol=0)
