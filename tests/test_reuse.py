"""Tree-rebuild-interval runs (cfg.bh_rebuild_every, api._make_run_reuse).

The reference rebuilds its pointer octree every Tick (OctreeSearch.cpp:26-27);
here the geometry (sort + traversal + lists) can be frozen for k steps while
the multipole pyramid refreshes from current positions (ops/bh.py
bh_plan_lists / bh_eval_lists). These tests pin the contract:

  * at vanishing dt (positions bitwise static in f32) the reused run is
    BITWISE identical to the per-step run — same kernels, same lists, the
    sorted-space round trip is exact;
  * at physical dt the divergence after k steps is far below the MAC error;
  * the tail path (n_steps % k != 0), overflow reporting, non-default
    integrators, and padded N (n not a multiple of leaf*8) all work;
  * ineligible configurations fall back to the per-step run.
"""

import jax.numpy as jnp
import pytest

from parallelnbody_tpu.api import init_simulation, make_run, _reuse_eligible
from parallelnbody_tpu.config import SimConfig


def _cfg(**kw):
    # bh_rebuild_every=1 pins the base to PER-STEP rebuilds: k=8 became the
    # shipped default in r5, so the per-step-vs-reuse comparisons here must
    # set the baseline explicitly.
    base = dict(n=2048, force="barnes_hut", theta=0.72, dt=1e-3,
                softening=0.01, integrator="leapfrog", ic="plummer",
                bh_rebuild_every=1)
    base.update(kw)
    return SimConfig(**base)


@pytest.fixture(scope="module")
def state2k():
    return init_simulation(_cfg())


def test_bitwise_identical_at_static_positions(state2k):
    # dt=1e-12 is below f32 ulp of the coordinates: positions never change,
    # so the frozen lists equal the per-step rebuilt lists and every force
    # evaluation must match bitwise through the sorted round trip.
    cfg = _cfg(dt=1e-12)
    s1 = make_run(cfg, 6)(state2k)
    s2 = make_run(cfg.replace(bh_rebuild_every=3), 6)(state2k)
    assert bool(jnp.all(s1.pos == s2.pos))
    assert bool(jnp.all(s1.vel == s2.vel))
    assert bool(jnp.all(s1.acc == s2.acc))
    assert bool(jnp.all(s1.pot == s2.pot))


def test_close_at_physical_dt_and_counters(state2k):
    cfg = _cfg()
    s1, of1 = make_run(cfg, 8, report_overflow=True)(state2k)
    s2, of2 = make_run(cfg.replace(bh_rebuild_every=4), 8,
                       report_overflow=True)(state2k)
    assert int(s2.step) == 8
    assert float(s2.time) == pytest.approx(float(s1.time))
    assert int(of1) == 0 and int(of2) == 0
    rel = float(jnp.sqrt(jnp.mean(jnp.sum((s1.acc - s2.acc) ** 2, 1))
                         / jnp.mean(jnp.sum(s1.acc ** 2, 1))))
    # Measured ~1e-7 at N=2048/dt=1e-3; the MAC error class is ~1e-3.
    assert rel < 1e-4
    d = float(jnp.max(jnp.abs(s1.pos - s2.pos)))
    assert d < 1e-6


def test_tail_block(state2k):
    # 10 = 2 full blocks of 4 + tail 2: step/time must still advance by 10.
    cfg = _cfg(bh_rebuild_every=4)
    s = make_run(cfg, 10)(state2k)
    assert int(s.step) == 10
    assert float(s.time) == pytest.approx(10 * cfg.dt, rel=1e-5)


def test_overflow_reported_through_reuse():
    # A near budget of 1 must clip on any leaf with >1 near source; the
    # plan-time counter has to surface through the reused run.
    cfg = _cfg(bh_near_budget=1, bh_far_budget=8, bh_rebuild_every=4)
    state = init_simulation(cfg)
    _, of = make_run(cfg, 4, report_overflow=True)(state)
    assert int(of) > 0


def test_other_integrator_and_padded_n():
    # n=1500 pads to n_leaves*leaf rows (pads must stay inert through the
    # block carries); dkd evaluates forces twice per step against the
    # frozen lists.
    cfg = _cfg(n=1500, integrator="dkd", dt=1e-12)
    state = init_simulation(cfg)
    s1 = make_run(cfg, 4)(state)
    s2 = make_run(cfg.replace(bh_rebuild_every=2), 4)(state)
    assert bool(jnp.all(s1.pos == s2.pos))
    assert bool(jnp.all(s1.acc == s2.acc))


def test_eligibility_gates():
    assert _reuse_eligible(_cfg(bh_rebuild_every=8), 16)
    # Sectioned (>16M-class) configs are eligible: windowed plan,
    # full-width frozen lists, sectioned eval.
    assert _reuse_eligible(
        _cfg(n=4096, bh_leaf_size=64, bh_refine="staged", bh_sections=2,
             bh_rebuild_every=8), 16)
    # Beyond the measured v5e capacity boundary (8M padded rows: the
    # largest scale whose fused block reproduces reliably — 16M ran -8%
    # once, then faulted on identical code; 32M always faults) the fused
    # run keeps per-step rebuilds.
    assert _reuse_eligible(
        _cfg(n=8388608, bh_leaf_size=256, bh_refine="staged",
             bh_rebuild_every=8, bh_near_budget=512, bh_far_budget=2816,
             bh_cand_budget=512, bh_cand2_budget=256), 16)
    for n in (16777216, 33554432):
        assert not _reuse_eligible(
            _cfg(n=n, bh_leaf_size=256, bh_refine="staged",
                 bh_rebuild_every=8, bh_near_budget=512, bh_far_budget=3072,
                 bh_cand_budget=512, bh_cand2_budget=256), 16)
    # k=1, single step, non-BH force, gather far mode: all fall back.
    assert not _reuse_eligible(_cfg(), 16)
    assert not _reuse_eligible(_cfg(bh_rebuild_every=8), 1)
    assert not _reuse_eligible(_cfg(bh_rebuild_every=8, force="direct"), 16)
    assert not _reuse_eligible(
        _cfg(bh_rebuild_every=8, bh_far_mode="gather"), 16)


def test_sectioned_reuse_bitwise():
    # Sections > 1 (the >16M capacity path, forced at tiny N with staged
    # refine): windowed plan + sectioned eval must reproduce the per-step
    # sectioned run bitwise at static positions, with zero overflow.
    cfg = _cfg(n=4096, dt=1e-12, bh_leaf_size=64, bh_refine="staged",
               bh_sections=2, bh_near_budget=64, bh_far_budget=256)
    state = init_simulation(cfg)
    s1, of1 = make_run(cfg, 6, report_overflow=True)(state)
    s2, of2 = make_run(cfg.replace(bh_rebuild_every=3), 6,
                       report_overflow=True)(state)
    assert int(of1) == 0 and int(of2) == 0
    assert bool(jnp.all(s1.pos == s2.pos))
    assert bool(jnp.all(s1.vel == s2.vel))
    assert bool(jnp.all(s1.acc == s2.acc))


def test_fallback_still_runs(state2k):
    # Ineligible (gather far mode) + rebuild_every set: make_run silently
    # uses the per-step path and produces the same physics.
    cfg = _cfg(bh_far_mode="gather", bh_rebuild_every=4)
    s = make_run(cfg, 4)(state2k)
    ref = make_run(_cfg(bh_far_mode="gather"), 4)(state2k)
    assert bool(jnp.all(s.pos == ref.pos))


def test_block_size_minimizes_waste():
    """The dt=0 tail fold runs ceil(n/k)*k evals: with the shipped k=8
    default and a short CLI segment (e.g. log_every=10 -> 10-step runs),
    naively blocking at 8 would burn 16 evals for 10 steps. The block
    size is chosen to minimize total work, never exceeding the user's
    cadence (geometry staleness only ever tightens)."""
    from parallelnbody_tpu.api import _reuse_block_size

    assert _reuse_block_size(8, 10) == 5    # 10 evals, 2 plans
    assert _reuse_block_size(8, 16) == 8    # exact
    assert _reuse_block_size(8, 7) == 7     # single block
    assert _reuse_block_size(8, 1000) == 8  # 125 exact blocks
    assert _reuse_block_size(4, 10) == 2    # cadence cap respected
    assert _reuse_block_size(8, 11) in (4, 6)  # 12 evals either way
    for k_max in (2, 3, 8):
        for n in range(2, 40):
            k = _reuse_block_size(k_max, n)
            assert 1 <= k <= k_max
            # never worse than per-step-equivalent eval count + plans
            assert -(-n // k) * k <= n + k - 1


def test_run_length_with_tail_fold(state2k):
    # 10 steps at the k=8 default: the chosen block size must advance
    # exactly 10 steps of physics whatever blocking it picks.
    cfg = _cfg(bh_rebuild_every=8)
    s = make_run(cfg, 10)(state2k)
    assert int(s.step) == 10
    assert float(s.time) == pytest.approx(10 * cfg.dt, rel=1e-5)


def test_config_validation():
    with pytest.raises(ValueError):
        _cfg(bh_rebuild_every=0)
    with pytest.raises(ValueError):
        _cfg(bh_rebuild_every=-3)
