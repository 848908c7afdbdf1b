"""Budget auto-calibration (api.calibrate_budgets, ops/bh.py
measure_budget_requirements) — VERDICT r4 #2: budgets=0 (the default) makes
the framework derive its interaction-list budgets from the actual t=0
geometry instead of demanding hand-tuning per (N, IC, theta). The reference
has zero knobs (theta hardcoded, OctreeSearch.cpp:85); these tests pin the
contract that an untuned fresh IC runs overflow-free.

The exactness property is the load-bearing one: the measured maxima must be
the TRUE requirements (a plan built at exactly the measured budgets never
clips; one below always does) — the r6 auto-cand2 formula shipped a clipped
4M bench row (rms 0.197) precisely because it guessed instead of measuring.
"""

import jax.numpy as jnp
import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import (init_simulation, calibrate_budgets,
                                   prepare_simulation, make_step, make_run)
from parallelnbody_tpu.ops.bh import measure_budget_requirements, bh_accel


def _cfg(**kw):
    base = dict(ic="plummer", dt=1e-3, softening=0.01, theta=0.72,
                force="barnes_hut", integrator="leapfrog")
    base.update(kw)
    return SimConfig(**base)


def _overflow(state, cfg):
    _, _, of = bh_accel(
        state.pos, state.mass, leaf_size=cfg.resolve_bh_leaf_size(),
        theta=cfg.theta, g=cfg.g, softening=cfg.softening,
        near_budget=cfg.resolve_bh_near_budget(),
        far0_budget=cfg.resolve_bh_far_budget(), use_pallas=False,
        curve=cfg.bh_curve, multipole=cfg.bh_multipole,
        max_levels=cfg.bh_max_levels, refine=cfg.resolve_bh_refine(),
        cand_budgets=(cfg.bh_cand2_budget, cfg.bh_cand_budget),
        far_mode=cfg.bh_far_mode, sections=cfg.bh_sections)
    return int(of)


def test_requirements_exact_dense():
    """Measured maxima are the true requirements on the dense+octet path:
    zero overflow at exactly the maxima, guaranteed overflow one below."""
    cfg = _cfg(n=2048, bh_leaf_size=32)
    state = init_simulation(cfg, compute_forces=False)
    req = measure_budget_requirements(state.pos, state.mass, cfg)
    assert req["refine"] == "dense" and req["far_mode"] == "octet"
    exact = cfg.replace(bh_near_budget=req["near_max"],
                        bh_far_budget=req["far_max"])
    assert _overflow(state, exact) == 0
    assert _overflow(state, exact.replace(
        bh_near_budget=req["near_max"] - 1)) > 0
    assert _overflow(state, exact.replace(
        bh_far_budget=req["far_max"] - 1)) > 0


def test_requirements_exact_staged():
    """Same exactness on the staged pipeline, including both candidate
    stages (the class of the 4M cand2 bug)."""
    cfg = _cfg(n=8192, bh_leaf_size=16, bh_refine="staged")
    state = init_simulation(cfg, compute_forces=False)
    req = measure_budget_requirements(state.pos, state.mass, cfg)
    assert req["refine"] == "staged"
    exact = cfg.replace(bh_near_budget=req["near_max"],
                        bh_far_budget=req["far_max"],
                        bh_cand2_budget=req["cand2_max"],
                        bh_cand_budget=req["cand1_max"])
    assert _overflow(state, exact) == 0
    assert _overflow(state, exact.replace(
        bh_near_budget=req["near_max"] - 1)) > 0
    assert _overflow(state, exact.replace(
        bh_far_budget=req["far_max"] - 1)) > 0
    assert _overflow(state, exact.replace(
        bh_cand_budget=max(1, req["cand1_max"] - 1))) > 0


def test_requirements_sectioned_match():
    """Sectioned counting (the >16M capacity shape, forced tiny) must see
    exactly the unsectioned requirements — same candidates per window."""
    cfg = _cfg(n=8192, bh_leaf_size=16, bh_refine="staged")
    state = init_simulation(cfg, compute_forces=False)
    a = measure_budget_requirements(state.pos, state.mass, cfg)
    b = measure_budget_requirements(state.pos, state.mass,
                                    cfg.replace(bh_sections=2))
    assert b["sections"] == 2
    for k in ("near_max", "far_max", "cand2_max", "cand1_max"):
        assert a[k] == b[k], (k, a[k], b[k])


@pytest.mark.parametrize("ic,n", [("plummer", 3000), ("disk", 4096),
                                  ("galaxy_collision", 5000)])
def test_untuned_fresh_ic_runs_overflow_free(ic, n):
    """The headline contract: a fresh IC at an untuned N with every budget
    left at the 0=auto default runs with zero overflow end-to-end (odd N
    exercises padding; three IC families exercise different geometry)."""
    cfg = _cfg(n=n, ic=ic, bh_leaf_size=32)
    assert cfg.bh_near_budget == 0 and cfg.bh_far_budget == 0
    ccfg, state = prepare_simulation(cfg)
    assert ccfg.bh_near_budget > 0 and ccfg.bh_far_budget > 0
    out, of = make_run(ccfg, 4, report_overflow=True)(state)
    assert int(of) == 0
    assert bool(jnp.all(jnp.isfinite(out.pos)))


def test_explicit_budgets_respected():
    """Nonzero budgets are the user's word: calibration never touches them."""
    cfg = _cfg(n=2048, bh_leaf_size=32, bh_near_budget=77, bh_far_budget=99)
    state = init_simulation(cfg, compute_forces=False)
    out = calibrate_budgets(cfg, state)
    assert out.bh_near_budget == 77 and out.bh_far_budget == 99


def test_non_bh_noop():
    cfg = _cfg(n=512, force="direct")
    state = init_simulation(cfg, compute_forces=False)
    assert calibrate_budgets(cfg, state) is cfg


def test_fallback_without_state():
    """Paths with no state at hand (bare make_step on an auto config)
    resolve 0 to the conservative static fallbacks and still run."""
    cfg = _cfg(n=2048, bh_leaf_size=32)
    assert cfg.resolve_bh_near_budget() == SimConfig.FALLBACK_NEAR_BUDGET
    assert cfg.resolve_bh_far_budget() == SimConfig.FALLBACK_FAR_BUDGET
    state = init_simulation(cfg)  # t=0 forces via the fallback budgets
    out = make_step(cfg)(state)
    assert bool(jnp.all(jnp.isfinite(out.pos)))


def test_recalibrate_on_overflow_grows_with_geometry():
    """Self-healing budgets (cli.recalibrate_on_overflow): t=0 calibration
    on two WELL-SEPARATED clusters sizes the near budget to the
    intra-cluster requirement; when the clusters have merged (the evolved
    state a mid-run overflow signals), re-measuring grows the auto fields
    — and only upward, and only the originally-auto ones."""
    from parallelnbody_tpu.cli import (recalibrate_on_overflow,
                                       _AUTO_BUDGET_FIELDS)

    cfg0 = _cfg(n=32768, bh_leaf_size=32)
    state = init_simulation(cfg0, compute_forces=False)
    n2 = cfg0.n // 2
    off = jnp.array([40.0, 0.0, 0.0])
    separated = state._replace(pos=jnp.concatenate(
        [state.pos[:n2] - off, state.pos[n2:] + off]))
    auto = [f for f in _AUTO_BUDGET_FIELDS if getattr(cfg0, f) == 0]
    cfg = calibrate_budgets(cfg0, separated)
    # merged geometry (the original single sphere) needs bigger lists
    cfg2, grew = recalibrate_on_overflow(cfg, state, auto)
    assert grew.get("bh_near_budget", 0) > cfg.bh_near_budget
    assert cfg2.bh_near_budget == grew["bh_near_budget"]
    # shrinking geometry never shrinks budgets (monotone growth)
    cfg3, grew3 = recalibrate_on_overflow(cfg2, separated, auto)
    assert grew3 == {} and cfg3 == cfg2
    # explicit budgets are untouched (empty auto list)
    cfgE = cfg0.replace(bh_near_budget=8)
    cfg4, grew4 = recalibrate_on_overflow(cfgE, state, [])
    assert grew4 == {} and cfg4.bh_near_budget == 8


def test_simulation_calibrates():
    """The library entry point owns a state, so it calibrates: the stored
    cfg has concrete budgets and stepping reports no overflow."""
    from parallelnbody_tpu.api import Simulation

    sim = Simulation(_cfg(n=2048, bh_leaf_size=32))
    assert sim.cfg.bh_near_budget > 0 and sim.cfg.bh_far_budget > 0
    sim.step(3)
    assert int(sim.state.step) == 3
